"""Golden tests for the op layer against torch-CPU oracles.

The oracles re-derive the reference ops' *documented semantics*
(upfirdn2d pad/up/filter/down pipeline, bias_act table, modulated-conv
routing) using plain torch functional ops — the same role the reference's
impl='ref' paths play for its CUDA kernels (SURVEY.md section 4).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from next3d_tpu.ops import (
    bias_act,
    conv2d_resample,
    downsample2d,
    filter2d,
    grid_sample_2d,
    interpolate_bilinear,
    setup_filter,
    upfirdn2d,
    upsample2d,
)
from next3d_tpu.ops.interpolate import (
    interpolate_nearest,
    paste_resized_region,
    resample_region,
)


# ---------------------------------------------------------------- oracles

def torch_upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Oracle implementing upfirdn2d's documented semantics with torch ops."""
    x = torch.as_tensor(x)
    if f is None:
        f = torch.ones(1, 1, dtype=torch.float32)
    else:
        f = torch.as_tensor(np.array(f), dtype=torch.float32)
    if isinstance(up, int):
        up = (up, up)
    if isinstance(down, int):
        down = (down, down)
    upx, upy = up
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    padx0, padx1, pady0, pady1 = padding

    B, C, H, W = x.shape
    # zero-insert upsample (trailing zeros)
    x = x.reshape(B, C, H, 1, W, 1)
    x = TF.pad(x, [0, upx - 1, 0, 0, 0, upy - 1])
    x = x.reshape(B, C, H * upy, W * upx)
    # pad / crop
    x = TF.pad(x, [max(padx0, 0), max(padx1, 0), max(pady0, 0), max(pady1, 0)])
    x = x[:, :, max(-pady0, 0): x.shape[2] - max(-pady1, 0),
          max(-padx0, 0): x.shape[3] - max(-padx1, 0)]
    # filter
    f = f * (gain ** (f.ndim / 2))
    f = f.to(x.dtype)
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    fk = f[None, None].repeat([C, 1] + [1] * f.ndim)
    if fk.ndim == 4:
        x = TF.conv2d(x, fk, groups=C)
    else:
        x = TF.conv2d(x, fk.unsqueeze(2), groups=C)
        x = TF.conv2d(x, fk.unsqueeze(3), groups=C)
    # downsample
    x = x[:, :, ::downy, ::downx]
    return x.numpy()


# ----------------------------------------------------------------- tests

@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 0),
    (1, 1, 2),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, (1, 1, 1, 1)),
    (2, 2, (3, 1, 2, 0)),
    (1, 1, (-1, -1, -1, -1)),
    (2, 1, (2, -1, 0, 3)),
])
@pytest.mark.parametrize("sep", [False, True])
def test_upfirdn2d_matches_oracle(rng, up, down, padding, sep):
    x = rng.randn(2, 3, 12, 10).astype(np.float32)
    if sep:
        f = setup_filter([1, 3, 3, 1, 1, 2, 2, 1])  # 8 taps -> separable
        assert f.ndim == 1
    else:
        f = setup_filter([1, 3, 3, 1])
        assert f.ndim == 2
    for flip in (False, True):
        want = torch_upfirdn2d(x, f, up=up, down=down, padding=padding,
                               flip_filter=flip, gain=1.5)
        got = np.asarray(upfirdn2d(jnp.asarray(x), f, up=up, down=down,
                                   padding=padding, flip_filter=flip, gain=1.5))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_none_filter(rng):
    x = rng.randn(1, 2, 5, 5).astype(np.float32)
    want = torch_upfirdn2d(x, None, up=2, padding=1)
    got = np.asarray(upfirdn2d(jnp.asarray(x), None, up=2, padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_up_down_sample2d_wrappers(rng):
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    up = np.asarray(upsample2d(jnp.asarray(x), f))
    assert up.shape == (2, 4, 32, 32)
    dn = np.asarray(downsample2d(jnp.asarray(x), f))
    assert dn.shape == (2, 4, 8, 8)
    ft = np.asarray(filter2d(jnp.asarray(x), f))
    assert ft.shape == x.shape
    # round-trip DC preservation: constant image stays constant
    const = np.ones((1, 1, 16, 16), np.float32)
    up_c = np.asarray(upsample2d(jnp.asarray(const), f))
    np.testing.assert_allclose(up_c[:, :, 4:-4, 4:-4], 1.0, rtol=1e-5)


def test_setup_filter_matches_reference_semantics():
    f = setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)
    f1 = setup_filter([1, 3, 3, 1, 1, 3, 3, 1])
    assert f1.ndim == 1  # >= 8 taps stays separable
    np.testing.assert_allclose(f1.sum(), 1.0, rtol=1e-6)
    fg = setup_filter([1, 1], gain=4)
    np.testing.assert_allclose(fg.sum(), 4.0, rtol=1e-6)  # gain**(2/2)=4... (2D)


@pytest.mark.parametrize("act,gain,clamp", [
    ("linear", None, None),
    ("lrelu", None, None),
    ("lrelu", 0.5, 256.0),
    ("relu", None, None),
    ("tanh", None, 1.0),
    ("sigmoid", None, None),
    ("softplus", None, None),
    ("swish", 2.0, None),
])
def test_bias_act_matches_torch(rng, act, gain, clamp):
    import math
    x = rng.randn(3, 8, 4, 4).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    tx = torch.as_tensor(x) + torch.as_tensor(b).reshape(1, -1, 1, 1)
    table = {
        "linear": lambda t: t,
        "relu": lambda t: TF.relu(t),
        "lrelu": lambda t: TF.leaky_relu(t, 0.2),
        "tanh": lambda t: torch.tanh(t),
        "sigmoid": lambda t: torch.sigmoid(t),
        "softplus": lambda t: TF.softplus(t),
        "swish": lambda t: torch.sigmoid(t) * t,
    }
    def_gain = {"relu": math.sqrt(2), "lrelu": math.sqrt(2),
                "swish": math.sqrt(2)}.get(act, 1.0)
    g = gain if gain is not None else def_gain
    want = table[act](tx) * g
    if clamp is not None:
        want = want.clamp(-clamp, clamp)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act,
                              gain=gain, clamp=clamp))
    # transcendentals (tanh/sigmoid) differ ~3e-5 between XLA and torch
    np.testing.assert_allclose(got, want.numpy(), rtol=2e-4, atol=5e-5)


@pytest.mark.parametrize("up,down,kernel,groups", [
    (1, 1, 3, 1),
    (1, 1, 1, 1),
    (2, 1, 3, 1),
    (1, 2, 3, 1),
    (2, 1, 1, 1),
    (1, 2, 1, 1),
    (2, 1, 3, 2),
    (1, 1, 3, 4),
])
@pytest.mark.parametrize("flip_weight", [True, False])
def test_conv2d_resample_matches_torch(rng, up, down, kernel, groups, flip_weight):
    """Oracle: torch conv/conv_transpose routing per the reference's spec."""
    Cin, Cout = 4, 8
    x = rng.randn(2, Cin, 8, 8).astype(np.float32)
    w = rng.randn(Cout, Cin // groups, kernel, kernel).astype(np.float32)
    f = setup_filter([1, 3, 3, 1]) if (up > 1 or down > 1) else None
    padding = kernel // 2

    # torch oracle: express as upfirdn(up) -> conv -> upfirdn(down), the
    # reference's generic fallback path (conv2d_resample.py:138-143)
    px0 = px1 = py0 = py1 = padding
    fw = fh = (f.shape[-1] if f is not None else 1)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    t = torch_upfirdn2d(x, f if up > 1 else None, up=up,
                        padding=[px0, px1, py0, py1], gain=up ** 2)
    tw = torch.as_tensor(w)
    if not flip_weight and kernel > 1:
        tw = tw.flip([2, 3])
    t = TF.conv2d(torch.as_tensor(t), tw, groups=groups).numpy()
    if down > 1:
        t = torch_upfirdn2d(t, f, down=down)

    got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), f=f,
                                     up=up, down=down, padding=padding,
                                     groups=groups, flip_weight=flip_weight))
    assert got.shape == t.shape
    np.testing.assert_allclose(got, t, rtol=1e-4, atol=1e-4)


def test_grid_sample_matches_torch(rng):
    x = rng.randn(2, 3, 9, 7).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    want = TF.grid_sample(torch.as_tensor(x), torch.as_tensor(grid),
                          mode="bilinear", padding_mode="zeros",
                          align_corners=False).numpy()
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_gradients_flow(rng):
    x = jnp.asarray(rng.randn(1, 2, 8, 8).astype(np.float32))
    grid = jnp.asarray(rng.rand(1, 4, 4, 2).astype(np.float32) * 1.6 - 0.8)

    def loss(x, g):
        return jnp.sum(grid_sample_2d(x, g) ** 2)

    gx, gg = jax.grad(loss, argnums=(0, 1))(x, grid)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gg)).all()
    # 2nd order (needed by R1-style losses through sampling)
    hvp = jax.grad(lambda x: jnp.sum(jax.grad(loss, argnums=0)(x, grid) ** 2))(x)
    assert np.isfinite(np.asarray(hvp)).all()


@pytest.mark.parametrize("size,antialias", [
    ((32, 32), False), ((32, 32), True),
    ((128, 128), False), ((128, 128), True),
    ((17, 23), True),
])
def test_interpolate_bilinear_matches_torch(rng, size, antialias):
    x = rng.randn(2, 3, 64, 64).astype(np.float32)
    want = TF.interpolate(torch.as_tensor(x), size=size, mode="bilinear",
                          align_corners=False, antialias=antialias).numpy()
    got = np.asarray(interpolate_bilinear(jnp.asarray(x), size,
                                          antialias=antialias))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolate_nearest_matches_torch(rng):
    x = rng.randn(1, 1, 100, 100).astype(np.float32)
    want = TF.interpolate(torch.as_tensor(x), size=(256, 256)).numpy()
    got = np.asarray(interpolate_nearest(jnp.asarray(x), (256, 256)))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("sy,sx,szy,szx", [(40, 50, 48, 48), (10, 5, 90, 88),
                                           (100, 100, 30, 31)])
def test_resample_region_matches_torch_crop_resize(rng, sy, sx, szy, szx):
    src = rng.randn(4, 192, 192).astype(np.float32)
    want = TF.interpolate(torch.as_tensor(src[None, :, sy:sy + szy, sx:sx + szx]),
                          size=(64, 64), mode="bilinear",
                          antialias=True).numpy()[0]
    got = np.asarray(resample_region(jnp.asarray(src),
                                     jnp.int32(sy), jnp.int32(sx),
                                     jnp.int32(szy), jnp.int32(szx), 64, 64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sy,sx,sz", [(60, 70, 80), (10, 200, 50), (0, 0, 33)])
def test_paste_resized_region_matches_torch(rng, sy, sx, sz):
    canvas = rng.randn(3, 256, 256).astype(np.float32)
    patch = rng.randn(3, 256, 256).astype(np.float32)
    want = canvas.copy()
    ey, ex = min(sy + sz, 256), min(sx + sz, 256)
    resized = TF.interpolate(torch.as_tensor(patch[None]), size=(sz, sz),
                             mode="bilinear", antialias=True).numpy()[0]
    want[:, sy:ey, sx:ex] = resized[:, :ey - sy, :ex - sx]
    got = np.asarray(paste_resized_region(jnp.asarray(canvas), jnp.asarray(patch),
                                          jnp.int32(sy), jnp.int32(sx),
                                          jnp.int32(sz), jnp.int32(sz)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_grid_sample_packed_path_matches_small_path(rng):
    """The 2x2-packed one-gather path (auto-enabled for large sample
    counts) must equal the per-corner path bit-for-bit in weights/taps,
    including out-of-image border samples (zeros padding)."""
    import jax.numpy as jnp
    from next3d_tpu.ops import grid_sample_2d
    from next3d_tpu.ops.grid_sample import _grid_sample_packed

    x = rng.randn(2, 5, 9, 7).astype(np.float32)
    # grid spanning well past the borders
    grid = (rng.rand(2, 4, 11, 2).astype(np.float32) * 3 - 1.5)
    small = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid)))

    gx = (grid[..., 0] + 1) * (7 / 2) - 0.5
    gy = (grid[..., 1] + 1) * (9 / 2) - 0.5
    x0 = np.floor(gx); y0 = np.floor(gy)
    packed = np.asarray(_grid_sample_packed(
        jnp.asarray(x), jnp.asarray(x0.astype(np.int32)),
        jnp.asarray(y0.astype(np.int32)),
        jnp.asarray((gx - x0).astype(np.float32)),
        jnp.asarray((gy - y0).astype(np.float32)), 4, 11))
    np.testing.assert_allclose(packed, small, rtol=1e-6, atol=1e-6)


def test_grid_sample_custom_vjp_matches_small_grads(rng, monkeypatch):
    """Gradients of the packed-forward custom_vjp must equal the per-corner
    path's autodiff (both w.r.t. input and grid), at a size that triggers
    the packed branch. The scatter-free backward is TPU-selected at trace
    time — force it here so it is covered on the CPU suite."""
    import jax
    import jax.numpy as jnp
    from next3d_tpu.ops import grid_sample_2d
    from next3d_tpu.ops.grid_sample import _grid_sample_small

    monkeypatch.setenv('NEXT3D_SCATTER_FREE_BWD', '1')
    x = jnp.asarray(rng.randn(2, 4, 32, 32).astype(np.float32))
    grid = jnp.asarray((rng.rand(2, 128, 512, 2) * 2.4 - 1.2)
                       .astype(np.float32))
    assert 2 * 128 * 512 >= (1 << 16)  # packed branch active

    def loss_a(x, g):
        return jnp.sum(jnp.sin(grid_sample_2d(x, g)))

    def loss_b(x, g):
        return jnp.sum(jnp.sin(_grid_sample_small(x, g)))

    va, (gxa, gga) = jax.value_and_grad(loss_a, argnums=(0, 1))(x, grid)
    vb, (gxb, ggb) = jax.value_and_grad(loss_b, argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
    # d(input) is computed scatter-free (sort + prefix-sum differences,
    # ops/scatter_add.py) — same reduction, different summation order, so
    # f32 rounding differs from the scatter-add oracle (~128 collisions
    # per table row here)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gga), np.asarray(ggb), rtol=1e-5,
                               atol=1e-5)


def test_scatter_add_rows_matches_at_add(rng):
    """Sort+cumsum scatter replacement vs .at[].add, incl. empty rows,
    heavy collisions, and bf16 updates (f32 accumulation)."""
    from next3d_tpu.ops.scatter_add import scatter_add_rows

    K, M, C = 37, 1000, 5
    idx = rng.randint(0, K, size=(M,)).astype(np.int32)
    idx[idx == 7] = 8  # guarantee at least one empty row
    upd = rng.randn(M, C).astype(np.float32)
    want = np.asarray(jnp.zeros((K, C)).at[jnp.asarray(idx)].add(
        jnp.asarray(upd)))
    got = np.asarray(scatter_add_rows(K, jnp.asarray(idx), jnp.asarray(upd)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert np.all(got[7] == 0)

    # all-collide: every update lands on one row
    got1 = np.asarray(scatter_add_rows(
        K, jnp.zeros((M,), jnp.int32), jnp.asarray(upd)))
    np.testing.assert_allclose(got1[0], upd.sum(0), rtol=1e-5, atol=1e-5)
    assert np.all(got1[1:] == 0)

    # bf16 updates accumulate in f32 (better than bf16 .at[].add)
    updb = jnp.asarray(upd, jnp.bfloat16)
    gotb = np.asarray(scatter_add_rows(K, jnp.asarray(idx), updb)
                      .astype(jnp.float32))
    np.testing.assert_allclose(gotb, want, rtol=2e-2, atol=2e-2)

    # channel chunking path (force tiny stream budget)
    from next3d_tpu.ops import scatter_add as sa
    old = sa._MAX_STREAM_BYTES
    try:
        sa._MAX_STREAM_BYTES = 1 << 10
        gotc = np.asarray(scatter_add_rows(K, jnp.asarray(idx),
                                           jnp.asarray(upd)))
    finally:
        sa._MAX_STREAM_BYTES = old
    np.testing.assert_allclose(gotc, want, rtol=1e-5, atol=1e-5)


def test_scatter_add_rows_batched_shards_over_data_mesh(rng):
    """Batched form matches per-image .at[].add AND compiles/executes with
    the batch axis sharded over the 8-device mesh (the per-image axis-1
    sort/scan design keeps the whole backward shard-local; a flattened
    single-stream sort would have forced a cross-device distributed sort)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from next3d_tpu.ops.scatter_add import scatter_add_rows_batched

    N, K, M, C = 8, 33, 500, 6
    idx = rng.randint(0, K, size=(N, M)).astype(np.int32)
    upd = rng.randn(N, M, C).astype(np.float32)
    want = np.stack([
        np.asarray(jnp.zeros((K, C)).at[jnp.asarray(idx[i])].add(
            jnp.asarray(upd[i]))) for i in range(N)])

    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    sh = NamedSharding(mesh, P('data'))
    idx_d = jax.device_put(jnp.asarray(idx), sh)
    upd_d = jax.device_put(jnp.asarray(upd), sh)
    out = jax.jit(
        lambda i, u: scatter_add_rows_batched(K, i, u),
        in_shardings=(sh, sh), out_shardings=sh)(idx_d, upd_d)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def test_bilinear_sample_shared_matches_grid_sample(rng):
    """ops/shared_sample.py: the separable one-hot contraction must equal
    grid_sample_2d on a broadcast 1-channel image, incl. zeros padding at
    out-of-bounds points (reference eye-mask sampling,
    triplane_next3d.py:213-214)."""
    from next3d_tpu.ops.shared_sample import bilinear_sample_shared

    img = rng.rand(9, 7).astype(np.float32)
    grid = (rng.rand(3, 5, 6, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    want = np.asarray(grid_sample_2d(
        jnp.broadcast_to(jnp.asarray(img)[None, None], (3, 1, 9, 7)),
        jnp.asarray(grid)))[:, 0]
    got = np.asarray(bilinear_sample_shared(jnp.asarray(img),
                                            jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bilinear_sample_shared_chunked_and_bf16(rng):
    """Chunked path (P > chunk) agrees with the unchunked one; bf16 images
    stay within bf16 rounding of the fp32 answer."""
    from next3d_tpu.ops.shared_sample import bilinear_sample_shared

    img = rng.rand(16, 16).astype(np.float32)
    grid = (rng.rand(1, 40, 9, 2).astype(np.float32) * 2.2 - 1.1)
    full = np.asarray(bilinear_sample_shared(jnp.asarray(img),
                                             jnp.asarray(grid)))
    chunked = np.asarray(bilinear_sample_shared(jnp.asarray(img),
                                                jnp.asarray(grid), chunk=64))
    np.testing.assert_allclose(chunked, full, rtol=1e-6, atol=1e-6)
    bf = np.asarray(bilinear_sample_shared(
        jnp.asarray(img).astype(jnp.bfloat16),
        jnp.asarray(grid)).astype(jnp.float32))
    np.testing.assert_allclose(bf, full, rtol=0, atol=0.02)
