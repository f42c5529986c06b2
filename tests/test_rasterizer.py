"""Golden tests for the TPU mesh rasterizer.

Golden model: a brute-force numpy rasterizer implementing PyTorch3D's
documented semantics (faces_per_pixel=1, blur=0, perspective_correct=False,
cull_backfaces=True) in the reference's post-double-negation convention.
Plus an integration test on the real FLAME demo mesh across the 4
orthographic views the flagship model uses.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.render.rasterizer import (
    interpolate_face_attributes,
    rasterize_mesh,
    rasterize_with_attributes,
    required_patch_size,
)
from next3d_tpu.render.mesh import angle2matrix, batch_orth_proj
from next3d_tpu.utils.obj_io import load_obj

REF_DEMO = "/root/reference/data/demo/demo.obj"


def brute_force_raster(verts, faces, H, W):
    """All-pixels x all-faces reference rasterizer (numpy)."""
    B = verts.shape[0]
    pix_to_face = np.full((B, H, W), -1, np.int64)
    zbuf = np.full((B, H, W), 1e10, np.float64)
    px = (verts[..., 0] + 1) * (W / 2) - 0.5
    py = (verts[..., 1] + 1) * (H / 2) - 0.5
    pz = verts[..., 2].astype(np.float64)
    cols, rows = np.meshgrid(np.arange(W), np.arange(H))
    for b in range(B):
        for f, (i0, i1, i2) in enumerate(faces):
            x0, x1, x2 = px[b, i0], px[b, i1], px[b, i2]
            y0, y1, y2 = py[b, i0], py[b, i1], py[b, i2]
            area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            if area <= 1e-8:  # backface cull + degenerate
                continue
            w0 = (x2 - x1) * (rows - y1) - (y2 - y1) * (cols - x1)
            w1 = (x0 - x2) * (rows - y2) - (y0 - y2) * (cols - x2)
            w2 = (x1 - x0) * (rows - y0) - (y1 - y0) * (cols - x0)
            b0, b1, b2 = w0 / area, w1 / area, w2 / area
            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
            z = b0 * pz[b, i0] + b1 * pz[b, i1] + b2 * pz[b, i2]
            better = inside & (z < zbuf[b])
            zbuf[b][better] = z[better]
            pix_to_face[b][better] = f
    return pix_to_face, zbuf


def random_mesh(rng, B=2, V=30, F=40):
    verts = np.stack([
        rng.uniform(-1.1, 1.1, (B, V)),
        rng.uniform(-1.1, 1.1, (B, V)),
        rng.uniform(1.0, 3.0, (B, V)),
    ], axis=-1).astype(np.float32)
    faces = rng.randint(0, V, (F, 3)).astype(np.int32)
    # drop (nearly) degenerate faces to avoid golden-vs-test tie noise
    keep = (faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2]) & \
           (faces[:, 0] != faces[:, 2])
    return verts, faces[keep]


def test_rasterizer_matches_brute_force(rng):
    verts, faces = random_mesh(rng)
    H = W = 48
    want_pf, want_z = brute_force_raster(verts, faces, H, W)
    got_pf, got_z = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), H,
                                   patch=64, face_chunk=16)
    got_pf = np.asarray(got_pf)
    # depth agreement everywhere (face id can differ only on exact z ties)
    covered = want_pf >= 0
    np.testing.assert_array_equal(got_pf >= 0, covered)
    np.testing.assert_allclose(np.asarray(got_z)[covered],
                               want_z[covered], rtol=1e-4, atol=1e-5)
    agree = (got_pf == want_pf)[covered].mean()
    assert agree > 0.999, f"face-id agreement {agree}"


def test_rasterizer_attribute_interpolation(rng):
    verts, faces = random_mesh(rng, B=1, V=20, F=24)
    H = W = 32
    D = 3
    attrs = rng.randn(1, len(faces), 3, D).astype(np.float32)
    out = np.asarray(rasterize_with_attributes(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs), H,
        patch=64, face_chunk=8))
    assert out.shape == (1, D + 1, H, W)
    alpha = out[0, -1]
    want_pf, _ = brute_force_raster(verts, faces, H, W)
    np.testing.assert_array_equal(alpha > 0.5, want_pf[0] >= 0)
    # golden attribute value at covered pixels
    px = (verts[0, :, 0] + 1) * (W / 2) - 0.5
    py = (verts[0, :, 1] + 1) * (H / 2) - 0.5
    ys, xs = np.nonzero(want_pf[0] >= 0)
    for y, x in list(zip(ys, xs))[::7]:
        f = want_pf[0, y, x]
        i0, i1, i2 = faces[f]
        x0, x1, x2 = px[i0], px[i1], px[i2]
        y0, y1, y2 = py[i0], py[i1], py[i2]
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        w0 = ((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)) / area
        w1 = ((x0 - x2) * (y - y2) - (y0 - y2) * (x - x2)) / area
        w2 = ((x1 - x0) * (y - y0) - (y1 - y0) * (x - x0)) / area
        want_val = w0 * attrs[0, f, 0] + w1 * attrs[0, f, 1] + w2 * attrs[0, f, 2]
        got_val = out[0, :D, y, x]
        np.testing.assert_allclose(got_val, want_val, rtol=1e-3, atol=1e-4)


def test_rasterizer_gradients_flow(rng):
    verts, faces = random_mesh(rng, B=1, V=20, F=24)
    attrs = jnp.asarray(rng.randn(1, len(faces), 3, 2).astype(np.float32))
    faces_j = jnp.asarray(faces)

    def loss(v, a):
        pf, _ = rasterize_mesh(v, faces_j, 32, patch=64, face_chunk=8)
        img = interpolate_face_attributes(v, faces_j, a, pf, 32)
        return jnp.sum(img ** 2)

    gv, ga = jax.grad(loss, argnums=(0, 1))(jnp.asarray(verts), attrs)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(ga)).all()
    assert float(jnp.abs(ga).sum()) > 0
    assert float(jnp.abs(gv).sum()) > 0  # bary coords give vertex grads


@pytest.mark.skipif(not os.path.exists(REF_DEMO), reason="demo mesh absent")
def test_flame_demo_four_views():
    """The flagship model's exact vertex transform chain on the real FLAME
    mesh: all 4 orthographic views must rasterize with sane coverage and fit
    the default patch size (triplane_next3d.py:190-230)."""
    mesh = load_obj(REF_DEMO)
    assert mesh.verts.shape == (5023, 3)
    assert mesh.faces.shape[0] == 9976
    v = jnp.asarray(mesh.verts[None])
    orth_shift = jnp.asarray([[0, -0.01, -0.01]])
    orth_scale = 5.0

    for view in ([0, 0, 0], [0, 90, 0], [0, -90, 0], [90, 0, 0]):
        vv = v * jnp.asarray([1, -1, 1], jnp.float32)  # y flip
        tform = angle2matrix(jnp.asarray([view], jnp.float32))
        tv = (vv @ tform + orth_shift) * orth_scale
        tv = batch_orth_proj(tv, jnp.asarray([1., 0, 0]))
        tv = tv.at[:, :, 1:].multiply(-1)
        tv = tv.at[:, :, 2].add(10)

        faces = mesh.faces[:, [0, 2, 1]]  # reference reorder (:207)
        span = required_patch_size(np.asarray(tv), faces, 256)
        assert span < 32, f"view {view}: max face span {span} exceeds patch"

        pf, _ = rasterize_mesh(tv, jnp.asarray(faces), 256)
        cov = float(np.mean(np.asarray(pf) >= 0))
        assert 0.05 < cov < 0.9, f"view {view}: coverage {cov}"


def test_tiled_matches_scatter(rng):
    from next3d_tpu.render.rasterizer import rasterize_mesh_tiled
    verts, faces = random_mesh(rng, B=2, V=40, F=60)
    H = 64
    pf_s, z_s = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), H,
                               patch=80, face_chunk=16)
    pf_t, z_t = rasterize_mesh_tiled(jnp.asarray(verts), jnp.asarray(faces),
                                     H, capacity=64)
    pf_s, pf_t = np.asarray(pf_s), np.asarray(pf_t)
    np.testing.assert_array_equal(pf_t >= 0, pf_s >= 0)
    agree = (pf_t == pf_s)[pf_s >= 0].mean()
    assert agree > 0.999, agree
    covered = pf_s >= 0
    np.testing.assert_allclose(np.asarray(z_t)[covered],
                               np.asarray(z_s)[covered], rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_DEMO), reason="demo mesh absent")
def test_flame_tiled_exactness_all_views():
    """The nearest-K tiled rasterizer must match the scatter golden path on
    the real FLAME mesh in all 4 rendering views to >=99.98% of pixels (the
    side views stack >1000 faces in depth per tile — the stress case for
    nearest-K binning; slanted silhouette faces cause a handful of
    depth-layer-boundary mismatches)."""
    from next3d_tpu.render.rasterizer import rasterize_mesh_tiled
    mesh = load_obj(REF_DEMO)
    v = jnp.asarray(mesh.verts[None])
    orth_shift = jnp.asarray([[0, -0.01, -0.01]])
    faces = jnp.asarray(mesh.faces[:, [0, 2, 1]])
    for view in ([0, 0, 0], [0, 90, 0], [0, -90, 0], [90, 0, 0]):
        vv = v * jnp.asarray([1, -1, 1], jnp.float32)
        tform = angle2matrix(jnp.asarray([view], jnp.float32))
        tv = (vv @ tform + orth_shift) * 5.0
        tv = batch_orth_proj(tv, jnp.asarray([1., 0, 0]))
        tv = tv.at[:, :, 1:].multiply(-1)
        tv = tv.at[:, :, 2].add(10)
        pf_s, _ = rasterize_mesh(tv, faces, 256)
        pf_t, _ = rasterize_mesh_tiled(tv, faces, 256)
        pf_s, pf_t = np.asarray(pf_s), np.asarray(pf_t)
        agree = (pf_t == pf_s).mean()
        assert agree >= 0.9998, f"view {view}: agreement {agree}"
        # coverage (alpha) must agree even more tightly
        cov_diff = ((pf_t >= 0) != (pf_s >= 0)).sum()
        assert cov_diff <= 8, f"view {view}: coverage diff {cov_diff}px"


def test_pallas_rasterizer_matches_scatter_interpret(rng):
    """Pallas kernel (interpret mode on CPU) vs the scatter golden path."""
    from next3d_tpu.ops.pallas_raster import rasterize_mesh_pallas
    verts, faces = random_mesh(rng, B=2, V=30, F=40)
    H = 64
    pf_s, z_s = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), H,
                               patch=80, face_chunk=16)
    pf_p, z_p = rasterize_mesh_pallas(jnp.asarray(verts), jnp.asarray(faces),
                                      H, patch=64, interpret=True)
    pf_s, pf_p = np.asarray(pf_s), np.asarray(pf_p)
    np.testing.assert_array_equal(pf_p, pf_s)
    covered = pf_s >= 0
    np.testing.assert_allclose(np.asarray(z_p)[covered],
                               np.asarray(z_s)[covered], rtol=1e-4, atol=1e-5)


def test_pallas_binned_matches_scatter_interpret():
    """Sort-binned Pallas kernel (interpret mode) vs the scatter golden on
    the real FLAME mesh: pix_to_face must agree EXACTLY (the binning is
    capacity-free; only float rounding in the affine-coefficient form could
    flip an edge pixel, and at 128^2 it does not)."""
    from next3d_tpu.ops.pallas_raster import rasterize_mesh_pallas_binned
    mesh = load_obj(REF_DEMO)
    rng = np.random.RandomState(0)
    v = mesh.verts
    v = (v - v.mean(0)) / np.abs(v - v.mean(0)).max() * 0.9
    verts = np.stack([v, v + rng.randn(*v.shape) * 0.002]).astype(np.float32)
    verts = np.concatenate([verts[..., :2], 10.0 - verts[..., 2:] * 2], -1)
    faces = mesh.faces.astype(np.int32)
    H = 128
    pf_s, z_s = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces), H,
                               patch=32)
    pf_b, z_b = rasterize_mesh_pallas_binned(jnp.asarray(verts),
                                             jnp.asarray(faces), H,
                                             max_seg=8192, interpret=True)
    pf_s, pf_b = np.asarray(pf_s), np.asarray(pf_b)
    np.testing.assert_array_equal(pf_b, pf_s)
    covered = pf_s >= 0
    np.testing.assert_allclose(np.asarray(z_b)[covered],
                               np.asarray(z_s)[covered], rtol=1e-3, atol=2e-2)

def test_pallas_binned_uv_matches_interpolate_interpret():
    """UV-emitting binned kernel (interpret mode) vs binned pix_to_face +
    interpolate_face_attributes on the real FLAME mesh: visibility must be
    identical, and the in-kernel affine (u, v) must match the separate
    barycentric interpolation pass at float rounding."""
    from next3d_tpu.ops.pallas_raster import (
        rasterize_mesh_pallas_binned, rasterize_mesh_pallas_binned_uv)
    mesh = load_obj(REF_DEMO)
    rng = np.random.RandomState(1)
    v = mesh.verts
    v = (v - v.mean(0)) / np.abs(v - v.mean(0)).max() * 0.9
    verts = np.stack([v, v + rng.randn(*v.shape) * 0.002]).astype(np.float32)
    verts = np.concatenate([verts[..., :2], 10.0 - verts[..., 2:] * 2], -1)
    faces = mesh.faces.astype(np.int32)
    B, F = verts.shape[0], faces.shape[0]
    # per-face per-corner (u, v) in [-1, 1] like face_uvcoords[..., :2]
    attrs = rng.rand(1, F, 3, 2).astype(np.float32) * 2 - 1
    H = 128
    pf, _ = rasterize_mesh_pallas_binned(jnp.asarray(verts),
                                         jnp.asarray(faces), H,
                                         max_seg=8192, interpret=True)
    # golden interpolation (append a dummy 3rd channel; take the first two)
    attrs3 = np.concatenate([attrs, np.ones_like(attrs[..., :1])], axis=-1)
    golden = interpolate_face_attributes(
        jnp.asarray(verts), jnp.asarray(faces),
        jnp.broadcast_to(jnp.asarray(attrs3), (B, F, 3, 3)), pf, H)
    pf_uv, u, v_ = rasterize_mesh_pallas_binned_uv(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs), H,
        max_seg=8192, interpret=True)
    np.testing.assert_array_equal(np.asarray(pf_uv), np.asarray(pf))
    covered = np.asarray(pf) >= 0
    gu = np.asarray(golden[:, 0])
    gv = np.asarray(golden[:, 1])
    # atol covers near-degenerate faces (area ~1e-6 -> inv ~1e6) where both
    # the in-kernel affine and the golden barycentric pass are equally
    # ill-conditioned and differ only by float reassociation (measured max
    # 1.2e-3 on one sliver-face pixel of the FLAME mesh; ~0.1px at 256 tex)
    np.testing.assert_allclose(np.asarray(u)[covered], gu[covered],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_)[covered], gv[covered],
                               rtol=1e-4, atol=2e-3)
    # uncovered pixels emit exactly zero
    assert np.all(np.asarray(u)[~covered] == 0)
    assert np.all(np.asarray(v_)[~covered] == 0)


def test_pallas_binned_uv16_matches_uv32_interpret():
    """TILE=16 UV kernel (interpret mode) vs the TILE=32 production kernel
    on the real FLAME mesh: identical affine coefficients feed both, so
    pix_to_face and the interpolated (u, v) must agree EXACTLY — any
    difference is a binning bug (missed 3x3 rectangle entry or segment
    overflow)."""
    from next3d_tpu.ops.pallas_raster import (
        rasterize_mesh_pallas_binned_uv, rasterize_mesh_pallas_binned_uv16)
    mesh = load_obj(REF_DEMO)
    rng = np.random.RandomState(2)
    v = mesh.verts
    v = (v - v.mean(0)) / np.abs(v - v.mean(0)).max() * 0.9
    verts = np.stack([v, v + rng.randn(*v.shape) * 0.002]).astype(np.float32)
    verts = np.concatenate([verts[..., :2], 10.0 - verts[..., 2:] * 2], -1)
    faces = mesh.faces.astype(np.int32)
    F = faces.shape[0]
    attrs = rng.rand(1, F, 3, 2).astype(np.float32) * 2 - 1
    H = 128
    pf32, u32, v32 = rasterize_mesh_pallas_binned_uv(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs), H,
        max_seg=8192, interpret=True)
    pf16, u16, v16 = rasterize_mesh_pallas_binned_uv16(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(attrs), H,
        max_seg=8192, interpret=True)
    np.testing.assert_array_equal(np.asarray(pf16), np.asarray(pf32))
    np.testing.assert_array_equal(np.asarray(u16), np.asarray(u32))
    np.testing.assert_array_equal(np.asarray(v16), np.asarray(v32))


def test_pallas_binned_kernels_aot_lower_for_tpu():
    """Mosaic lowering preflight at PRODUCTION shapes (batch-4 single view,
    FLAME 9976 faces, 256^2, max_seg=8192) for both binned kernels — the
    TPU-default rasterizer path must never hit an unsupported-op lowering
    regression on hardware we cannot reach from CI."""
    from next3d_tpu.ops.pallas_raster import (
        rasterize_mesh_pallas_binned, rasterize_mesh_pallas_binned_uv)
    B, F, H = 4, 9976, 256
    verts = jnp.zeros((B, 5023, 3), jnp.float32)
    faces = jnp.zeros((F, 3), jnp.int32)
    attrs = jnp.zeros((1, F, 3, 2), jnp.float32)
    jax.jit(rasterize_mesh_pallas_binned, static_argnums=(2, 3)).trace(
        verts, faces, H, 8192).lower(lowering_platforms=("tpu",))
    jax.jit(rasterize_mesh_pallas_binned_uv, static_argnums=(3, 4)).trace(
        verts, faces, attrs, H, 8192).lower(lowering_platforms=("tpu",))
    from next3d_tpu.ops.pallas_raster import rasterize_mesh_pallas_binned_uv16
    jax.jit(rasterize_mesh_pallas_binned_uv16, static_argnums=(3, 4)).trace(
        verts, faces, attrs, H, 1024).lower(lowering_platforms=("tpu",))
