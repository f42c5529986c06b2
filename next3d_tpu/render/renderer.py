"""Tri-plane sampling + EG3D two-pass importance volume renderer.

Behavioral spec: training_avatar_texture/volumetric_rendering/renderer.py
(generate_planes :30-44 incl. the deliberately non-orthonormal axis matrices
matching shipped EG3D checkpoints, project_onto_planes :46-60,
sample_from_planes :62-72, ImportanceRenderer :89-268).

Everything is static-shaped and jit-compatible; stochastic sampling takes an
explicit PRNG key. The decoder is passed as ``(params, fn)`` where
``fn(params, sampled_features, directions) -> {'rgb', 'sigma'}``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample_2d
from . import math_utils
from .ray_marcher import mip_ray_marcher2


def generate_planes() -> np.ndarray:
    """Plane axis matrices (reference: renderer.py:30-44). NOTE: the 2nd/3rd
    entries are intentionally NOT orthonormal inverses of each other — they
    match the EG3D checkpoints' convention."""
    return np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                     [[0, 0, 1], [0, 1, 0], [1, 0, 0]]], dtype=np.float32)


_INV_PLANES = np.linalg.inv(generate_planes()).astype(np.float32)  # (3, 3, 3)


def project_onto_planes(coordinates, inv_planes=None):
    """(N, M, 3) -> (N*3, M, 2) plane coordinates (reference :46-60)."""
    N, M, _ = coordinates.shape
    inv = jnp.asarray(_INV_PLANES if inv_planes is None else inv_planes)
    n_planes = inv.shape[0]
    coords = jnp.broadcast_to(coordinates[:, None], (N, n_planes, M, 3))
    proj = jnp.einsum('npmc,pcd->npmd', coords, inv,
                      precision=jax.lax.Precision.HIGHEST)
    return proj.reshape(N * n_planes, M, 3)[..., :2]


def sample_from_planes(plane_features, coordinates, box_warp,
                       gather_bf16=False):
    """(N, 3, C, H, W), (N, M, 3) -> (N, 3, M, C) (reference :62-72).

    gather_bf16: store the gathered table in bfloat16 (halves the gather
    bytes of the dominant cost, ~+10%% end-to-end frame rate); sampled
    features are promoted back to float32 for the decoder. Off for parity
    paths (the flagship enables it when force_fp32=False, mirroring the
    reference's fp16-block policy)."""
    N, n_planes, C, H, W = plane_features.shape
    M = coordinates.shape[1]
    feats = plane_features.reshape(N * n_planes, C, H, W)
    if gather_bf16 and feats.dtype == jnp.float32:
        feats = feats.astype(jnp.bfloat16)
    coords = (2 / box_warp) * coordinates
    proj = project_onto_planes(coords)  # (N*3, M, 2)
    out = grid_sample_2d(feats, proj[:, None])  # (N*3, C, 1, M)
    out = out.astype(jnp.float32)
    return out[:, :, 0].transpose(0, 2, 1).reshape(N, n_planes, M, C)


def _uniform(rng, shape):
    """U(0,1) jitter; rng=None gives the deterministic midpoint 0.5 (used by
    parity tests and deterministic inference)."""
    if rng is None:
        return jnp.full(shape, 0.5, jnp.float32)
    return jax.random.uniform(rng, shape, jnp.float32)


def sample_from_3dgrid(grid, coordinates):
    """Trilinear sampling from a dense voxel grid (reference renderer.py
    :74-87). grid: (1 or N, C, D, H, W); coordinates: (N, M, 3) in [-1, 1].
    Returns (N, M, C)."""
    N, M, _ = coordinates.shape
    if grid.shape[0] == 1:
        grid = jnp.broadcast_to(grid, (N,) + grid.shape[1:])
    C, D, H, W = grid.shape[1:]
    # unnormalize (align_corners=False): (c+1)/2*S - 0.5 per axis (x->W, y->H, z->D)
    cx = (coordinates[..., 0] + 1) * (W / 2) - 0.5
    cy = (coordinates[..., 1] + 1) * (H / 2) - 0.5
    cz = (coordinates[..., 2] + 1) * (D / 2) - 0.5
    feat = grid.transpose(0, 2, 3, 4, 1).reshape(N, D * H * W, C)

    def corner(zi, yi, xi, w):
        valid = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                 & (zi >= 0) & (zi < D))
        idx = (jnp.clip(zi, 0, D - 1) * H * W + jnp.clip(yi, 0, H - 1) * W
               + jnp.clip(xi, 0, W - 1))
        g = jnp.take_along_axis(feat, idx[..., None], axis=1)
        return g * (w * valid.astype(grid.dtype))[..., None]

    x0 = jnp.floor(cx).astype(jnp.int32)
    y0 = jnp.floor(cy).astype(jnp.int32)
    z0 = jnp.floor(cz).astype(jnp.int32)
    wx = cx - x0
    wy = cy - y0
    wz = cz - z0
    out = 0
    for dz, wz_ in ((0, 1 - wz), (1, wz)):
        for dy, wy_ in ((0, 1 - wy), (1, wy)):
            for dx, wx_ in ((0, 1 - wx), (1, wx)):
                out = out + corner(z0 + dz, y0 + dy, x0 + dx, wz_ * wy_ * wx_)
    return out


def sample_stratified(rng, ray_origins, ray_start, ray_end, depth_resolution,
                      disparity_space_sampling=False):
    """Jittered uniform depths (reference :184-207). ray_start/ray_end may be
    floats or (N, M, 1) tensors (auto box-intersection path)."""
    N, M, _ = ray_origins.shape
    if disparity_space_sampling:
        base = jnp.linspace(0, 1, depth_resolution, dtype=jnp.float32)
        base = jnp.broadcast_to(base.reshape(1, 1, -1, 1),
                                (N, M, depth_resolution, 1))
        delta = 1 / (depth_resolution - 1)
        u = _uniform(rng, base.shape)
        d = base + u * delta
        return 1. / (1. / ray_start * (1. - d) + 1. / ray_end * d)
    if isinstance(ray_start, (int, float)):
        base = jnp.linspace(ray_start, ray_end, depth_resolution,
                            dtype=jnp.float32)
        base = jnp.broadcast_to(base.reshape(1, 1, -1, 1),
                                (N, M, depth_resolution, 1))
        delta = (ray_end - ray_start) / (depth_resolution - 1)
        u = _uniform(rng, base.shape)
        return base + u * delta
    # tensor ray limits: linspace over (N, M, 1) then permute (reference :199)
    base = math_utils.linspace_batch(ray_start, ray_end, depth_resolution)
    base = jnp.transpose(base, (1, 2, 0, 3))  # (N, M, S, 1)
    delta = (ray_end - ray_start) / (depth_resolution - 1)  # (N, M, 1)
    u = _uniform(rng, base.shape)
    return base + u * delta[..., None, :]


def sample_pdf(rng, bins, weights, N_importance, det=False, eps=1e-5):
    """Inverse-CDF sampling (reference :229-268).

    bins: (R, B+1); weights: (R, B) -> samples (R, N_importance).

    Invariants (required by the gather-free bracket selection below, which
    picks bracket values by masked max/min over VALUES rather than by
    position): ``bins`` must be non-decreasing along the last axis and
    ``u`` is drawn from [0, 1) (so with cdf[0] == 0 the lower bracket is
    never -inf). Both hold for the internal caller (sorted z_mid midpoints,
    internally generated uniform/linspace u); external callers with
    unsorted bins must sort first.
    """
    R, B = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, B+1)

    if det or rng is None:
        u = jnp.broadcast_to(jnp.linspace(0, 1, N_importance), (R, N_importance))
    else:
        u = jax.random.uniform(rng, (R, N_importance), jnp.float32)

    # searchsorted(side='right') + the 4 bracket lookups, all GATHER-FREE:
    # TPU gathers are per-row bound (~67 ns/row), so 4x take_along_axis of
    # (R, K) from (R, B+1) costs ~70 ms for the batch-8 FFHQ render; since
    # cdf is STRICTLY increasing (weights + eps) and bins is sorted, the
    # bracketing values are masked min/max reductions over one (R, K, B+1)
    # comparison tensor instead — bit-identical values, pure VPU, <1 ms.
    #   below = last b with cdf[b] <= u  -> max of cdf/bins where cdf <= u
    #   above = first b with cdf[b] > u  -> min of cdf/bins where cdf > u
    #           (no such b => above = B, the old min(inds, B) clamp)
    # bins may be WIDER than cdf (the renderer passes z_mid (R, S-1) with
    # marcher weights (R, S-1) -> cdf (R, S-2+1)); index clamping means
    # columns past cdf's width were never selectable — truncate to match.
    bins = bins[:, :B + 1]
    le = cdf[:, None, :] <= u[:, :, None]            # (R, K, B+1)
    cdf_b = jnp.broadcast_to(cdf[:, None, :], le.shape)
    bins_b = jnp.broadcast_to(bins[:, None, :], le.shape)
    ninf = -jnp.inf
    pinf = jnp.inf
    cdf_g0 = jnp.max(jnp.where(le, cdf_b, ninf), axis=-1)
    bins_g0 = jnp.max(jnp.where(le, bins_b, ninf), axis=-1)
    cdf_g1 = jnp.min(jnp.where(le, pinf, cdf_b), axis=-1)
    bins_g1 = jnp.min(jnp.where(le, pinf, bins_b), axis=-1)
    cdf_g1 = jnp.where(jnp.isposinf(cdf_g1), cdf[:, -1:], cdf_g1)
    bins_g1 = jnp.where(jnp.isposinf(bins_g1), bins[:, -1:], bins_g1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)


def _smooth_weights(weights):
    """max_pool1d(2,1,pad=1) then avg_pool1d(2,1) + 0.01 (reference :220-222).

    weights: (R, L) -> (R, L) (max pool with pad grows to L+1, avg shrinks back).
    """
    padded = jnp.pad(weights, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    mx = jnp.maximum(padded[:, :-1], padded[:, 1:])  # (R, L+1)
    avg = (mx[:, :-1] + mx[:, 1:]) / 2  # (R, L)
    return avg + 0.01


def sample_importance(rng, z_vals, weights, N_importance):
    """Importance depths from smoothed coarse weights (reference :209-227)."""
    N, R, S, _ = z_vals.shape
    z = jax.lax.stop_gradient(z_vals).reshape(N * R, S)
    w = jax.lax.stop_gradient(weights).reshape(N * R, -1)
    w = _smooth_weights(w)
    z_mid = 0.5 * (z[:, :-1] + z[:, 1:])
    samples = sample_pdf(rng, z_mid, w[:, 1:-1], N_importance)
    return samples.reshape(N, R, N_importance, 1)


def unify_samples(depths1, colors1, densities1, depths2, colors2, densities2):
    """Concat + sort-by-depth merge (reference :164-182).

    Implemented as ONE multi-operand stable ``lax.sort`` keyed on depth
    (channels ride along as extra operands) instead of argsort +
    take_along_axis: the broadcast gather of the (N, R, 2S, C) color tensor
    lowers to a ~66x slower generic TPU gather (917 ms -> 13.9 ms for the
    batch-4 FFHQ render merge on v5e, bit-exact — tools/profile_unify.py).
    Stability matches jnp.argsort's default, so tie order is identical.
    """
    all_depths = jnp.concatenate([depths1, depths2], axis=-2)[..., 0]
    all_colors = jnp.concatenate([colors1, colors2], axis=-2)
    all_densities = jnp.concatenate([densities1, densities2], axis=-2)[..., 0]
    C = all_colors.shape[-1]
    ops = [all_depths] + [all_colors[..., i] for i in range(C)] \
        + [all_densities]
    res = jax.lax.sort(ops, dimension=-1, num_keys=1)
    return (res[0][..., None], jnp.stack(res[1:1 + C], axis=-1),
            res[-1][..., None])


class ImportanceRenderer:
    """Two-pass coarse/fine renderer (reference: renderer.py:89-155)."""

    def run_model(self, planes, decoder, sample_coordinates, sample_directions,
                  options, rng=None):
        if options.get('fused_plane_sampling', False):
            from ..ops.pallas_triplane import sample_from_planes_fused
            sampled_features = sample_from_planes_fused(
                planes, sample_coordinates, box_warp=options['box_warp'],
                # resident-plane mode: hardware-validated EXACT (9.5e-7 at
                # 'highest') for every camera pose. NOTE: the fused kernel
                # currently measures SLOWER than the default XLA sampling
                # path in clean runs — it is an opt-in experimental kernel;
                # see ops/pallas_triplane.py for the measured numbers
                tile_samples=options.get('fused_tile_samples', 1024),
                precision=options.get('fused_precision', 'bf16'),
                # interpret=True runs the kernel on CPU (tests/CI)
                interpret=options.get('fused_interpret', False))
        else:
            sampled_features = sample_from_planes(
                planes, sample_coordinates, box_warp=options['box_warp'],
                gather_bf16=options.get('gather_bf16', False))
        decoder_params, decoder_fn = decoder
        out = decoder_fn(decoder_params, sampled_features, sample_directions)
        if options.get('density_noise', 0) > 0:
            assert rng is not None
            out['sigma'] = out['sigma'] + jax.random.normal(
                rng, out['sigma'].shape, out['sigma'].dtype) * options['density_noise']
        return out

    def __call__(self, rng, planes, decoder, ray_origins, ray_directions,
                 rendering_options):
        """Returns (rgb_final (N,R,C), depth_final (N,R,1), weight_sum (N,R,1))."""
        opts = rendering_options
        if rng is None:
            k_strat = k_imp = k_noise1 = k_noise2 = None
        else:
            k_strat, k_imp, k_noise1, k_noise2 = jax.random.split(rng, 4)

        if opts['ray_start'] == opts['ray_end'] == 'auto':
            ray_start, ray_end = math_utils.get_ray_limits_box(
                ray_origins, ray_directions, box_side_length=opts['box_warp'])
            is_ray_valid = ray_end > ray_start
            # replace invalid rays with the min/max of valid starts
            # (reference :100-103); masked min/max keeps it jit-compatible
            big = jnp.float32(1e10)
            vmin = jnp.min(jnp.where(is_ray_valid, ray_start, big))
            vmax = jnp.max(jnp.where(is_ray_valid, ray_start, -big))
            ray_start = jnp.where(is_ray_valid, ray_start, vmin)
            ray_end = jnp.where(is_ray_valid, ray_end, vmax)
            depths_coarse = sample_stratified(
                k_strat, ray_origins, ray_start, ray_end,
                opts['depth_resolution'], opts['disparity_space_sampling'])
        else:
            depths_coarse = sample_stratified(
                k_strat, ray_origins, opts['ray_start'], opts['ray_end'],
                opts['depth_resolution'], opts['disparity_space_sampling'])

        N, R, S, _ = depths_coarse.shape

        coords = (ray_origins[:, :, None] +
                  depths_coarse * ray_directions[:, :, None]).reshape(N, -1, 3)
        dirs = jnp.broadcast_to(ray_directions[:, :, None],
                                (N, R, S, 3)).reshape(N, -1, 3)
        out = self.run_model(planes, decoder, coords, dirs, opts, k_noise1)
        colors_coarse = out['rgb'].reshape(N, R, S, -1)
        densities_coarse = out['sigma'].reshape(N, R, S, 1)

        N_importance = opts['depth_resolution_importance']
        if N_importance > 0:
            _, _, weights = mip_ray_marcher2(colors_coarse, densities_coarse,
                                             depths_coarse, opts)
            depths_fine = sample_importance(k_imp, depths_coarse, weights,
                                            N_importance)
            coords = (ray_origins[:, :, None] +
                      depths_fine * ray_directions[:, :, None]).reshape(N, -1, 3)
            dirs = jnp.broadcast_to(ray_directions[:, :, None],
                                    (N, R, N_importance, 3)).reshape(N, -1, 3)
            out = self.run_model(planes, decoder, coords, dirs, opts, k_noise2)
            colors_fine = out['rgb'].reshape(N, R, N_importance, -1)
            densities_fine = out['sigma'].reshape(N, R, N_importance, 1)

            all_depths, all_colors, all_densities = unify_samples(
                depths_coarse, colors_coarse, densities_coarse,
                depths_fine, colors_fine, densities_fine)
            rgb_final, depth_final, weights = mip_ray_marcher2(
                all_colors, all_densities, all_depths, opts)
        else:
            rgb_final, depth_final, weights = mip_ray_marcher2(
                colors_coarse, densities_coarse, depths_coarse, opts)

        return rgb_final, depth_final, jnp.sum(weights, axis=2)

    def normal_forward(self, rng, planes, decoder, ray_origins,
                       ray_directions, rendering_options):
        """Variant compositing autograd surface normals
        (reference renderer.py:271-355): normals = -normalize(d sigma/d x),
        computed per sample point via jax.grad through the tri-plane decode,
        then alpha-composited alongside color. The reference chunks at
        max_batch=100000 for memory; under jit we rely on XLA scheduling and
        optional jax.checkpoint at the call site instead."""
        opts = rendering_options
        if rng is None:
            k_strat = k_imp = None
        else:
            k_strat, k_imp = jax.random.split(rng)
        depths_coarse = sample_stratified(
            k_strat, ray_origins, opts['ray_start'], opts['ray_end'],
            opts['depth_resolution'], opts['disparity_space_sampling'])
        N, R, S, _ = depths_coarse.shape

        def sigma_at(pts_flat):
            feats = sample_from_planes(planes, pts_flat[None],
                                       box_warp=opts['box_warp'])
            decoder_params, decoder_fn = decoder
            return decoder_fn(decoder_params, feats, None)['sigma'][0, :, 0]

        def run_with_normals(coords):
            flat = coords.reshape(-1, 3)
            sigma_sum = lambda p: jnp.sum(sigma_at(p))
            grads = jax.grad(sigma_sum)(flat)
            normals = -grads / (jnp.linalg.norm(grads, axis=-1, keepdims=True)
                                + 1e-7)
            feats = sample_from_planes(planes, coords, box_warp=opts['box_warp'])
            decoder_params, decoder_fn = decoder
            out = decoder_fn(decoder_params, feats, None)
            return out['rgb'], out['sigma'], normals.reshape(coords.shape)

        coords = (ray_origins[:, :, None] +
                  depths_coarse * ray_directions[:, :, None]).reshape(N, -1, 3)
        rgb = []
        sig = []
        nrm = []
        for n in range(N):  # per-batch-item grad to bound memory
            r, sg, nm = run_with_normals(coords[n:n + 1])
            rgb.append(r)
            sig.append(sg)
            nrm.append(nm)
        colors = jnp.concatenate(rgb, 0).reshape(N, R, S, -1)
        densities = jnp.concatenate(sig, 0).reshape(N, R, S, 1)
        normals = jnp.concatenate(nrm, 0).reshape(N, R, S, 3)

        rgb_final, depth_final, weights = mip_ray_marcher2(
            colors, densities, depths_coarse, opts)
        normals_mid = (normals[:, :, :-1] + normals[:, :, 1:]) / 2
        wsum = jnp.sum(weights, axis=2)
        composite_normal = jnp.sum(weights * normals_mid, axis=-2) / wsum
        composite_normal = composite_normal / (
            jnp.linalg.norm(composite_normal, axis=-1, keepdims=True) + 1e-7)
        return rgb_final, depth_final, composite_normal, wsum
