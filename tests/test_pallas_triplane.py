"""Fused tri-plane sampling kernel vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.ops.pallas_triplane import sample_from_planes_fused
from next3d_tpu.render.renderer import sample_from_planes
from next3d_tpu.render.ray_sampler import sample_rays


def _camera_coords(n=1, rays=256, steps=16):
    """Renderer-like sample coords: rays from a frontal camera x depths."""
    import math
    from next3d_tpu.render import camera_utils
    cam = camera_utils.lookat_pose(math.pi / 2, math.pi / 2,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7,
                                   batch_size=1)
    K = camera_utils.fov_to_intrinsics(18.837)
    c2w = jnp.tile(cam, (n, 1, 1))
    Kb = jnp.tile(jnp.asarray(K)[None], (n, 1, 1))
    res = int(np.sqrt(rays))
    ro, rd = sample_rays(c2w, Kb, res)
    depths = jnp.linspace(2.25, 3.3, steps)
    coords = ro[:, :, None] + depths[None, None, :, None] * rd[:, :, None]
    return coords.reshape(n, -1, 3)


def test_fused_matches_xla_on_camera_coords(rng):
    planes = jnp.asarray(rng.randn(2, 3, 32, 64, 64).astype(np.float32))
    coords = _camera_coords(n=2, rays=256, steps=32)  # one image row / tile
    coords = coords * 0.42  # keep projections inside the planes
    want = np.asarray(sample_from_planes(planes, coords, box_warp=1.0))
    got = np.asarray(sample_from_planes_fused(planes, coords, box_warp=1.0,
                                              tile_samples=512,
                                              interpret=True,
                                              precision='highest'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_resident_mode_and_bf16_storage(rng):
    """The whole plane lives in persistent VMEM scratch — no row-span
    constraint, so a hard side pose (yaw +0.6, unscaled coords sweeping
    out of the box) must be exact at 'highest'. The bf16 path runs
    DEFAULT-precision dots, so it only needs to match to bf16
    rounding."""
    planes = jnp.asarray(rng.randn(1, 3, 8, 64, 64).astype(np.float32))
    import math
    from next3d_tpu.render import camera_utils
    cam = camera_utils.lookat_pose(math.pi / 2 + 0.6, math.pi / 2 + 0.1,
                                   jnp.asarray([0, 0, 0.2]), radius=2.7,
                                   batch_size=1)
    K = jnp.asarray(camera_utils.fov_to_intrinsics(18.837))[None]
    ro, rd = sample_rays(cam, K, 16)
    depths = jnp.linspace(2.25, 3.3, 32)
    coords = (ro[:, :, None] + depths[None, None, :, None]
              * rd[:, :, None]).reshape(1, -1, 3)
    want = np.asarray(sample_from_planes(planes, coords, box_warp=1.0))
    got = np.asarray(sample_from_planes_fused(planes, coords, box_warp=1.0,
                                              tile_samples=512,
                                              interpret=True,
                                              precision='highest'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got_bf = np.asarray(sample_from_planes_fused(planes, coords, box_warp=1.0,
                                                 tile_samples=512,
                                                 interpret=True,
                                                 precision='bf16'))
    np.testing.assert_allclose(got_bf, want, rtol=0.05, atol=0.05)


def test_fused_zeros_padding_exact(rng):
    """Out-of-plane samples must reproduce grid_sample's zeros padding
    (incl. partially-faded border pixels) exactly."""
    planes = jnp.asarray(rng.randn(1, 3, 8, 64, 64).astype(np.float32))
    coords = _camera_coords(n=1, rays=256, steps=32)  # z exceeds the box
    want = np.asarray(sample_from_planes(planes, coords, box_warp=1.0))
    got = np.asarray(sample_from_planes_fused(planes, coords, box_warp=1.0,
                                              tile_samples=512,
                                              interpret=True,
                                              precision='highest'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_large_tiles_match_xla(rng):
    """tile_samples=1024 (the TPU-fast configuration) must stay exact on
    renderer-like access patterns."""
    planes = jnp.asarray(rng.randn(1, 3, 8, 64, 64).astype(np.float32))
    coords = _camera_coords(n=1, rays=1024, steps=32)  # M = 32768
    coords = coords * 0.42
    want = np.asarray(sample_from_planes(planes, coords, box_warp=1.0))
    got = np.asarray(sample_from_planes_fused(planes, coords, box_warp=1.0,
                                              tile_samples=1024,
                                              interpret=True,
                                              precision='highest'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_matches_xla_on_grid_coords(rng):
    """Shape-extraction ordering: z varies fastest over a regular grid, so a
    512-sample tile covers few y values — compact rows for every plane."""
    planes = jnp.asarray(rng.randn(1, 3, 8, 32, 32).astype(np.float32))
    from next3d_tpu.render.shape_utils import create_samples
    samples, _, _ = create_samples(N=32, cube_length=0.9)
    coords = jnp.asarray(samples[None])  # (1, 32768, 3)
    want = np.asarray(sample_from_planes(planes, coords, box_warp=1.0))
    got = np.asarray(sample_from_planes_fused(planes, coords, box_warp=1.0,
                                              tile_samples=512,
                                              interpret=True,
                                              precision='highest'))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dma_gather_row_blocks_interpret(rng):
    """Correctness of the per-row DMA ring gather (ops/pallas_dma_gather.py;
    a pinned-negative perf experiment, but its aligned-block semantics must
    stay exact — hardware-validated in round 5, interpreted here)."""
    from next3d_tpu.ops.pallas_dma_gather import dma_gather_row_blocks
    table = jnp.asarray(rng.randn(64, 128), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 64, 96), jnp.int32)
    out = dma_gather_row_blocks(table, idx, tile=32, depth=4, interpret=True)
    assert out.shape == (96, 8, 128)
    tn = np.asarray(table)
    ix = np.asarray(idx)
    np.testing.assert_array_equal(np.asarray(out),
                                  tn[((ix // 8) * 8)[:, None]
                                     + np.arange(8)[None]])
    # the requested row sits at idx % 8 inside its block
    np.testing.assert_array_equal(
        np.asarray(out)[np.arange(96), ix % 8], tn[ix])
