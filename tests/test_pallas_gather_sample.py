"""Fused tri-plane gather kernel (ops/pallas_gather_sample.py): interpret-
mode numerics vs the XLA sampling path, plus an AOT Mosaic lowering
preflight for the TPU platform (runnable on this CPU-only host)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from next3d_tpu.ops.pallas_gather_sample import sample_planes_mean_fused
from next3d_tpu.render.renderer import sample_from_planes


@pytest.mark.parametrize("M,H", [(1024, 32), (2048, 32), (1000, 32)])
def test_matches_xla_path_interpret(rng, M, H):
    N, C = 2, 32
    planes = jnp.asarray(rng.randn(N, 3, C, H, H), jnp.float32)
    # coords straddle in/out of the box so zeros-padding is exercised
    coords = jnp.asarray(rng.uniform(-0.7, 0.7, (N, M, 3)), jnp.float32)
    box_warp = 1.0

    ref = sample_from_planes(planes, coords, box_warp).mean(axis=1)
    got = sample_planes_mean_fused(planes, coords, box_warp,
                                   gather_bf16=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_bf16_tables_match_bf16_xla(rng):
    N, C, H, M = 1, 32, 32, 1024
    planes = jnp.asarray(rng.randn(N, 3, C, H, H), jnp.float32)
    coords = jnp.asarray(rng.uniform(-0.45, 0.45, (N, M, 3)), jnp.float32)
    ref = sample_from_planes(planes, coords, 1.0,
                             gather_bf16=True).mean(axis=1)
    got = sample_planes_mean_fused(planes, coords, 1.0, gather_bf16=True,
                                   interpret=True)
    # same bf16 table quantization on both sides; only summation order
    # differs
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-2)


def test_aot_lowers_for_tpu(rng):
    """Mosaic lowering preflight at the PRODUCTION shapes (B=4 render tile:
    65536 samples, 256^2 planes) — catches unsupported-op regressions
    without hardware."""
    planes = jnp.zeros((1, 3, 32, 256, 256), jnp.float32)
    coords = jnp.zeros((1, 65536, 3), jnp.float32)
    jax.jit(sample_planes_mean_fused.__wrapped__, static_argnums=(2, 3, 4)).trace(
        planes, coords, 1.0, True, False).lower(lowering_platforms=("tpu",))


def test_sub4_matches_interpret(rng):
    from next3d_tpu.render.renderer import sample_from_planes
    N, C, H, M = 1, 32, 32, 1024
    planes = jnp.asarray(rng.randn(N, 3, C, H, H), jnp.float32)
    coords = jnp.asarray(rng.uniform(-0.6, 0.6, (N, M, 3)), jnp.float32)
    ref = sample_from_planes(planes, coords, 1.0).mean(axis=1)
    got = sample_planes_mean_fused(planes, coords, 1.0, False, True, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sub4_aot_lowers_for_tpu():
    planes = jnp.zeros((1, 3, 32, 256, 256), jnp.float32)
    coords = jnp.zeros((1, 65536, 3), jnp.float32)
    jax.jit(sample_planes_mean_fused.__wrapped__,
            static_argnums=(2, 3, 4, 5)).trace(
        planes, coords, 1.0, True, False, 4).lower(
        lowering_platforms=("tpu",))


def test_grad_matches_xla_path(rng):
    """custom_vjp backward: grads of sum(kernel output) w.r.t. planes AND
    coords must equal the XLA composition's grads (the backward recomputes
    through sample_from_planes(...).mean(axis=1))."""
    N, C, H, M = 1, 32, 16, 1024
    planes = jnp.asarray(rng.randn(N, 3, C, H, H), jnp.float32)
    coords = jnp.asarray(rng.uniform(-0.6, 0.6, (N, M, 3)), jnp.float32)

    def via_kernel(p, c):
        out = sample_planes_mean_fused(p, c, 1.0, False, True)
        return jnp.sum(out * out)

    def via_xla(p, c):
        out = sample_from_planes(p, c, 1.0).mean(axis=1)
        return jnp.sum(out * out)

    gk = jax.grad(via_kernel, argnums=(0, 1))(planes, coords)
    gx = jax.grad(via_xla, argnums=(0, 1))(planes, coords)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gx[1]),
                               atol=1e-4, rtol=1e-4)
