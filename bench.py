"""Benchmark: 512^2 avatar synthesis throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measures the flagship TriPlaneGenerator full forward (mapping + texture +
4-view rasterization + mouth pipeline + volume render 48+48 + SR to 512^2)
— the generation path behind gen_samples/reenact (BASELINE.json north star).

vs_baseline: the reference publishes no throughput (BASELINE.md); the A100
anchor used here is a PROVISIONAL estimate of the reference pipeline at
batch-amortized inference (~15 img/s on A100 for 512^2 synthesis+reenact,
to be replaced by an empirical measurement). The north-star target is
vs_baseline >= 3.0.
"""

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_IMGS_PER_SEC = 15.0  # provisional; see module docstring

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import __graft_entry__ as ge

    batch = int(os.environ.get('NEXT3D_BENCH_BATCH', '4'))
    use_bf16 = os.environ.get('NEXT3D_BENCH_BF16', '1') == '1'

    from next3d_tpu.models import TriPlaneGenerator
    rk = dict(ge.RENDER_KW_FFHQ)
    # the XLA take_along_axis sampling path measured FASTER than the fused
    # Pallas kernel in clean single-job runs (257ms vs 1050ms+ per 1.57M
    # samples) — the one-hot-matmul formulation burns ~30 TFLOP on what is
    # fundamentally a gather. Fused stays opt-in for kernel development.
    if os.environ.get('NEXT3D_BENCH_FUSED', '0') == '1':
        rk['fused_plane_sampling'] = True
    G = TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        topology_path=ge.DEMO_OBJ, rendering_kwargs=rk,
        sr_num_fp16_res=4, force_fp32=not use_bf16)
    params = G.init(jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, z, c, v):
        ws = G.mapping(params, z, c, truncation_psi=0.7, truncation_cutoff=14)
        return G.synthesis(params, ws, c, v, noise_mode='const')['image']

    z = np.random.RandomState(0).randn(batch, 512).astype(np.float32)
    c = ge._camera_batch(batch)
    v = ge._verts_batch(batch)

    # compile + warmup
    img = forward(params, z, c, v)
    jax.block_until_ready(img)

    iters = int(os.environ.get('NEXT3D_BENCH_ITERS', '10'))
    t0 = time.perf_counter()
    for i in range(iters):
        # vary z per iteration: defeats any identical-dispatch caching in
        # remote-TPU clients and matches real serving (new latents per call)
        img = forward(params, z + np.float32(i) * 1e-6, c, v)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "512px_synthesis_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
