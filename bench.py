"""Benchmark: 512^2 avatar synthesis / reenactment throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Default mode measures the flagship TriPlaneGenerator full forward (mapping +
texture + 4-view rasterization + mouth pipeline + volume render 48+48 + SR
to 512^2) — the generation path behind gen_samples (BASELINE.json north
star). Env knobs:

  NEXT3D_BENCH_MODE=synthesis|reenact|train
                                        reenact = identity-cached per-frame
                                        path (textures + static plane cached
                                        per subject, only rasterize->mouth->
                                        blend->render->SR per frame — the
                                        reenact_avatar FPS metric);
                                        train = full 4-phase GAN step incl.
                                        G+D regularizers on one chip,
                                        imgs/s (training throughput)
  NEXT3D_BENCH_BATCH=4                  batch size
  NEXT3D_BENCH_SWEEP=1                  also print (to stderr) a batch sweep
  NEXT3D_BENCH_BF16=1                   bf16 blocks (0 = full fp32 parity)
  NEXT3D_BENCH_ITERS=10

vs_baseline: the reference publishes no throughput (BASELINE.md); the A100
anchor is 15 img/s for batch-amortized 512^2 synthesis — a FLOP-roofline
estimate of the reference pipeline discounted for its per-frame CPU
round-trips (cv2 flood fill, numpy mouth boxes, per-sample python loops);
derivation and error bars in BASELINE.md. North-star target is
vs_baseline >= 3.0. An MFU estimate (model FLOPs from the compiled graph /
v5e bf16 peak) goes to stderr alongside the sweep.
"""

import json
import os
import sys
import time

import numpy as np

A100_BASELINE_IMGS_PER_SEC = 15.0  # provisional anchor; see BASELINE.md

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_BF16_PEAK_FLOPS = 197e12


def _measure(fn, args, batch, iters):
    import jax
    import jax.numpy as jnp

    def drain(x):
        # a scalar VALUE FETCH is the only guaranteed sync on this
        # remote-TPU client (block_until_ready can return early for some
        # dispatch chains — docs/STAGE_PROFILE.md measurement discipline);
        # jnp.sum depends on every element, so fetching it drains the queue
        return float(jnp.sum(x.astype(jnp.float32)))

    img = fn(*args)
    drain(img)
    # vary inputs (defeats identical-dispatch caching in remote-TPU clients,
    # matches real serving), but PRE-STAGE the variations on device so the
    # timed loop issues exactly one dispatch per iteration
    staged = [jax.device_put(args[0] + np.float32(i) * 1e-6)
              for i in range(iters)]
    jax.block_until_ready(staged)
    drain(fn(staged[0], *args[1:]))  # warm-up with staged input
    t0 = time.perf_counter()
    for a0 in staged:
        img = fn(a0, *args[1:])
    drain(img)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    import jax
    import __graft_entry__ as ge

    mode = os.environ.get('NEXT3D_BENCH_MODE', 'synthesis')
    batch = int(os.environ.get('NEXT3D_BENCH_BATCH', '8'))
    use_bf16 = os.environ.get('NEXT3D_BENCH_BF16', '1') == '1'
    iters = int(os.environ.get('NEXT3D_BENCH_ITERS', '10'))
    sweep = os.environ.get('NEXT3D_BENCH_SWEEP', '0') == '1'

    from next3d_tpu.models import TriPlaneGenerator
    rk = dict(ge.RENDER_KW_FFHQ)
    if os.environ.get('NEXT3D_BENCH_FUSED', '0') == '1':
        rk['fused_plane_sampling'] = True
    G = TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512, img_resolution=512, img_channels=3,
        topology_path=ge.DEMO_OBJ, rendering_kwargs=rk,
        sr_num_fp16_res=4, force_fp32=not use_bf16,
        rasterizer_impl=os.environ.get('NEXT3D_BENCH_RASTER', 'auto'))
    params = G.init(jax.random.PRNGKey(0))

    z = np.random.RandomState(0).randn(batch, 512).astype(np.float32)
    c = ge._camera_batch(batch)
    v = ge._verts_batch(batch)

    if mode == 'reenact':
        # identity prep once per subject (the reference recomputes it per
        # frame — SURVEY section 3.5); per-frame work is everything
        # expression/camera-dependent
        @jax.jit
        def prep(params, z, c):
            ws = G.mapping(params, z, c, truncation_psi=0.7,
                           truncation_cutoff=14)
            n_tex = G.texture_backbone.num_ws
            textures = G.texture_backbone.synthesis(
                params['texture_backbone']['synthesis'], ws[:, n_tex:],
                noise_mode='const', force_fp32=G.force_fp32)
            static = G.backbone.synthesis(
                params['backbone']['synthesis'], ws[:, :n_tex],
                noise_mode='const', force_fp32=G.force_fp32)
            static = static.reshape(static.shape[0], 3, 32,
                                    *static.shape[-2:])
            return ws, textures, static

        ws, textures, static = jax.block_until_ready(prep(params, z, c))

        @jax.jit
        def frame(v, params, ws, textures, static, c):
            return G.synthesis_from_identity(
                params, ws, textures, static, c, v,
                noise_mode='const')['image']

        value = _measure(lambda v_, *a: frame(v_, *a),
                         (np.asarray(v, np.float32), params, ws, textures,
                          static, c), batch, iters)
        metric = '512px_reenact_frames_per_sec_per_chip'
    elif mode == 'train':
        from next3d_tpu.nn import DualDiscriminator
        from next3d_tpu.parallel import data_parallel_mesh
        from next3d_tpu.train import (LossConfig, StyleGAN2Loss, TrainStep,
                                      make_optimizer)
        D = DualDiscriminator(c_dim=25, img_resolution=512, img_channels=3,
                              num_fp16_res=4, conv_clamp=256)
        loss = StyleGAN2Loss(G, D, LossConfig(
            r1_gamma=4.0, gpc_reg_prob=None, density_reg=0.25,
            neural_rendering_resolution_initial=64, blur_init_sigma=0.0))
        step = TrainStep(loss,
                         make_optimizer(0.0025, 0.0, 0.99, 1e-8,
                                        reg_interval=4),
                         make_optimizer(0.002, 0.0, 0.99, 1e-8,
                                        reg_interval=16),
                         mesh=data_parallel_mesh(jax.devices()[:1]))
        state = step.init_state(jax.random.PRNGKey(0))
        sched, nrr = loss.schedules(0)
        real = np.random.RandomState(1).randn(
            batch, 3, 512, 512).astype(np.float32)
        batch_d = {'gen_z': z, 'gen_c': c, 'gen_v': np.asarray(v, np.float32),
                   'real_c': c}

        def one_step(gz, state, do_greg, do_dreg):
            b = dict(batch_d, gen_z=gz)
            new_state, _ = step.run_phases(
                state, b, real, jax.random.PRNGKey(2), sched, nrr,
                do_greg=do_greg, do_dreg=do_dreg)
            return new_state

        # time the three step flavors separately and combine at the
        # reference's lazy-reg cadence (Greg every 4 G-steps, Dreg every
        # 16 D-steps — train_next3d.py:366-367): the all-regs step bench
        # previously reported the WORST step as if it were every step.
        #
        # Per-step VALUE FETCH, not block_until_ready: on this remote-TPU
        # client block_until_ready can return before the dispatched work
        # drains (docs/STAGE_PROFILE.md "measurement discipline"), which
        # let warm-up/compile drain inside the first timed loop — the r4/r5
        # "plain 101-141 s vs +Greg 1.1 s" inversion (a +Greg step re-runs
        # the same compiled gmain+dmain, so plain cannot be slower).
        # Median of fetched per-step times, warm-up discarded.
        def fetch(s):
            # np.asarray forces a real device->host transfer (a guaranteed
            # sync; jax.block_until_ready is not, on this client)
            return float(np.asarray(
                s.params_G['backbone']['mapping']['w_avg']).sum())

        def timed(do_greg, do_dreg, n=max(2, iters // 2)):
            nonlocal state
            tag = f'greg={int(do_greg)} dreg={int(do_dreg)}'
            t0 = time.perf_counter()
            state = one_step(z, state, do_greg, do_dreg)  # compile
            fetch(state)
            print(f'[train {tag}] compile+first: '
                  f'{time.perf_counter() - t0:.1f}s', file=sys.stderr,
                  flush=True)
            t0 = time.perf_counter()
            state = one_step(z + np.float32(99) * 1e-6, state,
                             do_greg, do_dreg)  # warm-up, fetched
            fetch(state)
            print(f'[train {tag}] warm-up: {time.perf_counter() - t0:.1f}s',
                  file=sys.stderr, flush=True)
            ts = []
            for i in range(n):
                t0 = time.perf_counter()
                state = one_step(z + np.float32(i) * 1e-6, state,
                                 do_greg, do_dreg)
                fetch(state)
                ts.append(time.perf_counter() - t0)
                print(f'[train {tag}] step {i}: {ts[-1]:.3f}s',
                      file=sys.stderr, flush=True)
            ts.sort()
            return ts[len(ts) // 2]

        t_plain = timed(False, False)
        t_greg = timed(True, False)
        t_dreg = timed(False, True)
        t_avg = t_plain + (t_greg - t_plain) / 4 + (t_dreg - t_plain) / 16
        print(f'step seconds: plain {t_plain:.3f}, +Greg {t_greg:.3f}, '
              f'+Dreg(R1) {t_dreg:.3f}; schedule-amortized {t_avg:.3f}',
              file=sys.stderr)
        value = batch / t_avg
        metric = '512px_train_step_imgs_per_sec_per_chip'
    else:
        @jax.jit
        def forward(z, params, c, v):
            ws = G.mapping(params, z, c, truncation_psi=0.7,
                           truncation_cutoff=14)
            return G.synthesis(params, ws, c, v, noise_mode='const')['image']

        value = _measure(forward, (z, params, c, v), batch, iters)
        metric = '512px_synthesis_imgs_per_sec_per_chip'

        try:  # MFU estimate from the compiled graph's FLOP count
            cost = forward.lower(z, params, c, v).compile().cost_analysis()
            flops = (cost or {}).get('flops', 0.0)
            if flops:
                mfu = flops / batch * value / V5E_BF16_PEAK_FLOPS
                print(f'model ~{flops / batch / 1e9:.1f} GFLOP/img; '
                      f'MFU ~{100 * mfu:.1f}% of v5e bf16 peak',
                      file=sys.stderr)
        except Exception:
            pass

        if sweep:
            for b in (1, 8, 16, 32):
                zb = np.random.RandomState(1).randn(b, 512).astype(np.float32)
                try:
                    r = _measure(forward,
                                 (zb, params, ge._camera_batch(b),
                                  ge._verts_batch(b)), b, max(4, iters // 2))
                    print(f'batch {b:3d}: {r:.3f} img/s', file=sys.stderr)
                except Exception as e:  # e.g. HBM OOM at the top end
                    print(f'batch {b:3d}: failed ({type(e).__name__})',
                          file=sys.stderr)

    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "img/s",
        "vs_baseline": round(value / A100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
