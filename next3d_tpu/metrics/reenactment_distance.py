"""AED / APD reenactment-quality metrics.

Functional rebuild of the reference's *intended* (but stale/broken)
reenactment evaluation: Average Expression Distance and Average Pose
Distance between a source driving sequence and its reenactment — RMSE over
the first 50 expression coefficients and the 3 pose (Euler-angle)
coefficients of a 3DMM fit of each frame (reference `evaluation.py:105-107`;
the per-frame coeff-extraction protocol is `cal_3dmm_distance.py:14-38`,
which pulls coefficients from Deep3DFaceRecon — its `util.video_preprocess`
import does not resolve in the reference checkout, so this module fixes the
protocol rather than copying it).

The 3DMM coefficient extractor is pluggable (`MetricOptions.coeff_extractor`
— any callable mapping uint8 NCHW RGB frames to an (N, >=53) coefficient
array laid out [exp(50) | pose(3) | ...]), or a TorchScript module path via
the NEXT3D_3DMM_EXTRACTOR env var (run on torch-CPU, mirroring the
detector escape hatch of `metric_utils.get_detector`). This environment has
no extraction network (zero egress), so tests exercise the full pipeline
with a stub extractor.

Protocol: the generator reenacts the driving sequence with a FIXED identity
(z from opts.seed, frontal conditioning) — per frame the dataset supplies
the camera label and FLAME verts, exactly the reenact CLI's loop
(reference `reenact_avatar_next3d.py:125-164`). Coefficients are extracted
from both the real driving frames and the reenacted frames.
"""

from __future__ import annotations

import os

import numpy as np

from .metric_utils import MetricOptions, _to_uint8


def get_coeff_extractor(opts: MetricOptions):
    if getattr(opts, 'coeff_extractor', None) is not None:
        return opts.coeff_extractor
    path = os.environ.get('NEXT3D_3DMM_EXTRACTOR')
    if path and os.path.exists(path):
        import torch
        model = torch.jit.load(path).eval()

        def extract(images_uint8):
            with torch.no_grad():
                t = torch.as_tensor(
                    np.ascontiguousarray(images_uint8)).float() / 255.0
                return np.asarray(model(t))
        return extract
    raise RuntimeError(
        'No 3DMM coefficient extractor: set NEXT3D_3DMM_EXTRACTOR to a '
        'TorchScript module mapping (N,3,H,W) float RGB to (N,>=53) '
        'coefficients [exp(50)|pose(3)|...], or pass '
        'MetricOptions.coeff_extractor.')


def compute_aed_apd(opts: MetricOptions, num_frames=None):
    """Returns dict(aed=..., apd=...) over the first ``num_frames`` frames
    of ``opts.dataset`` (all frames if None)."""
    import jax
    import jax.numpy as jnp

    extractor = get_coeff_extractor(opts)
    G, params, ds = opts.generator, opts.params, opts.dataset
    n = len(ds) if num_frames is None else min(len(ds), num_frames)
    bs = opts.batch_size

    # fixed identity: frontal conditioning like the reenact CLI
    # (reenact_avatar_next3d.py:117-124 uses the frontal label of the
    # conditioning pose; c_gen_conditioning_zero configs ignore it anyway)
    rnd = np.random.RandomState(opts.seed)
    z = rnd.randn(1, G.z_dim).astype(np.float32)
    cond_c = np.asarray(ds.get_label(0), np.float32)[None]

    def reenact(params, ws, c, v):
        return G.synthesis(params, ws, c, v,
                           noise_mode='const')['image']

    if opts.jit:
        reenact = jax.jit(reenact)

    ws = G.mapping(params, jnp.asarray(z), jnp.asarray(cond_c[:, :G.c_dim]),
                   truncation_psi=opts.truncation_psi)

    real_coeffs, fake_coeffs = [], []
    for lo in range(0, n, bs):
        idx = list(range(lo, min(lo + bs, n)))
        items = [ds[i] for i in idx]
        real = np.stack([it[0] for it in items])
        if real.shape[1] == 1:
            real = np.repeat(real, 3, axis=1)
        c = np.stack([np.asarray(it[1], np.float32) for it in items])
        v = np.stack([np.asarray(it[2], np.float32) for it in items])
        wsb = jnp.broadcast_to(ws, (len(idx),) + ws.shape[1:])
        fake = reenact(params, wsb, jnp.asarray(c[:, :G.c_dim]),
                       jnp.asarray(v))
        real_coeffs.append(np.asarray(extractor(real)))
        fake_coeffs.append(np.asarray(extractor(_to_uint8(fake))))

    real_c = np.concatenate(real_coeffs, 0)
    fake_c = np.concatenate(fake_coeffs, 0)
    assert real_c.shape[1] >= 53 and fake_c.shape[1] >= 53, \
        f'coeff extractor must emit >=53 coeffs, got {real_c.shape}'

    def rmse(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    # AED: RMSE over the 50 expression coeffs; APD: RMSE over the 3 pose
    # coeffs (reference evaluation.py:105-107)
    return dict(aed=rmse(real_c[:, :50], fake_c[:, :50]),
                apd=rmse(real_c[:, 50:53], fake_c[:, 50:53]))
