"""Localize the full-scale parity residual (VERDICT r3 weak #5 / next #6).

docs/full_scale_parity_report.json shows image max-abs 0.038 with
mean-abs 0.0019 — a handful of pixels far above the fp32-noise floor.
This tool re-runs the tools/full_scale_parity.py pair and answers WHERE
those pixels are and WHAT they correlate with:

  * top-k diff pixel coordinates for image / image_raw / image_depth;
  * correlation of the diff map with the local image gradient magnitude
    (high => the residual is a sub-pixel shift at silhouette/texture
    edges, the classic resampling-order signature);
  * the SR amplification ratio: ||diff(image)|| vs the bilinear upsample
    of ||diff(image_raw)|| (≈linear gain => SR merely amplifies an
    upstream residual and is itself parity-clean);
  * diff mass inside vs outside the mouth-crop window (fill_mouth /
    crop-paste boundary suspect);
  * diff mass on the face-silhouette band (rasterizer edge suspect),
    using a depth-validity mask edge.

Writes /tmp/parity_residual.npz (diff maps) and /tmp/PARITY_RESIDUAL.md
(scratch outputs; the committed post-mortem lives in docs/PARITY_RESIDUAL.md).
Run:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/repo/tests \
          python tools/parity_residual.py
"""

import os
import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')

import numpy as np

from full_scale_parity import run_pair  # noqa: E402


def grad_mag(img):
    """|∇| of a (C, H, W) image, max over channels."""
    gy = np.abs(np.diff(img, axis=-2, prepend=img[..., :1, :]))
    gx = np.abs(np.diff(img, axis=-1, prepend=img[..., :, :1]))
    return (gy + gx).max(axis=0)


def topk_coords(d2, k=20):
    """d2: (H, W) diff map -> [(val, y, x)] descending."""
    flat = d2.reshape(-1)
    idx = np.argsort(flat)[::-1][:k]
    H, W = d2.shape
    return [(float(flat[i]), int(i // W), int(i % W)) for i in idx]


def band_mask(valid, width=2):
    """Pixels within `width` of the valid-mask boundary."""
    m = valid.astype(bool)
    band = np.zeros_like(m)
    for _ in range(width):
        e = m.copy()
        e[1:] |= m[:-1]; e[:-1] |= m[1:]
        e[:, 1:] |= m[:, :-1]; e[:, :-1] |= m[:, 1:]
        band |= e & ~m
        m = e
    # also the inner rim
    m = valid.astype(bool)
    for _ in range(width):
        e = m.copy()
        e[1:] &= m[:-1]; e[:-1] &= m[1:]
        e[:, 1:] &= m[:, :-1]; e[:, :-1] &= m[:, 1:]
        band |= m & ~e
        m = e
    return band


def main():
    want, got, report = run_pair()
    lines = ['# Full-scale parity residual localization',
             '',
             f'Config: {report["config"]}, torch {report["torch_seconds"]}s'
             f' / jax {report["jax_seconds"]}s on CPU.', '']
    out = {}
    for key in ('image', 'image_raw', 'image_depth'):
        d = np.abs(got[key] - want[key])[0]      # (C, H, W)
        d2 = d.max(axis=0)                        # (H, W)
        out[f'diff_{key}'] = d2.astype(np.float32)
        g2 = grad_mag(want[key][0])
        # rank correlation between diff magnitude and local gradient
        from scipy import stats  # scipy is baked in with jax
        sel = d2.reshape(-1)
        corr = stats.spearmanr(sel, g2.reshape(-1)).statistic
        hi = d2 > 0.5 * d2.max()
        tk = topk_coords(d2, 10)
        lines += [f'## {key}',
                  f'- max_abs {d2.max():.5f}, q999 '
                  f'{np.quantile(d2, 0.999):.5f}, pixels >half-max: '
                  f'{int(hi.sum())} / {d2.size}',
                  f'- spearman(diff, |grad|) = {corr:.3f}',
                  f'- top-10 (val, y, x): {tk}', '']
    # SR amplification: upsample raw diff to 512 and compare magnitudes
    raw = out['diff_image_raw']
    up = np.kron(raw, np.ones((8, 8), np.float32))
    img = out['diff_image']
    # local max-pool the upsampled raw diff so sub-pixel shifts don't
    # decorrelate the comparison
    from scipy.ndimage import maximum_filter
    up_mx = maximum_filter(up, size=9)
    gain_at_max = img.max() / max(raw.max(), 1e-9)
    lines += ['## SR amplification',
              f'- diff(image).max / diff(image_raw).max = '
              f'{gain_at_max:.2f}',
              f'- fraction of image-diff>0.01 pixels whose 9x9-dilated '
              f'upsampled raw diff > 0.004: '
              f'{float((up_mx[img > 0.01] > 0.004).mean() if (img > 0.01).any() else 0):.3f}',
              '']
    # silhouette band: depth-diff mask edge (valid = depth in range)
    w_d = want['image_depth'][0, 0]
    valid = (w_d > w_d.min() + 1e-4)
    band = band_mask(valid, 2)
    d_raw = out['diff_image_raw']
    in_band = float(d_raw[band].mean()) if band.any() else 0.0
    off_band = float(d_raw[~band].mean())
    lines += ['## Silhouette band (raw 64x64)',
              f'- mean diff on 2px silhouette band: {in_band:.5f}',
              f'- mean diff off band: {off_band:.5f}',
              f'- ratio: {in_band / max(off_band, 1e-9):.1f}x', '']
    os.makedirs('/root/repo/docs', exist_ok=True)
    np.savez_compressed('/tmp/parity_residual.npz', **out)
    with open('/tmp/PARITY_RESIDUAL.md', 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))
    print('wrote /tmp/PARITY_RESIDUAL.md + /tmp/parity_residual.npz')


if __name__ == '__main__':
    main()
