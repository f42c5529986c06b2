"""Bisect the full-scale parity residual: planes vs volume renderer.

tools/parity_residual.py localized the residual to the frame-border ring
of the 64x64 raw output. Border rays are exactly the rays whose plane
projections reach the tri-plane edges, so the residual source is either
(a) the blended planes themselves differing near their borders (conv /
resample boundary handling upstream), or (b) the volume renderer
diverging on low-density rays. This tool captures the blended planes and
the renderer's raw 32-ch feature output from BOTH implementations and
diffs them with border/interior structure.

Run:  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/repo/tests \
          python tools/parity_planes.py
"""

import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')

import numpy as np

from full_scale_parity import run_pair  # noqa: E402


def ring_stats(d2, width):
    """d2 (H, W): max/mean on the `width`-px border ring vs interior."""
    ring = np.zeros_like(d2, bool)
    ring[:width] = ring[-width:] = True
    ring[:, :width] = ring[:, -width:] = True
    return (float(d2[ring].max()), float(d2[ring].mean()),
            float(d2[~ring].max()), float(d2[~ring].mean()))


def main():
    cap = {}
    run_pair(capture=cap)
    lines = ['# Parity bisect: planes vs renderer', '']

    pr, pj = cap['planes_ref'], cap['planes_jax']
    pr = pr.reshape(pj.shape)
    d = np.abs(pj - pr)[0]               # (3, 32, 256, 256)
    lines += ['## Blended planes (3 x 32 x 256^2)']
    for p in range(3):
        d2 = d[p].max(axis=0)
        rmax, rmean, imax, imean = ring_stats(d2, 4)
        am = np.unravel_index(np.argmax(d2), d2.shape)
        lines += [f'- plane {p}: max {d2.max():.6f} at (y,x)={am}; '
                  f'4px-ring max/mean {rmax:.6f}/{rmean:.6f}; '
                  f'interior max/mean {imax:.6f}/{imean:.6f}']
    lines += ['']

    fr, fj = cap['raw_feat_ref'], cap['raw_feat_jax']
    fr = fr.reshape(fj.shape)            # (N, M, 32)
    M = fj.shape[1]
    H = int(round(M ** 0.5))
    d2 = np.abs(fj - fr)[0].max(axis=-1).reshape(H, H)
    rmax, rmean, imax, imean = ring_stats(d2, 2)
    lines += ['## Renderer 32-ch feature output (pre-SR, 64^2)',
              f'- max {d2.max():.6f}; 2px-ring max/mean '
              f'{rmax:.6f}/{rmean:.6f}; interior max/mean '
              f'{imax:.6f}/{imean:.6f}', '']

    verdict = ('planes differ near borders -> upstream (conv/resample '
               'boundary or rasterizer edge)'
               if ring_stats(d.max(axis=(0, 1)), 4)[0] > 10 * max(
                   ring_stats(d.max(axis=(0, 1)), 4)[3], 1e-7)
               else 'planes match -> residual originates in the volume '
                    'renderer on low-density rays')
    lines += [f'**Bisect verdict:** {verdict}', '']
    np.savez_compressed('/tmp/parity_planes.npz',
                        plane_diff=d.max(axis=1).astype(np.float32),
                        feat_diff=d2.astype(np.float32))
    with open('/tmp/PARITY_BISECT.md', 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
