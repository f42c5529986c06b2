"""Perceptual path length (reference: metrics/perceptual_path_length.py).

Epsilon-perturbed latent pairs -> VGG16 feature distance * (1/eps^2).
The VGG16 LPIPS-style detector loads from NEXT3D_VGG16_PATH (TorchScript,
offline cache — the reference downloads it from the NVIDIA CDN); any
callable uint8 NCHW -> (N, D) features plugs in via MetricOptions.detector.
"""

from __future__ import annotations

import os

import numpy as np

from .metric_utils import MetricOptions, _to_uint8


def _slerp(a, b, t):
    a_n = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b_n = b / np.linalg.norm(b, axis=-1, keepdims=True)
    d = np.sum(a_n * b_n, axis=-1, keepdims=True)
    p = t * np.arccos(np.clip(d, -1, 1))
    c = b_n - d * a_n
    c = c / np.linalg.norm(c, axis=-1, keepdims=True)
    return (a_n * np.cos(p) + c * np.sin(p)) * np.sqrt(
        np.sum(a * a, -1, keepdims=True))


def get_vgg_detector(opts):
    if opts.detector is not None:
        return opts.detector
    path = os.environ.get('NEXT3D_VGG16_PATH')
    if path and os.path.exists(path):
        import torch
        model = torch.jit.load(path).eval()

        def detect(images_uint8):
            with torch.no_grad():
                t = torch.as_tensor(np.ascontiguousarray(images_uint8))
                return model(t, resize_images=False,
                             return_lpips=True).numpy()
        return detect
    raise RuntimeError('set NEXT3D_VGG16_PATH (TorchScript VGG16 pickle) or '
                       'pass MetricOptions.detector for PPL')


def compute_ppl(opts: MetricOptions, num_samples=2000, epsilon=1e-4,
                space='w', sampling='end', crop=False):
    """reference: perceptual_path_length.py (PPLSampler semantics).

    space 'w': lerp in w after mapping; 'z': slerp in z before mapping.
    sampling 'end': t in {0, 1}; 'full': t ~ U(0, 1).
    """
    import jax
    import jax.numpy as jnp

    detector = get_vgg_detector(opts)
    G, params, ds = opts.generator, opts.params, opts.dataset
    rnd = np.random.RandomState(opts.seed)
    bs = opts.batch_size
    dists = []

    def synth(w0, w1, c, v):
        img0 = G.synthesis(params, w0, c, v, noise_mode='const')['image']
        img1 = G.synthesis(params, w1, c, v, noise_mode='const')['image']
        return img0, img1

    if opts.jit:
        synth = jax.jit(synth)

    done = 0
    while done < num_samples:
        idx = rnd.randint(len(ds), size=bs)
        c = np.stack([ds.get_label(i) for i in idx])
        v = np.stack([ds[i][2] for i in idx]) if opts.cond_vert else None
        z0 = rnd.randn(bs, G.z_dim).astype(np.float32)
        z1 = rnd.randn(bs, G.z_dim).astype(np.float32)
        t = (rnd.rand(bs, 1).astype(np.float32) if sampling == 'full'
             else rnd.randint(2, size=(bs, 1)).astype(np.float32))
        if space == 'w':
            w0 = np.asarray(G.mapping(params, jnp.asarray(z0), jnp.asarray(c)))
            w1 = np.asarray(G.mapping(params, jnp.asarray(z1), jnp.asarray(c)))
            wt0 = w0 + (w1 - w0) * t[:, :, None]
            wt1 = w0 + (w1 - w0) * (t + epsilon)[:, :, None]
        else:
            zt0 = _slerp(z0, z1, t)
            zt1 = _slerp(z0, z1, t + epsilon)
            wt0 = np.asarray(G.mapping(params, jnp.asarray(zt0), jnp.asarray(c)))
            wt1 = np.asarray(G.mapping(params, jnp.asarray(zt1), jnp.asarray(c)))
        img0, img1 = synth(jnp.asarray(wt0), jnp.asarray(wt1),
                           jnp.asarray(c), jnp.asarray(v))
        f0 = detector(_to_uint8(img0))
        f1 = detector(_to_uint8(img1))
        d = np.sum(np.square(f0 - f1), axis=-1) / epsilon ** 2
        dists.append(d)
        done += bs

    dist = np.concatenate(dists)[:num_samples]
    # reference filters outliers outside [1%, 99%] quantiles
    lo = np.percentile(dist, 1, method='lower')
    hi = np.percentile(dist, 99, method='higher')
    return float(np.extract(np.logical_and(dist >= lo, dist <= hi),
                            dist).mean())
