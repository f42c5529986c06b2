"""Adaptive discriminator augmentation (ADA) pipeline.

Behavioral spec: training_avatar_texture/augment.py:124-439 — probability-
``p``-gated pixel blitting (x-flip, rot90, integer translation), general
geometric transforms (iso/aniso scale, rotation, fractional translation) as
one composed inverse affine applied with wavelet-filtered resampling, color
matrices (brightness/contrast/lumaflip/hue/saturation), frequency-band
amplification, noise, cutout. The train CLI enables blit+geom+color at
multiplier 1 (train_next3d.py:388).

TPU-first deviation (documented): the reference pads each batch with a
DYNAMICALLY-sized reflect margin before the affine resample
(augment.py:279-294) — a data-dependent shape. Here the resample instead
uses reflection *coordinates* inside the grid sample on the 2x-upsampled
image, which matches everywhere except within a few pixels of the border
(where the reference's filtered reflect-pad and ours differ slightly).
Default training runs with augmentation OFF (aug=noaug), so this only
affects opted-in ADA runs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops import downsample2d, setup_filter, upsample2d

wavelets = {
    'haar': [0.7071067811865476, 0.7071067811865476],
    'sym2': [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    'sym6': [0.015404109327027373, 0.0034907120842174702,
             -0.11799011114819057, -0.048311742585633, 0.4910559419267466,
             0.787641141030194, 0.3379294217276218, -0.07263752278646252,
             -0.021060292512300564, 0.04472490177066578,
             0.0017677118642428036, -0.007800708325034148],
}


def _translate2d(tx, ty):
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack([o, z, tx, z, o, ty, z, z, o], -1).reshape(tx.shape + (3, 3))


def _scale2d(sx, sy):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack([sx, z, z, z, sy, z, z, z, o], -1).reshape(sx.shape + (3, 3))


def _rotate2d(theta):
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack([c, -s, z, s, c, z, z, z, o], -1).reshape(theta.shape + (3, 3))


def _translate3d(t):
    """(B,) -> (B, 4, 4) translating all three color axes by t."""
    B = t.shape[0]
    eye = jnp.tile(jnp.eye(4), (B, 1, 1))
    return eye.at[:, 0, 3].set(t).at[:, 1, 3].set(t).at[:, 2, 3].set(t)


def _scale3d(s):
    B = s.shape[0]
    eye = jnp.tile(jnp.eye(4), (B, 1, 1))
    return eye.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(s)


def _rotate3d_axis(v, theta):
    """(4,) axis, (B,) angle -> (B, 4, 4) rotation around v (reference :97-105)."""
    vx, vy, vz = v[0], v[1], v[2]
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    cc = 1 - c
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    rows = [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, z,
            vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, z,
            vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, z,
            z, z, z, o]
    return jnp.stack(rows, -1).reshape(theta.shape + (4, 4))


def _reflect_coords(x, size):
    """Reflect unnormalized pixel coords into [-0.5, size-0.5] (torch
    grid_sample 'reflection', align_corners=False)."""
    x = x + 0.5
    period = 2 * size
    x = jnp.mod(x, period)
    x = jnp.minimum(x, period - x)
    return x - 0.5


class AugmentPipe:
    """Stateless-functional ADA pipe; ``p`` is passed per call (the reference
    keeps it as a mutated buffer, augment.py:133)."""

    def __init__(self, xflip=0, rotate90=0, xint=0, xint_max=0.125,
                 scale=0, rotate=0, aniso=0, xfrac=0, scale_std=0.2,
                 rotate_max=1, aniso_std=0.2, xfrac_std=0.125,
                 brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
                 brightness_std=0.2, contrast_std=0.5, hue_max=1,
                 saturation_std=1,
                 imgfilter=0, imgfilter_bands=(1, 1, 1, 1), imgfilter_std=1,
                 noise=0, cutout=0, noise_std=0.1, cutout_size=0.5):
        self.xflip, self.rotate90, self.xint = xflip, rotate90, xint
        self.xint_max = xint_max
        self.scale, self.rotate, self.aniso, self.xfrac = scale, rotate, aniso, xfrac
        self.scale_std, self.rotate_max = scale_std, rotate_max
        self.aniso_std, self.xfrac_std = aniso_std, xfrac_std
        self.brightness, self.contrast = brightness, contrast
        self.lumaflip, self.hue, self.saturation = lumaflip, hue, saturation
        self.brightness_std, self.contrast_std = brightness_std, contrast_std
        self.hue_max, self.saturation_std = hue_max, saturation_std
        self.imgfilter = imgfilter
        self.imgfilter_bands = list(imgfilter_bands)
        self.imgfilter_std = imgfilter_std
        self.noise, self.cutout = noise, cutout
        self.noise_std, self.cutout_size = noise_std, cutout_size

        self.Hz_geom = setup_filter(wavelets['sym6'])
        # filter bank for image-space filtering (reference :177-186)
        Hz_lo = np.asarray(wavelets['sym2'])
        Hz_hi = Hz_lo * ((-1) ** np.arange(Hz_lo.size))
        Hz_lo2 = np.convolve(Hz_lo, Hz_lo[::-1]) / 2
        Hz_hi2 = np.convolve(Hz_hi, Hz_hi[::-1]) / 2
        Hz_fbank = np.eye(4, 1)
        for i in range(1, Hz_fbank.shape[0]):
            Hz_fbank = np.dstack([Hz_fbank, np.zeros_like(Hz_fbank)]
                                 ).reshape(Hz_fbank.shape[0], -1)[:, :-1]
            Hz_fbank = scipy.signal.convolve(Hz_fbank, [Hz_lo2])
            lo = (Hz_fbank.shape[1] - Hz_hi2.size) // 2
            Hz_fbank[i, lo:lo + Hz_hi2.size] += Hz_hi2
        self.Hz_fbank = Hz_fbank.astype(np.float32)

    def __call__(self, rng, images, p):
        """images: (B, C, H, W); p: scalar in [0, 1]."""
        B, C, H, W = images.shape
        keys = iter(jax.random.split(rng, 64))

        def gate(key, value, identity, prob, extra_dims=0):
            shape = (B,) + (1,) * extra_dims
            u = jax.random.uniform(key, shape)
            return jnp.where(u < prob * p, value, identity)

        # ---- pixel blitting + geometric: accumulate inverse affine G_inv
        G_inv = jnp.tile(jnp.eye(3), (B, 1, 1))
        if self.xflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 2)
            i = gate(next(keys), i, jnp.zeros_like(i), self.xflip)
            G_inv = G_inv @ _scale2d(1 / (1 - 2 * i), jnp.ones_like(i))
        if self.rotate90 > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B,)) * 4)
            i = gate(next(keys), i, jnp.zeros_like(i), self.rotate90)
            G_inv = G_inv @ _rotate2d(np.pi / 2 * i)
        if self.xint > 0:
            t = (jax.random.uniform(next(keys), (B, 2)) * 2 - 1) * self.xint_max
            t = gate(next(keys), t, jnp.zeros_like(t), self.xint, extra_dims=1)
            G_inv = G_inv @ _translate2d(-jnp.round(t[:, 0] * W),
                                         -jnp.round(t[:, 1] * H))
        if self.scale > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (B,)) * self.scale_std)
            s = gate(next(keys), s, jnp.ones_like(s), self.scale)
            G_inv = G_inv @ _scale2d(1 / s, 1 / s)
        p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (B,)) * 2 - 1) * \
                np.pi * self.rotate_max
            u = jax.random.uniform(next(keys), (B,))
            theta = jnp.where(u < p_rot, theta, 0.0)
            G_inv = G_inv @ _rotate2d(theta)  # rotate2d_inv(-theta)
        if self.aniso > 0:
            s = jnp.exp2(jax.random.normal(next(keys), (B,)) * self.aniso_std)
            s = gate(next(keys), s, jnp.ones_like(s), self.aniso)
            G_inv = G_inv @ _scale2d(1 / s, s)
        if self.rotate > 0:
            theta = (jax.random.uniform(next(keys), (B,)) * 2 - 1) * \
                np.pi * self.rotate_max
            u = jax.random.uniform(next(keys), (B,))
            theta = jnp.where(u < p_rot, theta, 0.0)
            G_inv = G_inv @ _rotate2d(theta)
        if self.xfrac > 0:
            t = jax.random.normal(next(keys), (B, 2)) * self.xfrac_std
            t = gate(next(keys), t, jnp.zeros_like(t), self.xfrac, extra_dims=1)
            G_inv = G_inv @ _translate2d(-t[:, 0] * W, -t[:, 1] * H)

        geom_enabled = any(x > 0 for x in (self.xflip, self.rotate90,
                                           self.xint, self.scale, self.rotate,
                                           self.aniso, self.xfrac))
        if geom_enabled:
            images = self._execute_geom(images, G_inv)

        # ---- color transforms (exact, reference :314-376)
        C4 = jnp.tile(jnp.eye(4), (B, 1, 1))
        v_luma = jnp.asarray([1, 1, 1, 0], jnp.float32) / np.sqrt(3)
        if self.brightness > 0:
            b = jax.random.normal(next(keys), (B,)) * self.brightness_std
            b = gate(next(keys), b, jnp.zeros_like(b), self.brightness)
            C4 = _translate3d(b) @ C4
        if self.contrast > 0:
            c = jnp.exp2(jax.random.normal(next(keys), (B,)) * self.contrast_std)
            c = gate(next(keys), c, jnp.ones_like(c), self.contrast)
            C4 = _scale3d(c) @ C4
        if self.lumaflip > 0:
            i = jnp.floor(jax.random.uniform(next(keys), (B, 1, 1)) * 2)
            i = gate(next(keys), i, jnp.zeros_like(i), self.lumaflip,
                     extra_dims=2)
            vv = jnp.outer(v_luma, v_luma)
            C4 = (jnp.eye(4) - 2 * vv * i) @ C4
        if self.hue > 0 and C > 1:
            theta = (jax.random.uniform(next(keys), (B,)) * 2 - 1) * \
                np.pi * self.hue_max
            theta = gate(next(keys), theta, jnp.zeros_like(theta), self.hue)
            C4 = _rotate3d_axis(v_luma, theta) @ C4
        if self.saturation > 0 and C > 1:
            s = jnp.exp2(jax.random.normal(next(keys), (B, 1, 1)) *
                         self.saturation_std)
            s = gate(next(keys), s, jnp.ones_like(s), self.saturation,
                     extra_dims=2)
            vv = jnp.outer(v_luma, v_luma)
            C4 = (vv + (jnp.eye(4) - vv) * s) @ C4

        color_enabled = any(x > 0 for x in (self.brightness, self.contrast,
                                            self.lumaflip, self.hue,
                                            self.saturation))
        if color_enabled:
            flat = images.reshape(B, C, H * W)
            if C == 3:
                flat = C4[:, :3, :3] @ flat + C4[:, :3, 3:]
            elif C == 6:
                a = C4[:, :3, :3] @ flat[:, :3] + C4[:, :3, 3:]
                b = C4[:, :3, :3] @ flat[:, 3:] + C4[:, :3, 3:]
                flat = jnp.concatenate([a, b], axis=1)
            elif C == 1:
                Cm = jnp.mean(C4[:, :3, :], axis=1, keepdims=True)
                flat = flat * jnp.sum(Cm[:, :, :3], axis=2, keepdims=True) + \
                    Cm[:, :, 3:]
            else:
                raise ValueError('images must have 1, 3 or 6 channels')
            images = flat.reshape(B, C, H, W)

        # ---- image-space filtering (reference :382-410)
        if self.imgfilter > 0:
            num_bands = self.Hz_fbank.shape[0]
            expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13,
                                         jnp.float32)
            g = jnp.ones((B, num_bands))
            for i, band_strength in enumerate(self.imgfilter_bands):
                t_i = jnp.exp2(jax.random.normal(next(keys), (B,)) *
                               self.imgfilter_std)
                u = jax.random.uniform(next(keys), (B,))
                t_i = jnp.where(u < self.imgfilter * p * band_strength,
                                t_i, 1.0)
                t = jnp.ones((B, num_bands)).at[:, i].set(t_i)
                t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t),
                                         axis=-1, keepdims=True))
                g = g * t
            Hz_prime = g @ jnp.asarray(self.Hz_fbank)  # (B, taps)
            taps = Hz_prime.shape[1]
            pad = self.Hz_fbank.shape[1] // 2
            x = jnp.pad(images, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                        mode='reflect')
            # separable per-sample filter via batched einsum gathers
            x = _separable_batch_filter(x, Hz_prime)
            images = x

        # ---- corruptions (reference :417-437)
        if self.noise > 0:
            sigma = jnp.abs(jax.random.normal(next(keys), (B, 1, 1, 1))) * \
                self.noise_std
            sigma = gate(next(keys), sigma, jnp.zeros_like(sigma), self.noise,
                         extra_dims=3)
            images = images + jax.random.normal(next(keys), images.shape) * sigma
        if self.cutout > 0:
            size = jnp.full((B, 2, 1, 1, 1), self.cutout_size)
            size = gate(next(keys), size, jnp.zeros_like(size), self.cutout,
                        extra_dims=4)
            center = jax.random.uniform(next(keys), (B, 2, 1, 1, 1))
            cx = jnp.arange(W).reshape(1, 1, 1, -1)
            cy = jnp.arange(H).reshape(1, 1, -1, 1)
            mask_x = (jnp.abs((cx + 0.5) / W - center[:, 0]) >= size[:, 0] / 2)
            mask_y = (jnp.abs((cy + 0.5) / H - center[:, 1]) >= size[:, 1] / 2)
            images = images * jnp.logical_or(mask_x, mask_y).astype(images.dtype)

        return images

    def _execute_geom(self, images, G_inv):
        """Wavelet up 2x -> affine grid sample (reflection coords) ->
        wavelet down 2x (reference :277-308 modulo the static-shape
        reflect-pad deviation described in the module docstring)."""
        B, C, H, W = images.shape
        up = upsample2d(images, self.Hz_geom, up=2)
        Hu, Wu = up.shape[-2:]

        # adjust G_inv for the 2x grid (reference :298-299)
        s2 = _scale2d(jnp.full((B,), 2.0), jnp.full((B,), 2.0))
        s2i = _scale2d(jnp.full((B,), 0.5), jnp.full((B,), 0.5))
        th = _translate2d(jnp.full((B,), -0.5), jnp.full((B,), -0.5))
        thi = _translate2d(jnp.full((B,), 0.5), jnp.full((B,), 0.5))
        G = th @ (s2 @ G_inv @ s2i) @ thi

        # output pixel centers (2x resolution), centered coords
        ys = jnp.arange(Hu, dtype=jnp.float32) - (Hu - 1) / 2
        xs = jnp.arange(Wu, dtype=jnp.float32) - (Wu - 1) / 2
        gy, gx = jnp.meshgrid(ys, xs, indexing='ij')
        ones = jnp.ones_like(gx)
        pts = jnp.stack([gx, gy, ones], 0).reshape(3, -1)  # (3, Hu*Wu)
        src = jnp.einsum('bij,jm->bim', G, pts)  # (B, 3, Hu*Wu)
        sx = src[:, 0] + (Wu - 1) / 2
        sy = src[:, 1] + (Hu - 1) / 2
        sx = _reflect_coords(sx, Wu)
        sy = _reflect_coords(sy, Hu)

        # bilinear gather (coords already in-range after reflection)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = sx - x0
        wy = sy - y0
        x0 = jnp.clip(x0.astype(jnp.int32), 0, Wu - 1)
        y0 = jnp.clip(y0.astype(jnp.int32), 0, Hu - 1)
        x1 = jnp.minimum(x0 + 1, Wu - 1)
        y1 = jnp.minimum(y0 + 1, Hu - 1)
        feat = up.reshape(B, C, Hu * Wu)

        def g(yi, xi):
            idx = yi * Wu + xi
            return jax.vmap(lambda im, ix: im[:, ix])(feat, idx)
        out = (g(y0, x0) * ((1 - wx) * (1 - wy))[:, None]
               + g(y0, x1) * (wx * (1 - wy))[:, None]
               + g(y1, x0) * ((1 - wx) * wy)[:, None]
               + g(y1, x1) * (wx * wy)[:, None])
        out = out.reshape(B, C, Hu, Wu)
        return downsample2d(out, self.Hz_geom, down=2, flip_filter=True)


def _separable_batch_filter(x, taps_per_sample):
    """Depthwise per-SAMPLE separable filter (reference :399-409)."""
    B, C, H, W = x.shape
    T = taps_per_sample.shape[1]
    xr = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0)))
    # horizontal: gather sliding windows via conv with per-sample weights is
    # awkward in XLA; use vmap of depthwise conv over the batch.
    def one(img, f):  # img (C, H, W), f (T,)
        k = f.reshape(1, 1, 1, T)
        o = jax.lax.conv_general_dilated(
            img[None], jnp.tile(k, (C, 1, 1, 1)), (1, 1), 'VALID',
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C, precision=jax.lax.Precision.HIGHEST)[0]
        k2 = f.reshape(1, 1, T, 1)
        o = jax.lax.conv_general_dilated(
            o[None], jnp.tile(k2, (C, 1, 1, 1)), (1, 1), 'VALID',
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C, precision=jax.lax.Precision.HIGHEST)[0]
        return o
    return jax.vmap(one)(xr, taps_per_sample)


def ada_update_p(p, real_signs_mean, ada_target, nimg_delta, ada_kimg=500,
                 batch_size=32):
    """ADA p controller (reference training_loop.py:391-394): move p toward
    keeping E[sign(D(real))] at ada_target."""
    adjust = np.sign(real_signs_mean - ada_target) * \
        nimg_delta / (ada_kimg * 1000)
    return float(np.clip(p + adjust, 0, 1))
