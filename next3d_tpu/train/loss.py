"""Non-saturating GAN loss with R1 + density regularization.

Behavioral spec: training_avatar_texture/loss.py:28-310 —
  Gmain  softplus(-D(G(z,c,v)))                                    (:137-146)
  Greg   L1 density regularization over perturbed coords            (:149-170)
  Dmain  softplus(D(G)) + softplus(-D(real))                        (:262-288)
  Dreg   R1 on image AND image_raw (dual discrimination)            (:290-308)
plus conditioning-swap regularization (:58-63), discriminator-input blur
fade (:74-79,114-132), and neural-rendering-resolution annealing (:120-124).

JAX-isms: phases are pure functions of (params_G, params_D, batch, rng,
schedule scalars); R1's double backward is jax.grad composed through
jax.grad — no gradfix machinery (SURVEY section 7.1). The blur filter uses a
STATIC tap count derived from blur_init_sigma with dynamically-masked taps so
the fading sigma stays jit-compatible.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.discriminator import filtered_resizing
from ..ops import filter2d, setup_filter
from ..ops.interpolate import interpolate_bilinear


@dataclass
class LossConfig:
    r1_gamma: float = 4.0
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    gpc_reg_prob: Optional[float] = 0.5
    gpc_reg_fade_kimg: float = 1000.0
    neural_rendering_resolution_initial: int = 64
    neural_rendering_resolution_final: Optional[int] = None
    neural_rendering_resolution_fade_kimg: float = 0.0
    dual_discrimination: bool = True
    filter_mode: str = 'antialiased'
    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004
    reg_type: str = 'l1'
    box_warp: float = 1.0
    style_mixing_prob: float = 0.0
    num_frames: int = 1  # video clips per item (reference loss.py:88-108)
    # rematerialize G.synthesis in the phase backwards (jax.checkpoint):
    # trades ~1 extra forward for the synthesis activation residuals —
    # REQUIRED to fit 512^2 training on a 16 GB v5e chip (the reference
    # assumes 40 GB A100s); turn off on high-memory parts
    remat_synthesis: bool = True


def gaussian_blur_dynamic(img, blur_sigma, max_size):
    """filter2d with the reference's f = exp2(-(x/sigma)^2) taps
    (loss.py:74-79), static tap count ``2*max_size+1``; taps outside
    floor(3*sigma) are masked to reproduce the dynamic window."""
    if max_size <= 0:
        return img
    x = jnp.arange(-max_size, max_size + 1, dtype=jnp.float32)
    blur_size = jnp.floor(blur_sigma * 3)
    f = jnp.exp2(-jnp.square(x / jnp.maximum(blur_sigma, 1e-8)))
    f = jnp.where(jnp.abs(x) <= blur_size, f, 0.0)
    f = f / jnp.sum(f)
    # separable 1-D filter; shape-preserving padding like filter2d
    pad = max_size
    orig_shape = img.shape
    x4 = img.reshape(-1, 1, *img.shape[-2:])
    x4 = jax.lax.conv_general_dilated(
        x4, f[None, :][None, None],
        window_strides=(1, 1), padding=((0, 0), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    x4 = jax.lax.conv_general_dilated(
        x4, f[:, None][None, None],
        window_strides=(1, 1), padding=((pad, pad), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return x4.reshape(orig_shape)


class StyleGAN2Loss:
    """Phase losses. G and D are the module objects; params are pytrees.

    ``augment_pipe`` (optional AugmentPipe) is applied inside run_D exactly
    like the reference (loss.py:81-86): image and bilinearly-upsampled
    image_raw are concatenated so both receive the SAME augmentation draw,
    then raw is resized back down. The augmentation probability ``p`` rides
    the sched dict as the traced scalar ``aug_p`` so ADA adaptation never
    recompiles."""

    def __init__(self, G, D, cfg: LossConfig, augment_pipe=None):
        self.G = G
        self.D = D
        self.cfg = cfg
        self.augment_pipe = augment_pipe
        self.resample_filter = setup_filter([1, 3, 3, 1])
        self.blur_max_size = int(np.floor(cfg.blur_init_sigma * 3))

    def flatten_clips(self, batch, real_img=None):
        """Video training: (B, T, ...) clips -> (B*T, ...) with gen_z
        repeat-interleaved per frame (reference loss.py:102-108). D then sees
        frames of a clip as extra channels via run_D's reshape. Called at the
        top of every jitted phase (train_step.py) so the host feeds clip-
        shaped batches untouched; a no-op when num_frames == 1."""
        T = self.cfg.num_frames
        if T <= 1:
            return batch, real_img
        out = dict(batch)
        out['gen_z'] = jnp.repeat(batch['gen_z'], T, axis=0)
        for k in ('gen_c', 'gen_v', 'real_c'):
            v = batch[k]
            out[k] = v.reshape((-1,) + v.shape[2:])
        if real_img is not None:
            real_img = real_img.reshape((-1,) + real_img.shape[2:])
        return out, real_img

    # ------------------------------------------------------------ schedules
    def schedules(self, cur_nimg):
        """Host-side schedule scalars for a given cur_nimg (python int).

        ``swapping_prob`` uses -1.0 as the 'disabled' sentinel (the reference
        then feeds ZERO conditioning, loss.py:62-63); it stays a traced
        scalar so nimg-dependent fades never trigger recompiles.
        ``neural_rendering_resolution`` is a python int (static: it sets
        shapes)."""
        cfg = self.cfg
        blur_sigma = max(1 - cur_nimg / (cfg.blur_fade_kimg * 1e3), 0) * \
            cfg.blur_init_sigma if cfg.blur_fade_kimg > 0 else 0.0
        alpha = min(cur_nimg / (cfg.gpc_reg_fade_kimg * 1e3), 1) \
            if cfg.gpc_reg_fade_kimg > 0 else 1.0
        swapping_prob = (1 - alpha) + alpha * cfg.gpc_reg_prob \
            if cfg.gpc_reg_prob is not None else None
        if cfg.neural_rendering_resolution_final is not None:
            a = min(cur_nimg / (cfg.neural_rendering_resolution_fade_kimg * 1e3), 1)
            nrr = int(np.rint(cfg.neural_rendering_resolution_initial * (1 - a)
                              + cfg.neural_rendering_resolution_final * a))
        else:
            nrr = cfg.neural_rendering_resolution_initial
        return (dict(blur_sigma=float(blur_sigma),
                     swapping_prob=-1.0 if swapping_prob is None
                     else float(swapping_prob),
                     aug_p=0.0), int(nrr))

    # --------------------------------------------------------------- helpers
    def _swap_conditioning(self, rng, c, swapping_prob, per_sample=True):
        """Roll-1 conditioning swap (reference :58-63); swapping_prob < 0
        (disabled) feeds zero conditioning instead."""
        c_swapped = jnp.roll(c, 1, axis=0)
        if per_sample:
            u = jax.random.uniform(rng, (c.shape[0], 1))
        else:
            u = jax.random.uniform(rng, ())
        swapped = jnp.where(u < swapping_prob, c_swapped, c)
        return jnp.where(swapping_prob < 0, jnp.zeros_like(c), swapped)

    def _style_mixing(self, params_G, ws, z, c, rng):
        """ws[:, cutoff:] replaced by a fresh mapping draw with probability
        style_mixing_prob (reference loss.py:64-70; the fresh z is randn,
        the conditioning is the RAW c — not the swapped one)."""
        k_cut, k_gate, k_z2 = jax.random.split(rng, 3)
        num_ws = ws.shape[1]
        cutoff = jax.random.randint(k_cut, (), 1, num_ws)
        cutoff = jnp.where(
            jax.random.uniform(k_gate, ()) < self.cfg.style_mixing_prob,
            cutoff, num_ws)
        z2 = jax.random.normal(k_z2, z.shape, jnp.float32)
        ws2 = self.G.mapping(params_G, z2, c)
        sel = jnp.arange(num_ws)[None, :, None] >= cutoff
        return jnp.where(sel, ws2, ws)

    def run_G(self, params_G, z, c, v, rng, swapping_prob, nrr):
        # nrr must be a python int (static)
        k_swap, k_mix, k_syn = jax.random.split(rng, 3)
        c_cond = self._swap_conditioning(k_swap, c, swapping_prob)
        ws, w_mean = self.G.mapping(params_G, z, c_cond, return_w_mean=True)
        if self.cfg.style_mixing_prob > 0:
            ws = self._style_mixing(params_G, ws, z, c, k_mix)

        def synth(params_G, ws, c, v, k_syn):
            return self.G.synthesis(params_G, ws, c, v,
                                    neural_rendering_resolution=nrr,
                                    noise_mode='random', rng=k_syn)

        if self.cfg.remat_synthesis:
            synth = jax.checkpoint(synth)
        out = synth(params_G, ws, c, v, k_syn)
        return out, ws, w_mean

    def run_D(self, params_D, img, c, rng, sched):
        blur_sigma = sched['blur_sigma']
        image = img['image']
        if self.blur_max_size > 0:
            image = jax.lax.cond(
                blur_sigma > 0,
                lambda x: gaussian_blur_dynamic(x, blur_sigma,
                                                self.blur_max_size),
                lambda x: x, image)
        raw = img['image_raw']
        if self.augment_pipe is not None:
            # one augmentation draw applied to image + upsampled raw
            # (reference loss.py:81-86)
            rng, k_aug = jax.random.split(rng)
            C = image.shape[1]
            up = interpolate_bilinear(raw, image.shape[-1], antialias=True)
            pair = self.augment_pipe(k_aug, jnp.concatenate([image, up], 1),
                                     sched['aug_p'])
            image = pair[:, :C]
            raw = interpolate_bilinear(pair[:, C:], raw.shape[-1],
                                       antialias=True)
        img = {'image': image, 'image_raw': raw}
        T = self.cfg.num_frames
        if T > 1:
            # fold clip frames into channels (reference loss.py:88-94)
            img = {k: v.reshape(-1, T * v.shape[1], *v.shape[2:])
                   for k, v in img.items()}
            c = c.reshape(-1, T * c.shape[-1])
        return self.D(params_D, img, c, rng=rng, force_fp32=True)

    def prepare_real(self, real_img, blur_sigma, nrr):
        """Antialiased raw-branch target + optional blur (reference :126-134)."""
        raw = filtered_resizing(real_img, size=nrr, f=self.resample_filter,
                                filter_mode=self.cfg.filter_mode)
        if self.blur_max_size > 0:
            raw = jax.lax.cond(
                blur_sigma > 0,
                lambda x: gaussian_blur_dynamic(x, blur_sigma,
                                                self.blur_max_size),
                lambda x: x, raw)
        return {'image': real_img, 'image_raw': raw}

    # ---------------------------------------------------------------- phases
    def gmain_loss(self, params_G, params_D, batch, rng, sched, nrr):
        k_g, k_d = jax.random.split(rng)
        gen_img, _ws, w_mean = self.run_G(params_G, batch['gen_z'],
                                          batch['gen_c'], batch['gen_v'], k_g,
                                          sched['swapping_prob'], nrr)
        gen_logits = self.run_D(params_D, gen_img, batch['gen_c'], k_d,
                                sched)
        loss = jnp.mean(jax.nn.softplus(-gen_logits))
        stats = {'Loss/scores/fake': jnp.mean(gen_logits),
                 'Loss/signs/fake': jnp.mean(jnp.sign(gen_logits)),
                 'Loss/G/loss': loss}
        return loss, (stats, w_mean)

    def _mapped_ws(self, params_G, batch, rng, sched):
        """Fresh mapping with a batch-wide swap draw (reference :150-156).

        NOTE: the reference's Greg style-mixing branches reference undefined
        ``z``/``c`` (loss.py:161 — latent bug, unreachable at the default
        style_mixing_prob=0); mixing is therefore deliberately not applied
        in Greg here."""
        k_swap = rng
        c_cond = self._swap_conditioning(k_swap, batch['gen_c'],
                                         sched['swapping_prob'],
                                         per_sample=False)
        return self.G.mapping(params_G, batch['gen_z'], c_cond)

    def _sigma_pair(self, params_G, ws, gen_v, initial, perturbed, rng):
        all_coords = jnp.concatenate([initial, perturbed], axis=1)
        dirs = jax.random.normal(jax.random.fold_in(rng, 1), all_coords.shape)
        sigma = self.G.sample_mixed(params_G, all_coords, dirs, ws, gen_v,
                                    noise_mode='random', rng=rng)['sigma']
        half = sigma.shape[1] // 2
        return sigma[:, :half], sigma[:, half:]

    def greg_loss(self, params_G, batch, rng, sched):
        """Density regularization (reference :149-258).

        reg_type:
          'l1'                — L1(sigma, sigma at randn-perturbed coords)
                                (reference :149-170, the released config)
          'monotonic-detach'  — relu(stop_grad(sigma_front) - sigma_behind)
                                + a second L1 pass at (1/256)*box_warp noise
                                (reference :173-214)
          'monotonic-fixed'   — same without the stop_gradient (:216-258)
        The reference runs the monotonic and L1 parts as two separate
        backward passes; summing the losses yields identical gradients.
        (Its 'monotonic-detach' second pass also drops gen_v —
        loss.py:209, a latent TypeError; gen_v is passed here.)"""
        cfg = self.cfg
        k_swap, k_c, k_p, k_syn = jax.random.split(rng, 4)
        ws = self._mapped_ws(params_G, batch, k_swap, sched)

        if cfg.reg_type == 'l1':
            initial = jax.random.uniform(k_c, (ws.shape[0], 1000, 3)) * 2 - 1
            perturbed = initial + jax.random.normal(k_p, initial.shape) * \
                cfg.density_reg_p_dist
            s0, s1 = self._sigma_pair(params_G, ws, batch['gen_v'], initial,
                                      perturbed, k_syn)
            loss = jnp.mean(jnp.abs(s0 - s1)) * cfg.density_reg
            return loss, ({'Loss/G/reg': loss},)

        assert cfg.reg_type in ('monotonic-detach', 'monotonic-fixed'), \
            cfg.reg_type
        # part 1: density must not increase moving behind the surface
        initial = jax.random.uniform(k_c, (ws.shape[0], 2000, 3)) * 2 - 1
        behind = initial + jnp.asarray([0., 0., -1.]) * \
            (1 / 256) * cfg.box_warp
        s_front, s_behind = self._sigma_pair(params_G, ws, batch['gen_v'],
                                             initial, behind, k_syn)
        if cfg.reg_type == 'monotonic-detach':
            s_front = jax.lax.stop_gradient(s_front)
        monotonic = jnp.mean(jax.nn.relu(s_front - s_behind)) * 10

        # part 2: L1 smoothness at (1/256)*box_warp noise, fresh draws
        k_swap2, k_c2, k_p2, k_syn2 = jax.random.split(
            jax.random.fold_in(rng, 2), 4)
        ws2 = self._mapped_ws(params_G, batch, k_swap2, sched)
        initial2 = jax.random.uniform(k_c2, (ws.shape[0], 1000, 3)) * 2 - 1
        perturbed2 = initial2 + jax.random.normal(k_p2, initial2.shape) * \
            (1 / 256) * cfg.box_warp
        s0, s1 = self._sigma_pair(params_G, ws2, batch['gen_v'], initial2,
                                  perturbed2, k_syn2)
        tv = jnp.mean(jnp.abs(s0 - s1)) * cfg.density_reg
        loss = monotonic + tv
        return loss, ({'Loss/G/reg': loss},)

    def dmain_loss(self, params_D, params_G, batch, real_img, rng, sched, nrr):
        k_g, k_dg, k_dr = jax.random.split(rng, 3)
        gen_img, _ws, w_mean = self.run_G(params_G, batch['gen_z'],
                                          batch['gen_c'], batch['gen_v'], k_g,
                                          sched['swapping_prob'], nrr)
        gen_img = jax.tree.map(jax.lax.stop_gradient, gen_img)
        gen_logits = self.run_D(params_D, gen_img, batch['gen_c'], k_dg,
                                sched)
        loss_dgen = jnp.mean(jax.nn.softplus(gen_logits))
        real_logits = self.run_D(params_D, real_img, batch['real_c'], k_dr,
                                 sched)
        loss_dreal = jnp.mean(jax.nn.softplus(-real_logits))
        stats = {'Loss/scores/fake': jnp.mean(gen_logits),
                 'Loss/signs/fake': jnp.mean(jnp.sign(gen_logits)),
                 'Loss/scores/real': jnp.mean(real_logits),
                 'Loss/signs/real': jnp.mean(jnp.sign(real_logits)),
                 'Loss/D/loss': loss_dgen + loss_dreal}
        return loss_dgen + loss_dreal, (stats, w_mean)

    def dreg_loss(self, params_D, batch, real_img, rng, sched):
        """R1 on image (+ image_raw when dual) via nested jax.grad
        (reference :290-308)."""
        def real_logit_sum(image, image_raw):
            logits = self.run_D(params_D,
                                {'image': image, 'image_raw': image_raw},
                                batch['real_c'], rng, sched)
            return jnp.sum(logits)

        if self.cfg.dual_discrimination:
            g_img, g_raw = jax.grad(real_logit_sum, argnums=(0, 1))(
                real_img['image'], real_img['image_raw'])
            r1_penalty = jnp.sum(jnp.square(g_img), axis=(1, 2, 3)) + \
                jnp.sum(jnp.square(g_raw), axis=(1, 2, 3))
        else:
            g_img = jax.grad(real_logit_sum, argnums=0)(
                real_img['image'], real_img['image_raw'])
            r1_penalty = jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
        loss = jnp.mean(r1_penalty) * (self.cfg.r1_gamma / 2)
        return loss, ({'Loss/r1_penalty': jnp.mean(r1_penalty),
                       'Loss/D/reg': loss},)
