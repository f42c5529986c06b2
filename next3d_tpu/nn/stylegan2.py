"""StyleGAN2 modules as pure-functional JAX building blocks.

Behavioral spec: training_avatar_texture/networks_stylegan2.py (modulated
conv :34-91, FullyConnectedLayer :96-130, Conv2dLayer :135-188,
MappingNetwork :193-271, SynthesisLayer :276-335, ToRGBLayer :340-360,
SynthesisBlock :492-591, SynthesisNetwork :596-651, Generator :656-682).

Design: each module is a small static-config object with
``init(key) -> params`` and ``__call__(params, ...) -> out``. Parameter trees
use the reference's state_dict names (``weight``, ``bias``, ``affine``,
``fc0``..``fc7``, ``b{res}`` ...) so the released ``.pkl`` checkpoints map
onto our pytrees mechanically (utils/pkl_import.py).

Numerics: mixed precision uses bfloat16 where the reference uses fp16
(per-block ``use_fp16``); a global ``force_fp32`` argument pins everything to
fp32 for checkpoint-parity runs. RNG is explicit: per-layer noise keys are
derived with ``jax.random.fold_in`` from a single synthesis key.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bias_act, conv2d_resample, setup_filter, upsample2d
from ..ops.bias_act import activation_funcs


def normalize_2nd_moment(x, axis=1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def modulated_conv2d(x, weight, styles, noise=None, up=1, down=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True,
                     fused_modconv=True):
    """Weight (de)modulation (reference: networks_stylegan2.py:34-91).

    x: (N, I, H, W); weight: (O, I, kh, kw); styles: (N, I).
    """
    batch_size = x.shape[0]
    out_channels, in_channels, kh, kw = weight.shape

    # Pre-normalize to avoid overflow in reduced precision (reference :54-56
    # does this for fp16; bf16 has fp32's range so it is safe to skip, but we
    # keep it for bit-parity whenever the compute dtype is not f32).
    if x.dtype != jnp.float32 and demodulate:
        w_norm = jnp.max(jnp.abs(weight), axis=(1, 2, 3), keepdims=True)
        weight = weight * (1 / math.sqrt(in_channels * kh * kw) / w_norm)
        styles = styles / jnp.max(jnp.abs(styles), axis=1, keepdims=True)

    w = None
    dcoefs = None
    if demodulate or fused_modconv:
        w = weight[None]  # (1, O, I, kh, kw)
        w = w * styles.reshape(batch_size, 1, -1, 1, 1)
    if demodulate:
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)  # (N, O)
    if demodulate and fused_modconv:
        w = w * dcoefs.reshape(batch_size, -1, 1, 1, 1)

    if not fused_modconv:
        x = x * styles.astype(x.dtype).reshape(batch_size, -1, 1, 1)
        x = conv2d_resample(x, weight.astype(x.dtype), f=resample_filter,
                            up=up, down=down, padding=padding,
                            flip_weight=flip_weight)
        if demodulate and noise is not None:
            x = x * dcoefs.astype(x.dtype).reshape(batch_size, -1, 1, 1) + noise.astype(x.dtype)
        elif demodulate:
            x = x * dcoefs.astype(x.dtype).reshape(batch_size, -1, 1, 1)
        elif noise is not None:
            x = x + noise.astype(x.dtype)
        return x

    # Fused path: batch as conv groups (reference :81-91).
    x = x.reshape(1, -1, *x.shape[2:])
    w = w.reshape(-1, in_channels, kh, kw)
    x = conv2d_resample(x, w.astype(x.dtype), f=resample_filter, up=up,
                        down=down, padding=padding, groups=batch_size,
                        flip_weight=flip_weight)
    x = x.reshape(batch_size, -1, *x.shape[2:])
    if noise is not None:
        x = x + noise
    return x


class FullyConnected:
    """Equalized-lr linear (reference: networks_stylegan2.py:96-130)."""

    def __init__(self, in_features, out_features, bias=True, activation='linear',
                 lr_multiplier=1, bias_init=0, weight_init=1):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.activation = activation
        self.weight_gain = lr_multiplier / math.sqrt(in_features)
        self.bias_gain = lr_multiplier
        self.lr_multiplier = lr_multiplier
        self.bias_init = bias_init  # scalar or per-feature sequence (SG3)
        self.weight_init = weight_init

    def init(self, key):
        import numpy as np
        wkey, _ = jax.random.split(key)
        params = {'weight': jax.random.normal(wkey, (self.out_features, self.in_features),
                                              jnp.float32)
                  * (self.weight_init / self.lr_multiplier)}
        if self.use_bias:
            b = np.broadcast_to(np.asarray(self.bias_init, np.float32),
                                (self.out_features,))
            params['bias'] = jnp.asarray(b / self.lr_multiplier)
        return params

    def __call__(self, params, x):
        w = params['weight'].astype(x.dtype) * self.weight_gain
        b = params.get('bias')
        if b is not None:
            b = b.astype(x.dtype)
            if self.bias_gain != 1:
                b = b * self.bias_gain
        # HIGHEST pins fp32 math for parity; reduced-precision inputs (the
        # perf-mode bf16 decoder) take the native one-pass MXU path
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        x = jnp.matmul(x, w.T, precision=prec)
        return bias_act(x, b, act=self.activation)


class Conv2d:
    """Equalized-lr conv with FIR up/down (reference: networks_stylegan2.py:135-188)."""

    def __init__(self, in_channels, out_channels, kernel_size, bias=True,
                 activation='linear', up=1, down=1,
                 resample_filter=(1, 3, 3, 1), conv_clamp=None, trainable=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.use_bias = bias
        self.activation = activation
        self.up = up
        self.down = down
        self.conv_clamp = conv_clamp
        self.trainable = trainable
        self.resample_filter = setup_filter(resample_filter)
        self.padding = kernel_size // 2
        self.weight_gain = 1 / math.sqrt(in_channels * kernel_size ** 2)
        self.act_gain = activation_funcs[activation].def_gain

    def init(self, key):
        params = {'weight': jax.random.normal(
            key, (self.out_channels, self.in_channels, self.kernel_size,
                  self.kernel_size), jnp.float32)}
        if self.use_bias:
            params['bias'] = jnp.zeros((self.out_channels,), jnp.float32)
        return params

    def __call__(self, params, x, gain=1):
        w = params['weight'] * self.weight_gain
        b = params.get('bias')
        b = b.astype(x.dtype) if b is not None else None
        flip_weight = (self.up == 1)
        x = conv2d_resample(x, w.astype(x.dtype), f=self.resample_filter,
                            up=self.up, down=self.down, padding=self.padding,
                            flip_weight=flip_weight)
        act_gain = self.act_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


class MappingNetwork:
    """z/c -> broadcast w (reference: networks_stylegan2.py:193-271).

    The w_avg EMA buffer lives in the param tree under 'w_avg'; call with
    ``return_w_mean=True`` inside the train step and fold the lerp update in
    there (the reference mutates the buffer in-place at :251-253).
    """

    def __init__(self, z_dim, c_dim, w_dim, num_ws, num_layers=8,
                 embed_features=None, layer_features=None, activation='lrelu',
                 lr_multiplier=0.01, w_avg_beta=0.998):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.num_ws = num_ws
        self.num_layers = num_layers
        self.w_avg_beta = w_avg_beta

        if embed_features is None:
            embed_features = w_dim
        if c_dim == 0:
            embed_features = 0
        if layer_features is None:
            layer_features = w_dim
        self.embed_features = embed_features
        features = [z_dim + embed_features] + [layer_features] * (num_layers - 1) + [w_dim]
        self.embed = FullyConnected(c_dim, embed_features) if c_dim > 0 else None
        self.fcs = [FullyConnected(features[i], features[i + 1], activation=activation,
                                   lr_multiplier=lr_multiplier)
                    for i in range(num_layers)]

    def init(self, key):
        keys = jax.random.split(key, self.num_layers + 1)
        params = {}
        if self.embed is not None:
            params['embed'] = self.embed.init(keys[-1])
        for i, fc in enumerate(self.fcs):
            params[f'fc{i}'] = fc.init(keys[i])
        if self.num_ws is not None and self.w_avg_beta is not None:
            params['w_avg'] = jnp.zeros((self.w_dim,), jnp.float32)
        return params

    def __call__(self, params, z, c, truncation_psi=1, truncation_cutoff=None,
                 return_w_mean=False):
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(self.embed(params['embed'], c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for i, fc in enumerate(self.fcs):
            x = fc(params[f'fc{i}'], x)

        w_mean = jnp.mean(jax.lax.stop_gradient(x), axis=0) if return_w_mean else None

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1:
            w_avg = params['w_avg']
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + truncation_psi * (x - w_avg)
            else:
                head = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)

        if return_w_mean:
            return x, w_mean
        return x


class SynthesisLayer:
    """modconv + noise + bias_act (reference: networks_stylegan2.py:276-335)."""

    def __init__(self, in_channels, out_channels, w_dim, resolution,
                 kernel_size=3, up=1, use_noise=True, activation='lrelu',
                 resample_filter=(1, 3, 3, 1), conv_clamp=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.w_dim = w_dim
        self.resolution = resolution
        self.kernel_size = kernel_size
        self.up = up
        self.use_noise = use_noise
        self.activation = activation
        self.conv_clamp = conv_clamp
        self.resample_filter = setup_filter(resample_filter)
        self.padding = kernel_size // 2
        self.act_gain = activation_funcs[activation].def_gain
        self.affine = FullyConnected(w_dim, in_channels, bias_init=1)

    def init(self, key):
        k_aff, k_w, k_noise = jax.random.split(key, 3)
        params = {
            'affine': self.affine.init(k_aff),
            'weight': jax.random.normal(
                k_w, (self.out_channels, self.in_channels, self.kernel_size,
                      self.kernel_size), jnp.float32),
            'bias': jnp.zeros((self.out_channels,), jnp.float32),
        }
        if self.use_noise:
            params['noise_const'] = jax.random.normal(
                k_noise, (self.resolution, self.resolution), jnp.float32)
            params['noise_strength'] = jnp.zeros((), jnp.float32)
        return params

    def __call__(self, params, x, w, noise_mode='random', rng=None,
                 fused_modconv=True, gain=1):
        assert noise_mode in ('random', 'const', 'none')
        styles = self.affine(params['affine'], w)

        noise = None
        if self.use_noise and noise_mode == 'random':
            assert rng is not None, "noise_mode='random' needs an rng key"
            noise = jax.random.normal(
                rng, (x.shape[0], 1, self.resolution, self.resolution),
                x.dtype) * params['noise_strength'].astype(x.dtype)
        if self.use_noise and noise_mode == 'const':
            noise = (params['noise_const'] * params['noise_strength']).astype(x.dtype)

        flip_weight = (self.up == 1)
        x = modulated_conv2d(x=x, weight=params['weight'], styles=styles,
                             noise=noise, up=self.up, padding=self.padding,
                             resample_filter=self.resample_filter,
                             flip_weight=flip_weight, fused_modconv=fused_modconv)
        act_gain = self.act_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, params['bias'].astype(x.dtype), act=self.activation,
                        gain=act_gain, clamp=act_clamp)


class ToRGBLayer:
    """1x1 non-demodulated modconv (reference: networks_stylegan2.py:340-360)."""

    def __init__(self, in_channels, out_channels, w_dim, kernel_size=1,
                 conv_clamp=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.w_dim = w_dim
        self.kernel_size = kernel_size
        self.conv_clamp = conv_clamp
        self.affine = FullyConnected(w_dim, in_channels, bias_init=1)
        self.weight_gain = 1 / math.sqrt(in_channels * kernel_size ** 2)

    def init(self, key):
        k_aff, k_w = jax.random.split(key)
        return {
            'affine': self.affine.init(k_aff),
            'weight': jax.random.normal(
                k_w, (self.out_channels, self.in_channels, self.kernel_size,
                      self.kernel_size), jnp.float32),
            'bias': jnp.zeros((self.out_channels,), jnp.float32),
        }

    def __call__(self, params, x, w, fused_modconv=True):
        styles = self.affine(params['affine'], w) * self.weight_gain
        x = modulated_conv2d(x=x, weight=params['weight'], styles=styles,
                             demodulate=False, fused_modconv=fused_modconv)
        return bias_act(x, params['bias'].astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock:
    """One resolution block, skip architecture RGB accumulation
    (reference: networks_stylegan2.py:492-591). ``no_up=True`` gives the
    superresolution variant SynthesisBlockNoUp (superresolution.py:158-257).
    """

    def __init__(self, in_channels, out_channels, w_dim, resolution,
                 img_channels, is_last, architecture='skip',
                 resample_filter=(1, 3, 3, 1), conv_clamp=256, use_fp16=False,
                 fused_modconv_default=False, no_up=False, **layer_kwargs):
        # fused_modconv_default=False is the TPU-first choice: the reference's
        # fused path folds batch into conv groups (networks_stylegan2.py:81-88)
        # which (a) defeats GSPMD batch sharding and (b) trades the shared
        # weight for per-sample weights, hurting MXU utilization. The
        # reference itself trains unfused ('inference_only' switch, :554-555);
        # both paths are numerically equivalent in fp32.
        assert architecture in ('orig', 'skip', 'resnet')
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.w_dim = w_dim
        self.resolution = resolution
        self.img_channels = img_channels
        self.is_last = is_last
        self.architecture = architecture
        self.use_fp16 = use_fp16
        self.fused_modconv_default = fused_modconv_default
        self.no_up = no_up
        self.resample_filter = setup_filter(resample_filter)
        self.num_conv = 0
        self.num_torgb = 0

        up = 1 if no_up else 2
        self.conv0 = None
        if in_channels != 0:
            self.conv0 = SynthesisLayer(in_channels, out_channels, w_dim=w_dim,
                                        resolution=resolution, up=up,
                                        resample_filter=resample_filter,
                                        conv_clamp=conv_clamp, **layer_kwargs)
            self.num_conv += 1
        self.conv1 = SynthesisLayer(out_channels, out_channels, w_dim=w_dim,
                                    resolution=resolution, conv_clamp=conv_clamp,
                                    **layer_kwargs)
        self.num_conv += 1
        self.torgb = None
        if is_last or architecture == 'skip':
            self.torgb = ToRGBLayer(out_channels, img_channels, w_dim=w_dim,
                                    conv_clamp=conv_clamp)
            self.num_torgb += 1
        self.skip = None
        if in_channels != 0 and architecture == 'resnet':
            self.skip = Conv2d(in_channels, out_channels, kernel_size=1,
                               bias=False, up=up, resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 5)
        params = {}
        if self.in_channels == 0:
            params['const'] = jax.random.normal(
                keys[0], (self.out_channels, self.resolution, self.resolution),
                jnp.float32)
        if self.conv0 is not None:
            params['conv0'] = self.conv0.init(keys[1])
        params['conv1'] = self.conv1.init(keys[2])
        if self.torgb is not None:
            params['torgb'] = self.torgb.init(keys[3])
        if self.skip is not None:
            params['skip'] = self.skip.init(keys[4])
        return params

    def __call__(self, params, x, img, ws, force_fp32=True, fused_modconv=None,
                 noise_mode='random', rng=None, is_training=False):
        """ws: (N, num_conv + num_torgb, w_dim)."""
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        if fused_modconv is None:
            fused_modconv = self.fused_modconv_default
        if fused_modconv == 'inference_only':
            fused_modconv = not is_training

        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        def layer_rng(i):
            return jax.random.fold_in(rng, i) if rng is not None else None

        if self.in_channels == 0:
            x = params['const'].astype(dtype)
            x = jnp.broadcast_to(x[None], (ws.shape[0],) + x.shape)
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = self.conv1(params['conv1'], x, next_w(), fused_modconv=fused_modconv,
                           noise_mode=noise_mode, rng=layer_rng(1))
        elif self.architecture == 'resnet':
            y = self.skip(params['skip'], x, gain=math.sqrt(0.5))
            x = self.conv0(params['conv0'], x, next_w(), fused_modconv=fused_modconv,
                           noise_mode=noise_mode, rng=layer_rng(0))
            x = self.conv1(params['conv1'], x, next_w(), fused_modconv=fused_modconv,
                           gain=math.sqrt(0.5), noise_mode=noise_mode, rng=layer_rng(1))
            x = y + x
        else:
            x = self.conv0(params['conv0'], x, next_w(), fused_modconv=fused_modconv,
                           noise_mode=noise_mode, rng=layer_rng(0))
            x = self.conv1(params['conv1'], x, next_w(), fused_modconv=fused_modconv,
                           noise_mode=noise_mode, rng=layer_rng(1))

        if img is not None and not self.no_up:
            img = upsample2d(img, self.resample_filter)
        if self.is_last or self.architecture == 'skip':
            y = self.torgb(params['torgb'], x, next_w(), fused_modconv=fused_modconv)
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


def channels_for(res, channel_base, channel_max):
    return min(channel_base // res, channel_max)


class SynthesisNetwork:
    """Progressive const-4x4 -> img_resolution stack
    (reference: networks_stylegan2.py:596-651)."""

    def __init__(self, w_dim, img_resolution, img_channels, channel_base=32768,
                 channel_max=512, num_fp16_res=4, **block_kwargs):
        assert img_resolution >= 4 and (img_resolution & (img_resolution - 1)) == 0
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(np.log2(img_resolution))
        self.img_channels = img_channels
        self.num_fp16_res = num_fp16_res
        self.block_resolutions = [2 ** i for i in range(2, self.img_resolution_log2 + 1)]
        channels_dict = {res: channels_for(res, channel_base, channel_max)
                         for res in self.block_resolutions}
        fp16_resolution = max(2 ** (self.img_resolution_log2 + 1 - num_fp16_res), 8)

        self.blocks = {}
        self.num_ws = 0
        for res in self.block_resolutions:
            in_channels = channels_dict[res // 2] if res > 4 else 0
            out_channels = channels_dict[res]
            use_fp16 = res >= fp16_resolution
            is_last = res == self.img_resolution
            block = SynthesisBlock(in_channels, out_channels, w_dim=w_dim,
                                   resolution=res, img_channels=img_channels,
                                   is_last=is_last, use_fp16=use_fp16,
                                   **block_kwargs)
            self.num_ws += block.num_conv
            if is_last:
                self.num_ws += block.num_torgb
            self.blocks[res] = block

    def init(self, key):
        params = {}
        for i, res in enumerate(self.block_resolutions):
            params[f'b{res}'] = self.blocks[res].init(jax.random.fold_in(key, i))
        return params

    def __call__(self, params, ws, **block_kwargs):
        ws = ws.astype(jnp.float32)
        assert ws.shape[1] == self.num_ws, (ws.shape, self.num_ws)
        rng = block_kwargs.pop('rng', None)
        block_ws = []
        w_idx = 0
        for res in self.block_resolutions:
            block = self.blocks[res]
            block_ws.append(ws[:, w_idx: w_idx + block.num_conv + block.num_torgb])
            w_idx += block.num_conv

        x = img = None
        for i, (res, cur_ws) in enumerate(zip(self.block_resolutions, block_ws)):
            block_rng = jax.random.fold_in(rng, res) if rng is not None else None
            x, img = self.blocks[res](params[f'b{res}'], x, img, cur_ws,
                                      rng=block_rng, **block_kwargs)
        return img


class Generator:
    """mapping + synthesis, with the Next3D ``mapping_ws`` override that lets
    one mapping net emit ws for two backbones
    (reference: networks_stylegan2.py:656-682; used at triplane_next3d.py:65).
    """

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 mapping_ws=-1, mapping_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.synthesis = SynthesisNetwork(w_dim=w_dim, img_resolution=img_resolution,
                                          img_channels=img_channels,
                                          **synthesis_kwargs)
        self.num_ws = self.synthesis.num_ws
        if mapping_ws == -1:
            mapping_ws = self.num_ws
        self.mapping_ws = mapping_ws
        self.mapping = MappingNetwork(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                                      num_ws=mapping_ws, **(mapping_kwargs or {}))

    def init(self, key):
        k_map, k_syn = jax.random.split(key)
        return {'mapping': self.mapping.init(k_map),
                'synthesis': self.synthesis.init(k_syn)}

    def __call__(self, params, z, c, truncation_psi=1, truncation_cutoff=None,
                 **synthesis_kwargs):
        ws = self.mapping(params['mapping'], z, c, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params['synthesis'], ws, **synthesis_kwargs)
