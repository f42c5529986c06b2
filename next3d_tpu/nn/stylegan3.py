"""StyleGAN3 alias-free synthesis networks (TPU-native).

Behavioral spec: training_avatar_texture/networks_stylegan3.py:27-517 —
Fourier-feature input (:171-247), filtered-lrelu synthesis layers with
Kaiser/jinc low-pass filter design (:255-397), geometric cutoff/sampling-
rate layer schedule (:402-489), generator wrapper (:494-517). Reachable in
the reference only through the alias-free superresolution variants
(superresolution.py:22 imports SynthesisLayer) and standalone SG3 configs;
implemented here for full surface parity + the equivariance metrics.

TPU-first notes: everything is a pure function of (params, inputs); the
filter design runs host-side at construction (numpy/scipy) and ships as
static constants; filtered_lrelu is the XLA composition (ops/
filtered_lrelu.py) — up-FIR and down-FIR lower to lhs-dilated convs that
XLA fuses with the elementwise middle. magnitude_ema is carried as a
non-trainable param leaf; `update_emas` is intentionally not supported
inside the jitted forward — callers thread EMA updates functionally (the
same discipline as MappingNetwork's w_avg, stylegan2.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filtered_lrelu import filtered_lrelu
from ..ops.upfirdn2d import setup_filter
from .stylegan2 import FullyConnected


def design_lowpass_filter(numtaps, cutoff, width, fs, radial=False):
    """Kaiser (separable) or jinc (radial) low-pass filter taps
    (reference :365-387). Returns None for the identity filter."""
    assert numtaps >= 1
    if numtaps == 1:
        return None
    import scipy.signal
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width,
                                fs=fs)
        return np.asarray(f, np.float32)
    import scipy.special
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide='ignore', invalid='ignore'):
        f = scipy.special.j1(2 * cutoff * (np.pi * r)) / (np.pi * r)
    # center-tap guard (r == 0 only for odd numtaps; the reference always
    # hits even taps): lim_{r->0} j1(2c*pi*r)/(pi*r) = c
    f[r == 0] = cutoff
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2)))
    w = np.kaiser(numtaps, beta)
    f *= np.outer(w, w)
    f /= np.sum(f)
    return np.asarray(f, np.float32)


def modulated_conv2d_sg3(x, weight, styles, padding=0, demodulate=True,
                         input_gain=None):
    """SG3 modulated conv (reference :27-66): pre-normalizes weight and
    styles to unit variance when demodulating, folds the magnitude-ema
    input gain into the weights, grouped-conv fused execution."""
    batch = x.shape[0]
    out_channels, in_channels, kh, kw = weight.shape
    if demodulate:
        weight = weight * jax.lax.rsqrt(
            jnp.mean(jnp.square(weight), axis=(1, 2, 3), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))
    w = weight[None] * styles[:, None, :, None, None]  # (N, O, I, kh, kw)
    if demodulate:
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)
        w = w * dcoefs[:, :, None, None, None]
    if input_gain is not None:
        gain = jnp.broadcast_to(jnp.asarray(input_gain).reshape(-1),
                                (in_channels,)) if np.ndim(input_gain) <= 1 \
            else input_gain
        w = w * jnp.asarray(gain).reshape(1, 1, -1, 1, 1)
    xr = x.reshape(1, -1, *x.shape[2:])
    wr = w.reshape(-1, in_channels, kh, kw).astype(x.dtype)
    p = padding if isinstance(padding, (list, tuple)) else (padding, padding)
    y = jax.lax.conv_general_dilated(
        xr, wr, window_strides=(1, 1),
        padding=[(p[0], p[0]), (p[1], p[1])],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        feature_group_count=batch,
        precision=jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
        else None)
    return y.reshape(batch, -1, *y.shape[2:])


class SG3MappingNetwork:
    """z/c -> broadcast ws (reference :113-166): 2 layers, lr_mult 0.01,
    RMS-normalized z and label embed, w_avg truncation."""

    def __init__(self, z_dim, c_dim, w_dim, num_ws, num_layers=2,
                 lr_multiplier=0.01, w_avg_beta=0.998):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.num_ws = num_ws
        self.num_layers = num_layers
        self.w_avg_beta = w_avg_beta
        self.embed = FullyConnected(c_dim, w_dim) if c_dim > 0 else None
        feats = [z_dim + (w_dim if c_dim > 0 else 0)] + [w_dim] * num_layers
        self.fcs = [FullyConnected(fi, fo, activation='lrelu',
                                   lr_multiplier=lr_multiplier)
                    for fi, fo in zip(feats[:-1], feats[1:])]

    def init(self, key):
        keys = jax.random.split(key, len(self.fcs) + 1)
        params = {f'fc{i}': fc.init(k)
                  for i, (fc, k) in enumerate(zip(self.fcs, keys))}
        if self.embed is not None:
            params['embed'] = self.embed.init(keys[-1])
        params['w_avg'] = jnp.zeros((self.w_dim,), jnp.float32)
        return params

    def __call__(self, params, z, c=None, truncation_psi=1,
                 truncation_cutoff=None, return_w_mean=False):
        x = z.astype(jnp.float32)
        x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1,
                                       keepdims=True) + 1e-8)
        if self.c_dim > 0:
            y = self.embed(params['embed'], c.astype(jnp.float32))
            y = y * jax.lax.rsqrt(jnp.mean(jnp.square(y), axis=1,
                                           keepdims=True) + 1e-8)
            x = jnp.concatenate([x, y], axis=1)
        for i, fc in enumerate(self.fcs):
            x = fc(params[f'fc{i}'], x)
        w_mean = jnp.mean(jax.lax.stop_gradient(x), axis=0)
        ws = jnp.broadcast_to(x[:, None], (x.shape[0], self.num_ws,
                                           self.w_dim))
        if truncation_psi != 1:
            cutoff = self.num_ws if truncation_cutoff is None \
                else truncation_cutoff
            trunc = params['w_avg'] + truncation_psi * \
                (ws[:, :cutoff] - params['w_avg'])
            ws = jnp.concatenate([trunc, ws[:, cutoff:]], axis=1)
        return (ws, w_mean) if return_w_mean else ws


class SynthesisInput:
    """Transformed Fourier features (reference :171-247)."""

    def __init__(self, w_dim, channels, size, sampling_rate, bandwidth):
        self.w_dim = w_dim
        self.channels = channels
        self.size = np.broadcast_to(np.asarray(size), (2,))
        self.sampling_rate = sampling_rate
        self.bandwidth = bandwidth
        self.affine = FullyConnected(w_dim, 4, weight_init=0,
                                     bias_init=[1, 0, 0, 0])

    def init(self, key):
        kf, kp, kw, ka = jax.random.split(key, 4)
        freqs = jax.random.normal(kf, (self.channels, 2), jnp.float32)
        radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
        freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
        freqs = freqs * self.bandwidth
        phases = jax.random.uniform(kp, (self.channels,), jnp.float32) - 0.5
        return {
            'weight': jax.random.normal(kw, (self.channels, self.channels),
                                        jnp.float32),
            'affine': self.affine.init(ka),
            'transform': jnp.eye(3, dtype=jnp.float32),
            'freqs': freqs,
            'phases': phases,
        }

    def __call__(self, params, w):
        N = w.shape[0]
        freqs = jnp.broadcast_to(params['freqs'][None],
                                 (N,) + params['freqs'].shape)
        phases = jnp.broadcast_to(params['phases'][None],
                                  (N,) + params['phases'].shape)
        t = self.affine(params['affine'], w)  # (N, 4) = (r_c, r_s, t_x, t_y)
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)
        zeros = jnp.zeros((N,), t.dtype)
        ones = jnp.ones((N,), t.dtype)
        m_r = jnp.stack([t[:, 0], -t[:, 1], zeros,
                         t[:, 1], t[:, 0], zeros,
                         zeros, zeros, ones], axis=1).reshape(N, 3, 3)
        m_t = jnp.stack([ones, zeros, -t[:, 2],
                         zeros, ones, -t[:, 3],
                         zeros, zeros, ones], axis=1).reshape(N, 3, 3)
        transforms = m_r @ m_t @ jnp.broadcast_to(params['transform'][None],
                                                  (N, 3, 3))
        phases = phases + (freqs @ transforms[:, :2, 2:])[..., 0]
        freqs = freqs @ transforms[:, :2, :2]
        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - self.bandwidth)
            / (self.sampling_rate / 2 - self.bandwidth), 0, 1)

        # sampling grid == torch affine_grid(align_corners=False) with a
        # diagonal theta of 0.5*size/sampling_rate
        W, H = int(self.size[0]), int(self.size[1])
        sx = 0.5 * W / self.sampling_rate
        sy = 0.5 * H / self.sampling_rate
        gx = ((2 * jnp.arange(W, dtype=jnp.float32) + 1) / W - 1) * sx
        gy = ((2 * jnp.arange(H, dtype=jnp.float32) + 1) / H - 1) * sy
        grid = jnp.stack(jnp.meshgrid(gx, gy, indexing='xy'), axis=-1)

        # Fourier features: (H, W, 2) x (N, 2, C) -> (N, H, W, C)
        x = jnp.einsum('hwd,ndc->nhwc', grid, freqs.transpose(0, 2, 1),
                       precision=jax.lax.Precision.HIGHEST)
        x = x + phases[:, None, None, :]
        x = jnp.sin(x * (2 * math.pi))
        x = x * amplitudes[:, None, None, :]
        weight = params['weight'] / math.sqrt(self.channels)
        x = jnp.einsum('nhwc,dc->nhwd', x, weight,
                       precision=jax.lax.Precision.HIGHEST)
        return x.transpose(0, 3, 1, 2)


class SG3SynthesisLayer:
    """Alias-free layer: affine -> modconv -> filtered lrelu
    (reference :255-364)."""

    def __init__(self, w_dim, is_torgb, is_critically_sampled, use_fp16,
                 in_channels, out_channels, in_size, out_size,
                 in_sampling_rate, out_sampling_rate, in_cutoff, out_cutoff,
                 in_half_width, out_half_width, conv_kernel=3, filter_size=6,
                 lrelu_upsampling=2, use_radial_filters=False, conv_clamp=256,
                 magnitude_ema_beta=0.999):
        self.w_dim = w_dim
        self.is_torgb = is_torgb
        self.is_critically_sampled = is_critically_sampled
        self.use_fp16 = use_fp16
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.in_size = np.broadcast_to(np.asarray(in_size), (2,))
        self.out_size = np.broadcast_to(np.asarray(out_size), (2,))
        self.in_sampling_rate = in_sampling_rate
        self.out_sampling_rate = out_sampling_rate
        self.tmp_sampling_rate = max(in_sampling_rate, out_sampling_rate) \
            * (1 if is_torgb else lrelu_upsampling)
        self.conv_kernel = 1 if is_torgb else conv_kernel
        self.conv_clamp = conv_clamp
        self.magnitude_ema_beta = magnitude_ema_beta

        self.up_factor = int(np.rint(self.tmp_sampling_rate
                                     / in_sampling_rate))
        assert in_sampling_rate * self.up_factor == self.tmp_sampling_rate
        self.up_taps = filter_size * self.up_factor \
            if self.up_factor > 1 and not is_torgb else 1
        self.up_filter = design_lowpass_filter(
            self.up_taps, in_cutoff, in_half_width * 2,
            self.tmp_sampling_rate)

        self.down_factor = int(np.rint(self.tmp_sampling_rate
                                       / out_sampling_rate))
        assert out_sampling_rate * self.down_factor == self.tmp_sampling_rate
        self.down_taps = filter_size * self.down_factor \
            if self.down_factor > 1 and not is_torgb else 1
        self.down_radial = use_radial_filters and not is_critically_sampled
        self.down_filter = design_lowpass_filter(
            self.down_taps, out_cutoff, out_half_width * 2,
            self.tmp_sampling_rate, radial=self.down_radial)

        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total = pad_total - (self.in_size + self.conv_kernel - 1) \
            * self.up_factor
        pad_total = pad_total + self.up_taps + self.down_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        self.padding = [int(pad_lo[0]), int(pad_hi[0]),
                        int(pad_lo[1]), int(pad_hi[1])]
        self.affine = FullyConnected(w_dim, in_channels, bias_init=1)

    def init(self, key):
        ka, kw = jax.random.split(key)
        return {
            'affine': self.affine.init(ka),
            'weight': jax.random.normal(
                kw, (self.out_channels, self.in_channels, self.conv_kernel,
                     self.conv_kernel), jnp.float32),
            'bias': jnp.zeros((self.out_channels,), jnp.float32),
            'magnitude_ema': jnp.ones((), jnp.float32),
        }

    def __call__(self, params, x, w, force_fp32=True):
        input_gain = jax.lax.rsqrt(params['magnitude_ema'])
        styles = self.affine(params['affine'], w)
        if self.is_torgb:
            styles = styles / math.sqrt(
                self.in_channels * self.conv_kernel ** 2)
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) \
            else jnp.float32
        x = modulated_conv2d_sg3(
            x.astype(dtype), params['weight'], styles,
            padding=self.conv_kernel - 1, demodulate=not self.is_torgb,
            input_gain=input_gain)
        fu = None if self.up_filter is None else \
            setup_filter(self.up_filter, normalize=False)
        fd = None if self.down_filter is None else (
            jnp.asarray(self.down_filter) if self.down_radial
            else setup_filter(self.down_filter, normalize=False))
        x = filtered_lrelu(
            x, fu=fu, fd=fd, b=params['bias'].astype(x.dtype),
            up=self.up_factor, down=self.down_factor, padding=self.padding,
            gain=1 if self.is_torgb else math.sqrt(2),
            slope=1 if self.is_torgb else 0.2, clamp=self.conv_clamp)
        return x


class SG3SynthesisNetwork:
    """Geometric cutoff schedule + layer stack (reference :402-489)."""

    def __init__(self, w_dim, img_resolution, img_channels,
                 channel_base=32768, channel_max=512, num_layers=14,
                 num_critical=2, first_cutoff=2, first_stopband=2 ** 2.1,
                 last_stopband_rel=2 ** 0.3, margin_size=10,
                 output_scale=0.25, num_fp16_res=4, **layer_kwargs):
        self.w_dim = w_dim
        self.num_ws = num_layers + 2
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.num_layers = num_layers
        self.margin_size = margin_size
        self.output_scale = output_scale

        last_cutoff = img_resolution / 2
        last_stopband = last_cutoff * last_stopband_rel
        exponents = np.minimum(
            np.arange(num_layers + 1) / (num_layers - num_critical), 1)
        cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
        stopbands = first_stopband * \
            (last_stopband / first_stopband) ** exponents
        sampling_rates = np.exp2(np.ceil(np.log2(
            np.minimum(stopbands * 2, img_resolution))))
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + margin_size * 2
        sizes[-2:] = img_resolution
        channels = np.rint(np.minimum((channel_base / 2) / cutoffs,
                                      channel_max))
        channels[-1] = img_channels

        self.input = SynthesisInput(
            w_dim=w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=sampling_rates[0], bandwidth=cutoffs[0])
        self.layer_names = []
        self.layers = {}
        for idx in range(num_layers + 1):
            prev = max(idx - 1, 0)
            layer = SG3SynthesisLayer(
                w_dim=w_dim, is_torgb=(idx == num_layers),
                is_critically_sampled=(idx >= num_layers - num_critical),
                use_fp16=(sampling_rates[idx] * (2 ** num_fp16_res)
                          > img_resolution),
                in_channels=int(channels[prev]),
                out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=int(sampling_rates[prev]),
                out_sampling_rate=int(sampling_rates[idx]),
                in_cutoff=cutoffs[prev], out_cutoff=cutoffs[idx],
                in_half_width=half_widths[prev],
                out_half_width=half_widths[idx], **layer_kwargs)
            name = f'L{idx}_{int(layer.out_size[0])}_{layer.out_channels}'
            self.layers[name] = layer
            self.layer_names.append(name)

    def init(self, key):
        keys = jax.random.split(key, len(self.layer_names) + 1)
        params = {'input': self.input.init(keys[0])}
        for name, k in zip(self.layer_names, keys[1:]):
            params[name] = self.layers[name].init(k)
        return params

    def __call__(self, params, ws, force_fp32=True, **_):
        ws = ws.astype(jnp.float32)
        x = self.input(params['input'], ws[:, 0])
        for i, name in enumerate(self.layer_names):
            x = self.layers[name](params[name], x, ws[:, i + 1],
                                  force_fp32=force_fp32)
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


class SG3Generator:
    """Mapping + synthesis (reference :494-517)."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 mapping_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.synthesis = SG3SynthesisNetwork(
            w_dim=w_dim, img_resolution=img_resolution,
            img_channels=img_channels, **synthesis_kwargs)
        self.num_ws = self.synthesis.num_ws
        self.mapping = SG3MappingNetwork(
            z_dim=z_dim, c_dim=c_dim, w_dim=w_dim, num_ws=self.num_ws,
            **(mapping_kwargs or {}))

    def init(self, key):
        km, ks = jax.random.split(key)
        return {'mapping': self.mapping.init(km),
                'synthesis': self.synthesis.init(ks)}

    def __call__(self, params, z, c=None, truncation_psi=1,
                 truncation_cutoff=None, force_fp32=True):
        ws = self.mapping(params['mapping'], z, c,
                          truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff)
        return self.synthesis(params['synthesis'], ws,
                              force_fp32=force_fp32)
