"""Discriminators: resnet blocks, minibatch-std epilogue, dual discrimination.

Behavioral spec: training_avatar_texture/networks_stylegan2.py:687-925 and
training_avatar_texture/dual_discriminator.py (filtered_resizing :86-102,
DualDiscriminator :107-174, SingleDiscriminator :21-82).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (bias_act, downsample2d, interpolate_bilinear, setup_filter,
                   upsample2d)
from .stylegan2 import Conv2d, FullyConnected, MappingNetwork, channels_for


class DiscriminatorBlock:
    """resnet downsampling block (reference: networks_stylegan2.py:687-771)."""

    def __init__(self, in_channels, tmp_channels, out_channels, resolution,
                 img_channels, first_layer_idx, architecture='resnet',
                 activation='lrelu', resample_filter=(1, 3, 3, 1),
                 conv_clamp=None, use_fp16=False, freeze_layers=0):
        assert in_channels in (0, tmp_channels)
        self.in_channels = in_channels
        self.resolution = resolution
        self.img_channels = img_channels
        self.architecture = architecture
        self.use_fp16 = use_fp16
        self.resample_filter = setup_filter(resample_filter)
        self.num_layers = 0

        def trainable():
            nonlocal_idx = first_layer_idx + self.num_layers
            self.num_layers += 1
            return nonlocal_idx >= freeze_layers

        self.fromrgb = None
        if in_channels == 0 or architecture == 'skip':
            self.fromrgb = Conv2d(img_channels, tmp_channels, kernel_size=1,
                                  activation=activation, trainable=trainable(),
                                  conv_clamp=conv_clamp)
        self.conv0 = Conv2d(tmp_channels, tmp_channels, kernel_size=3,
                            activation=activation, trainable=trainable(),
                            conv_clamp=conv_clamp)
        self.conv1 = Conv2d(tmp_channels, out_channels, kernel_size=3,
                            activation=activation, down=2, trainable=trainable(),
                            resample_filter=resample_filter, conv_clamp=conv_clamp)
        self.skip = None
        if architecture == 'resnet':
            self.skip = Conv2d(tmp_channels, out_channels, kernel_size=1,
                               bias=False, down=2, trainable=trainable(),
                               resample_filter=resample_filter)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {}
        if self.fromrgb is not None:
            params['fromrgb'] = self.fromrgb.init(keys[0])
        params['conv0'] = self.conv0.init(keys[1])
        params['conv1'] = self.conv1.init(keys[2])
        if self.skip is not None:
            params['skip'] = self.skip.init(keys[3])
        return params

    def frozen_subnames(self):
        """Conv names frozen by freeze_layers (reference freeze_layers
        gating, networks_stylegan2.py:699-703: trainable params are simply
        not registered; here the optimizer masks their gradients)."""
        return [name for name in ('fromrgb', 'conv0', 'conv1', 'skip')
                if getattr(self, name, None) is not None
                and not getattr(self, name).trainable]

    def __call__(self, params, x, img, force_fp32=True):
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        if x is not None:
            x = x.astype(dtype)
        if self.in_channels == 0 or self.architecture == 'skip':
            img = img.astype(dtype)
            y = self.fromrgb(params['fromrgb'], img)
            x = x + y if x is not None else y
            img = downsample2d(img, self.resample_filter) if self.architecture == 'skip' else None
        if self.architecture == 'resnet':
            y = self.skip(params['skip'], x, gain=math.sqrt(0.5))
            x = self.conv0(params['conv0'], x)
            x = self.conv1(params['conv1'], x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = self.conv0(params['conv0'], x)
            x = self.conv1(params['conv1'], x)
        return x, img


def minibatch_std(x, group_size=4, num_channels=1):
    """Reference: networks_stylegan2.py:776-797."""
    N, C, H, W = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    y = x.reshape(G, -1, F, c, H, W)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))
    y = y.reshape(-1, F, 1, 1)
    y = jnp.tile(y, (G, 1, H, W))
    return jnp.concatenate([x, y.astype(x.dtype)], axis=1)


class DiscriminatorEpilogue:
    """mbstd + conv + fc + cmap projection (reference: :804-861)."""

    def __init__(self, in_channels, cmap_dim, resolution, img_channels,
                 architecture='resnet', mbstd_group_size=4,
                 mbstd_num_channels=1, activation='lrelu', conv_clamp=None):
        self.in_channels = in_channels
        self.cmap_dim = cmap_dim
        self.resolution = resolution
        self.img_channels = img_channels
        self.architecture = architecture
        self.mbstd_group_size = mbstd_group_size
        self.mbstd_num_channels = mbstd_num_channels
        self.fromrgb = (Conv2d(img_channels, in_channels, kernel_size=1,
                               activation=activation)
                        if architecture == 'skip' else None)
        self.conv = Conv2d(in_channels + mbstd_num_channels, in_channels,
                           kernel_size=3, activation=activation,
                           conv_clamp=conv_clamp)
        self.fc = FullyConnected(in_channels * resolution ** 2, in_channels,
                                 activation=activation)
        self.out = FullyConnected(in_channels, 1 if cmap_dim == 0 else cmap_dim)

    def init(self, key):
        keys = jax.random.split(key, 4)
        params = {}
        if self.fromrgb is not None:
            params['fromrgb'] = self.fromrgb.init(keys[0])
        params['conv'] = self.conv.init(keys[1])
        params['fc'] = self.fc.init(keys[2])
        params['out'] = self.out.init(keys[3])
        return params

    def __call__(self, params, x, img, cmap):
        x = x.astype(jnp.float32)
        if self.architecture == 'skip':
            x = x + self.fromrgb(params['fromrgb'], img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = self.conv(params['conv'], x)
        x = self.fc(params['fc'], x.reshape(x.shape[0], -1))
        x = self.out(params['out'], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) * (1 / math.sqrt(self.cmap_dim))
        return x


class Discriminator:
    """Plain StyleGAN2 D (reference: :865-925)."""

    def __init__(self, c_dim, img_resolution, img_channels,
                 architecture='resnet', channel_base=32768, channel_max=512,
                 num_fp16_res=4, conv_clamp=256, cmap_dim=None,
                 block_kwargs=None, mapping_kwargs=None, epilogue_kwargs=None):
        self.c_dim = c_dim
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(np.log2(img_resolution))
        self.img_channels = img_channels
        self.block_resolutions = [2 ** i for i in
                                  range(self.img_resolution_log2, 2, -1)]
        channels_dict = {res: channels_for(res, channel_base, channel_max)
                         for res in self.block_resolutions + [4]}
        fp16_resolution = max(2 ** (self.img_resolution_log2 + 1 - num_fp16_res), 8)
        if cmap_dim is None:
            cmap_dim = channels_dict[4]
        if c_dim == 0:
            cmap_dim = 0
        self.cmap_dim = cmap_dim

        common = dict(img_channels=img_channels, architecture=architecture,
                      conv_clamp=conv_clamp)
        self.blocks = {}
        cur_layer_idx = 0
        for res in self.block_resolutions:
            in_channels = channels_dict[res] if res < img_resolution else 0
            tmp_channels = channels_dict[res]
            out_channels = channels_dict[res // 2]
            use_fp16 = res >= fp16_resolution
            block = DiscriminatorBlock(in_channels, tmp_channels, out_channels,
                                       resolution=res,
                                       first_layer_idx=cur_layer_idx,
                                       use_fp16=use_fp16,
                                       **(block_kwargs or {}), **common)
            self.blocks[res] = block
            cur_layer_idx += block.num_layers
        self.mapping = None
        if c_dim > 0:
            self.mapping = MappingNetwork(z_dim=0, c_dim=c_dim, w_dim=cmap_dim,
                                          num_ws=None, w_avg_beta=None,
                                          **(mapping_kwargs or {}))
        self.b4 = DiscriminatorEpilogue(channels_dict[4], cmap_dim=cmap_dim,
                                        resolution=4,
                                        **(epilogue_kwargs or {}), **common)

    def init(self, key):
        params = {}
        for i, res in enumerate(self.block_resolutions):
            params[f'b{res}'] = self.blocks[res].init(jax.random.fold_in(key, i))
        if self.mapping is not None:
            params['mapping'] = self.mapping.init(jax.random.fold_in(key, 101))
        params['b4'] = self.b4.init(jax.random.fold_in(key, 102))
        return params

    def __call__(self, params, img, c, force_fp32=True):
        x = None
        for res in self.block_resolutions:
            x, img = self.blocks[res](params[f'b{res}'], x, img,
                                      force_fp32=force_fp32)
        cmap = None
        if self.c_dim > 0:
            cmap = self.mapping(params['mapping'], None, c)
        return self.b4(params['b4'], x, img, cmap)

    def frozen_paths(self):
        """Param-path prefixes frozen by block freeze_layers."""
        return [(f'b{res}', name) for res in self.block_resolutions
                for name in self.blocks[res].frozen_subnames()]


def filtered_resizing(image_orig_tensor, size, f, filter_mode='antialiased'):
    """Reference: dual_discriminator.py:86-102."""
    if filter_mode == 'antialiased':
        return interpolate_bilinear(image_orig_tensor, size, antialias=True)
    if filter_mode == 'classic':
        x = upsample2d(image_orig_tensor, f, up=2)
        x = interpolate_bilinear(x, size * 2 + 2, antialias=False)
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if filter_mode == 'none':
        return interpolate_bilinear(image_orig_tensor, size, antialias=False)
    if isinstance(filter_mode, float):
        assert 0 < filter_mode < 1
        filtered = interpolate_bilinear(image_orig_tensor, size, antialias=True)
        aliased = interpolate_bilinear(image_orig_tensor, size, antialias=False)
        return (1 - filter_mode) * aliased + filter_mode * filtered
    raise ValueError(filter_mode)


class DualDiscriminator:
    """Concat 512^2 image with upsampled raw render -> 6-channel D
    (reference: dual_discriminator.py:107-174)."""

    def __init__(self, c_dim, img_resolution, img_channels, disc_c_noise=0,
                 **disc_kwargs):
        self.disc = Discriminator(c_dim, img_resolution, img_channels * 2,
                                  **disc_kwargs)
        self.c_dim = c_dim
        self.disc_c_noise = disc_c_noise
        self.resample_filter = setup_filter([1, 3, 3, 1])

    # expose the inner block structure for the pkl importer
    def init(self, key):
        return self.disc.init(key)

    def __call__(self, params, img, c, rng=None, force_fp32=True):
        """img: dict with 'image' (N,3,R,R) and 'image_raw' (N,3,r,r)."""
        image_raw = filtered_resizing(img['image_raw'],
                                      size=img['image'].shape[-1],
                                      f=self.resample_filter)
        x = jnp.concatenate([img['image'], image_raw], axis=1)
        if self.c_dim > 0 and self.disc_c_noise > 0:
            assert rng is not None
            c = c + jax.random.normal(rng, c.shape, c.dtype) * \
                jnp.std(c, axis=0) * self.disc_c_noise
        return self.disc(params, x, c, force_fp32=force_fp32)


class DualLabelDualDiscriminator:
    """Dual-D with SEPARATE mapping networks for the 25-dim camera label and
    the 50-dim expression label (reference: dual_discriminator.py:181-260);
    the two cmaps are concatenated for the epilogue projection."""

    def __init__(self, c_dim, c2_dim, img_resolution, img_channels,
                 architecture='resnet', channel_base=32768, channel_max=512,
                 num_fp16_res=4, conv_clamp=256, cmap_dim=None, disc_c_noise=0,
                 block_kwargs=None, mapping_kwargs=None, epilogue_kwargs=None):
        img_channels *= 2
        self.c_dim = c_dim
        self.c2_dim = c2_dim
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(np.log2(img_resolution))
        self.block_resolutions = [2 ** i for i in
                                  range(self.img_resolution_log2, 2, -1)]
        channels_dict = {res: channels_for(res, channel_base, channel_max)
                         for res in self.block_resolutions + [4]}
        fp16_resolution = max(2 ** (self.img_resolution_log2 + 1 - num_fp16_res), 8)
        if cmap_dim is None:
            cmap_dim = channels_dict[4]
        if c_dim == 0:
            cmap_dim = 0
        self.cmap_dim = cmap_dim
        self.disc_c_noise = disc_c_noise
        self.resample_filter = setup_filter([1, 3, 3, 1])

        common = dict(img_channels=img_channels, architecture=architecture,
                      conv_clamp=conv_clamp)
        self.blocks = {}
        cur_layer_idx = 0
        for res in self.block_resolutions:
            in_channels = channels_dict[res] if res < img_resolution else 0
            block = DiscriminatorBlock(in_channels, channels_dict[res],
                                       channels_dict[res // 2], resolution=res,
                                       first_layer_idx=cur_layer_idx,
                                       use_fp16=(res >= fp16_resolution),
                                       **(block_kwargs or {}), **common)
            self.blocks[res] = block
            cur_layer_idx += block.num_layers
        self.mapping = MappingNetwork(z_dim=0, c_dim=c_dim, w_dim=cmap_dim,
                                      num_ws=None, w_avg_beta=None,
                                      **(mapping_kwargs or {}))
        self.mapping2 = MappingNetwork(z_dim=0, c_dim=c2_dim, w_dim=32,
                                       num_ws=None, w_avg_beta=None,
                                       **(mapping_kwargs or {}))
        self.b4 = DiscriminatorEpilogue(channels_dict[4],
                                        cmap_dim=cmap_dim + 32, resolution=4,
                                        **(epilogue_kwargs or {}), **common)

    def init(self, key):
        params = {}
        for i, res in enumerate(self.block_resolutions):
            params[f'b{res}'] = self.blocks[res].init(jax.random.fold_in(key, i))
        params['mapping'] = self.mapping.init(jax.random.fold_in(key, 101))
        params['mapping2'] = self.mapping2.init(jax.random.fold_in(key, 102))
        params['b4'] = self.b4.init(jax.random.fold_in(key, 103))
        return params

    def __call__(self, params, img, c, rng=None, force_fp32=True):
        c1, c2 = c[:, :self.c_dim], c[:, self.c_dim:]
        assert c2.shape[1] == self.c2_dim
        image_raw = filtered_resizing(img['image_raw'],
                                      size=img['image'].shape[-1],
                                      f=self.resample_filter)
        x_img = jnp.concatenate([img['image'], image_raw], axis=1)
        if self.disc_c_noise > 0:
            assert rng is not None
            k1, k2 = jax.random.split(rng)
            c1 = c1 + jax.random.normal(k1, c1.shape) * jnp.std(c1, 0) * self.disc_c_noise
            c2 = c2 + jax.random.normal(k2, c2.shape) * jnp.std(c2, 0) * self.disc_c_noise
        x = None
        for res in self.block_resolutions:
            x, x_img = self.blocks[res](params[f'b{res}'], x, x_img,
                                        force_fp32=force_fp32)
        cmap1 = self.mapping(params['mapping'], None, c1)
        cmap2 = self.mapping2(params['mapping2'], None, c2)
        cmap = jnp.concatenate([cmap1, cmap2], axis=1)
        return self.b4(params['b4'], x, x_img, cmap)


class DummyDualDiscriminator:
    """Dual-D whose raw branch fades out over ~500k images
    (reference: dual_discriminator.py:265-330). The fade factor is driven by
    cur_nimg (pass via __call__) instead of the reference's mutable counter."""

    def __init__(self, c_dim, img_resolution, img_channels, **disc_kwargs):
        self.disc = Discriminator(c_dim, img_resolution, img_channels * 2,
                                  **disc_kwargs)
        self.c_dim = c_dim
        self.resample_filter = setup_filter([1, 3, 3, 1])

    def init(self, key):
        return self.disc.init(key)

    def __call__(self, params, img, c, rng=None, force_fp32=True, cur_nimg=0):
        raw_fade = jnp.maximum(0.0, 1.0 - cur_nimg / 500000.0)
        image_raw = filtered_resizing(img['image_raw'],
                                      size=img['image'].shape[-1],
                                      f=self.resample_filter) * raw_fade
        x = jnp.concatenate([img['image'], image_raw], axis=1)
        return self.disc(params, x, c, force_fp32=force_fp32)


class SingleDiscriminator:
    """D on the full-res image only (reference: dual_discriminator.py:21-82)."""

    def __init__(self, c_dim, img_resolution, img_channels, disc_c_noise=0,
                 **disc_kwargs):
        self.disc = Discriminator(c_dim, img_resolution, img_channels,
                                  **disc_kwargs)
        self.c_dim = c_dim
        self.disc_c_noise = disc_c_noise

    def init(self, key):
        return self.disc.init(key)

    def __call__(self, params, img, c, rng=None, force_fp32=True):
        x = img['image'] if isinstance(img, dict) else img
        if self.c_dim > 0 and self.disc_c_noise > 0:
            assert rng is not None
            c = c + jax.random.normal(rng, c.shape, c.dtype) * \
                jnp.std(c, axis=0) * self.disc_c_noise
        return self.disc(params, x, c, force_fp32=force_fp32)


def _delegate_frozen_paths(self):
    """freeze_layers passthrough for wrappers holding one inner
    Discriminator."""
    return self.disc.frozen_paths()


def _blocks_frozen_paths(self):
    """freeze_layers for discriminators that own their blocks directly."""
    return [(f'b{res}', name) for res in self.block_resolutions
            for name in self.blocks[res].frozen_subnames()]


for _cls in (DualDiscriminator, DummyDualDiscriminator, SingleDiscriminator):
    _cls.frozen_paths = _delegate_frozen_paths
DualLabelDualDiscriminator.frozen_paths = _blocks_frozen_paths
