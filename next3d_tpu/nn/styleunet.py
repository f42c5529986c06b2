"""StyleUNet: StyleGAN2 generator with a conditioning-image encoder pyramid.

Behavioral spec: training_avatar_texture/networks_stylegan2_styleunet.py
(EncoderResBlock :97-115, SynthesisNetwork :493-595, Generator :599-625).
Used twice by the flagship model: the mouth backbone (cond 64^2 -> 256^2
plane, final_size=4) and the neural-blending net (cond 256^2 -> 256^2,
final_size=32) — triplane_next3d.py:64,109.

Faithfully reproduced quirks (they define the checkpoint's weight usage):
  * synthesis blocks BELOW ``final_size``'s successor are constructed (their
    params exist in checkpoints) but never run — the forward loop starts at
    ``block_resolutions[log2(final_size) - 1]`` (reference :576).
  * the per-resolution fusion convs are indexed by loop position; with
    ``num_cond_res`` < img_resolution the last fusion conv(s) are unused
    (reference :578-583).
  * ws splitting covers ALL blocks, so skipped blocks still consume their w
    slots (reference :560-563).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import downsample2d, setup_filter
from .stylegan2 import (Conv2d, MappingNetwork, SynthesisBlock, channels_for)


class EncoderResBlock:
    """fromrgb + 2 convs, second downsamples (reference :97-115)."""

    def __init__(self, img_channel, in_channel, out_channel,
                 resample_filter=(1, 3, 3, 1), downsample=True):
        self.fromrgb = Conv2d(img_channel, in_channel, 1, activation='linear',
                              bias=False)
        self.conv1 = Conv2d(in_channel, in_channel, 3, activation='lrelu')
        self.conv2 = Conv2d(in_channel, out_channel, 3, down=2, activation='lrelu')
        self.resample_filter = setup_filter(resample_filter)
        self.downsample = downsample

    def init(self, key):
        k0, k1, k2 = jax.random.split(key, 3)
        return {'fromrgb': self.fromrgb.init(k0),
                'conv1': self.conv1.init(k1),
                'conv2': self.conv2.init(k2)}

    def __call__(self, params, inp, skip=None):
        if self.downsample:
            inp = downsample2d(inp, self.resample_filter)
        out = self.fromrgb(params['fromrgb'], inp)
        if skip is not None:
            out = out + skip
        out = self.conv1(params['conv1'], out)
        out = self.conv2(params['conv2'], out)
        return inp, out


class CondSynthesisNetwork:
    """StyleGAN2 synthesis with encoder-feature fusion (reference :493-595)."""

    def __init__(self, w_dim, img_resolution, img_channels, cond_channels=3,
                 in_size=64, final_size=4, channel_base=32768, channel_max=512,
                 num_fp16_res=4, num_cond_res=64, **block_kwargs):
        assert img_resolution >= 4 and (img_resolution & (img_resolution - 1)) == 0
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_resolution_log2 = int(np.log2(img_resolution))
        self.img_channels = img_channels
        self.cond_channels = cond_channels
        self.in_size = in_size
        self.final_size = final_size
        self.num_cond_res = num_cond_res
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

        # encoder pyramid: in_size -> final_size (reference :536-542)
        self.encoder_res = [2 ** i for i in range(int(np.log2(in_size)),
                                                  int(np.log2(final_size)) - 1, -1)]
        self.encoder = []
        for res in self.encoder_res[:-1]:
            in_ch = channels_dict[res]
            out_ch = channels_dict[res // 2]
            self.encoder.append(EncoderResBlock(cond_channels, in_ch, out_ch,
                                                downsample=(res < in_size)))
        # fusion convs, ascending resolutions (reference :544-552)
        self.fusion = []
        for res in self.encoder_res[::-1]:
            num_channels = channels_dict[res]
            if res > final_size:
                self.fusion.append(Conv2d(num_channels * 2, num_channels,
                                          kernel_size=3, activation='linear',
                                          bias=True))
            else:
                self.fusion.append(Conv2d(num_channels, num_channels,
                                          kernel_size=3, activation='linear',
                                          bias=True))

    def init(self, key):
        params = {}
        for i, res in enumerate(self.block_resolutions):
            params[f'b{res}'] = self.blocks[res].init(jax.random.fold_in(key, i))
        params['encoder'] = {str(i): enc.init(jax.random.fold_in(key, 1000 + i))
                             for i, enc in enumerate(self.encoder)}
        params['fusion'] = {str(i): fus.init(jax.random.fold_in(key, 2000 + i))
                            for i, fus in enumerate(self.fusion)}
        return params

    def __call__(self, params, x_in, ws, **block_kwargs):
        ws = ws.astype(jnp.float32)
        assert ws.shape[1] == self.num_ws, (ws.shape, self.num_ws)
        rng = block_kwargs.pop('rng', None)
        block_ws = []
        w_idx = 0
        for res in self.block_resolutions:
            block = self.blocks[res]
            block_ws.append(ws[:, w_idx: w_idx + block.num_conv + block.num_torgb])
            w_idx += block.num_conv

        # encoder: blocks run in construction order (in_size down to
        # final_size); the reference's reversed enumerate only renames the
        # loop variable (reference :566-570)
        #
        # TPU perf: in bf16 mode the encoder + fusion convs run bfloat16 —
        # they are ~40% of the StyleUNet FLOPs and the reference leaves them
        # f32 only because its per-block fp16 casts cover synthesis blocks
        # alone; f32 convs at HIGHEST are 6-pass bf16 on v5e (~6x slower)
        if not block_kwargs.get('force_fp32', True):
            x_in = x_in.astype(jnp.bfloat16)
        cond_list = []
        cond_out = None
        for i in range(len(self.encoder)):
            x_in, cond_out = self.encoder[i](params['encoder'][str(i)], x_in, cond_out)
            cond_list.append(cond_out)
        cond_list = cond_list[::-1]  # ascending resolution: final_size..in_size/2

        start = int(np.log2(self.final_size)) - 1
        x = img = None
        _index = 0
        first_res = self.block_resolutions[start]
        for res, cur_ws in zip(self.block_resolutions[start:], block_ws[start:]):
            if 2 ** (_index + int(np.log2(self.final_size))) < self.num_cond_res:
                fus = self.fusion[_index]
                fp = params['fusion'][str(_index)]
                if res == first_res:
                    x = fus(fp, cond_list[_index])
                else:
                    x = jnp.concatenate([x, cond_list[_index]], axis=1)
                    x = fus(fp, x)
            block_rng = jax.random.fold_in(rng, res) if rng is not None else None
            x, img = self.blocks[res](params[f'b{res}'], x, img, cur_ws,
                                      rng=block_rng, **block_kwargs)
            _index += 1
        return img


class CondGenerator:
    """mapping + conditional synthesis (reference :599-625)."""

    def __init__(self, z_dim, c_dim, w_dim, img_resolution, img_channels,
                 mapping_ws=-1, mapping_kwargs=None, **synthesis_kwargs):
        self.z_dim = z_dim
        self.c_dim = c_dim
        self.w_dim = w_dim
        self.img_resolution = img_resolution
        self.img_channels = img_channels
        self.synthesis = CondSynthesisNetwork(w_dim=w_dim,
                                              img_resolution=img_resolution,
                                              img_channels=img_channels,
                                              **synthesis_kwargs)
        self.num_ws = self.synthesis.num_ws
        if mapping_ws == -1:
            mapping_ws = self.num_ws
        self.mapping = MappingNetwork(z_dim=z_dim, c_dim=c_dim, w_dim=w_dim,
                                      num_ws=mapping_ws, **(mapping_kwargs or {}))

    def init(self, key):
        k_map, k_syn = jax.random.split(key)
        return {'mapping': self.mapping.init(k_map),
                'synthesis': self.synthesis.init(k_syn)}
