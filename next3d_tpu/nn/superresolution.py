"""EG3D super-resolution heads.

Behavioral spec: training_avatar_texture/superresolution.py. Each variant is
two StyleGAN2 synthesis blocks fed with (32-ch features, 3-ch rgb), reusing
the LAST w repeated x3 (reference :46,280) and bilinearly resizing the input
to ``input_resolution`` first (reference :282-286).

``SuperresolutionHybrid8XDC`` (256/128 channels) is the one the 512^2 FFHQ
checkpoint uses (train_next3d.py:301-302, superresolution.py:264-290).
The StyleGAN3 (alias-free) SR variants of the reference are intentionally
not provided: nothing reachable from the released configs uses them
(SURVEY.md section 2.2 filtered_lrelu note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import interpolate_bilinear
from .stylegan2 import SynthesisBlock

# SynthesisBlockNoUp == SynthesisBlock(no_up=True)
# (reference: superresolution.py:158-257)


def SynthesisBlockNoUp(*args, **kwargs):
    return SynthesisBlock(*args, no_up=True, **kwargs)


class _SRBase:
    input_resolution: int
    sr_antialias: bool

    def init(self, key):
        k0, k1 = jax.random.split(key)
        return {'block0': self.block0.init(k0), 'block1': self.block1.init(k1)}

    def __call__(self, params, rgb, x, ws, **block_kwargs):
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[-1] != self.input_resolution and not (
                self._resize_only_if_smaller and x.shape[-1] >= self.input_resolution):
            x = interpolate_bilinear(x, self.input_resolution,
                                     antialias=self.sr_antialias)
            rgb = interpolate_bilinear(rgb, self.input_resolution,
                                       antialias=self.sr_antialias)
        x, rgb = self.block0(params['block0'], x, rgb, ws, **block_kwargs)
        x, rgb = self.block1(params['block1'], x, rgb, ws, **block_kwargs)
        return rgb


class SuperresolutionHybrid8XDC(_SRBase):
    """128 -> 512, deep channels (reference: superresolution.py:264-290)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 num_fp16_res=4, conv_clamp=None, channel_base=None,
                 channel_max=None, **block_kwargs):
        assert img_resolution == 512
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self._resize_only_if_smaller = False
        self.block0 = SynthesisBlock(channels, 256, w_dim=512, resolution=256,
                                     img_channels=3, is_last=False,
                                     use_fp16=use_fp16,
                                     conv_clamp=(256 if use_fp16 else None),
                                     **block_kwargs)
        self.block1 = SynthesisBlock(256, 128, w_dim=512, resolution=512,
                                     img_channels=3, is_last=True,
                                     use_fp16=use_fp16,
                                     conv_clamp=(256 if use_fp16 else None),
                                     **block_kwargs)


class SuperresolutionHybrid8X(_SRBase):
    """128 -> 512 (reference: superresolution.py:29-56)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 num_fp16_res=4, conv_clamp=None, channel_base=None,
                 channel_max=None, **block_kwargs):
        assert img_resolution == 512
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self._resize_only_if_smaller = False
        self.block0 = SynthesisBlock(channels, 128, w_dim=512, resolution=256,
                                     img_channels=3, is_last=False,
                                     use_fp16=use_fp16,
                                     conv_clamp=(256 if use_fp16 else None),
                                     **block_kwargs)
        self.block1 = SynthesisBlock(128, 64, w_dim=512, resolution=512,
                                     img_channels=3, is_last=True,
                                     use_fp16=use_fp16,
                                     conv_clamp=(256 if use_fp16 else None),
                                     **block_kwargs)


class SuperresolutionHybrid4X(_SRBase):
    """-> 256; resizes only if input is smaller (reference: :62-88)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 num_fp16_res=4, conv_clamp=None, channel_base=None,
                 channel_max=None, **block_kwargs):
        assert img_resolution == 256
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 128
        self.sr_antialias = sr_antialias
        self._resize_only_if_smaller = True
        self.block0 = SynthesisBlockNoUp(channels, 128, w_dim=512, resolution=128,
                                         img_channels=3, is_last=False,
                                         use_fp16=use_fp16,
                                         conv_clamp=(256 if use_fp16 else None),
                                         **block_kwargs)
        self.block1 = SynthesisBlock(128, 64, w_dim=512, resolution=256,
                                     img_channels=3, is_last=True,
                                     use_fp16=use_fp16,
                                     conv_clamp=(256 if use_fp16 else None),
                                     **block_kwargs)


class SuperresolutionHybrid2X(_SRBase):
    """64 -> 128 (reference: :94-121)."""

    def __init__(self, channels, img_resolution, sr_num_fp16_res, sr_antialias,
                 num_fp16_res=4, conv_clamp=None, channel_base=None,
                 channel_max=None, **block_kwargs):
        assert img_resolution == 128
        use_fp16 = sr_num_fp16_res > 0
        self.input_resolution = 64
        self.sr_antialias = sr_antialias
        self._resize_only_if_smaller = False
        self.block0 = SynthesisBlockNoUp(channels, 128, w_dim=512, resolution=64,
                                         img_channels=3, is_last=False,
                                         use_fp16=use_fp16,
                                         conv_clamp=(256 if use_fp16 else None),
                                         **block_kwargs)
        self.block1 = SynthesisBlock(128, 64, w_dim=512, resolution=128,
                                     img_channels=3, is_last=True,
                                     use_fp16=use_fp16,
                                     conv_clamp=(256 if use_fp16 else None),
                                     **block_kwargs)


# legacy 256-res variant kept for checkpoint compat (reference
# superresolution.py:126-153): same structure as 4X without antialias
class SuperresolutionHybridDeepfp32(SuperresolutionHybrid4X):
    def __init__(self, channels, img_resolution, sr_num_fp16_res,
                 sr_antialias=False, **kwargs):
        super().__init__(channels, img_resolution, sr_num_fp16_res,
                         sr_antialias=False, **kwargs)
