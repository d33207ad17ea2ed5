"""ResNet encoder / PixelShuffle-decoder alternative (--use_resnet path).

Behavioral equivalent of the reference's fastai-based variant
(``encoder_decoder.py:230-447``): ``NoFlattenXResNet`` encoders (conv
stem + residual stages, one stage per factor-2 downsampling) and
skip-free ``NoSkipDynamicUnet`` decoders (residual upsampling blocks with
PixelShuffle/ICNR upsampling, no encoder->decoder skip connections),
built per layer from ``resolution_factors`` + ``resnet_layers_per_
downsampling_block`` + ``resnet_expansion``
(``get_xresnet_unet``, ``encoder_decoder.py:344-427``).

TPU-native: NHWC, BatchNorm-free (GroupNorm — under SPMD this avoids the
reference's SyncBatchNorm machinery entirely, ``train_vqvae.py:769``),
PixelShuffle as a reshape (space-to-depth inverse, layout-friendly).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn


class ResNetBlock(nn.Module):
    """Pre-activation residual block with optional downsampling."""

    channels: int
    stride: int = 1
    expansion: int = 1
    groups_norm: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.channels * self.expansion
        h = nn.GroupNorm(num_groups=min(self.groups_norm, x.shape[-1]))(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=min(self.groups_norm, self.channels))(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                        dtype=self.dtype)(x)
        return x + h


class XResNetEncoder(nn.Module):
    """Conv stem + one residual stage per factor-2 downsampling."""

    out_channels: int
    resolution_factor: int
    layers_per_block: int = 4
    expansion: int = 1
    stem_channels: Sequence[int] = (32, 32, 64)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_stages = int(math.log2(self.resolution_factor))
        # stem: first conv strided (one factor-2), as in XResNet
        h = x
        for i, ch in enumerate(self.stem_channels):
            h = nn.Conv(ch, (3, 3),
                        strides=(2, 2) if i == 0 else (1, 1),
                        padding=1, dtype=self.dtype)(h)
            h = nn.relu(h)
        widths = [64, 128, 256, 512] + [256] * max(0, num_stages - 4)
        for stage in range(max(0, num_stages - 1)):
            width = widths[stage]
            h = ResNetBlock(width, stride=2, expansion=self.expansion,
                            dtype=self.dtype)(h)
            for _ in range(self.layers_per_block - 1):
                h = ResNetBlock(width, stride=1, expansion=self.expansion,
                                dtype=self.dtype)(h)
        h = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(h)
        return nn.relu(h)


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, H, W, C*r^2] -> [B, H*r, W*r, C] (ICNR-style upsampling)."""
    b, h, w, c = x.shape
    r = factor
    out_c = c // (r * r)
    x = x.reshape(b, h, w, r, r, out_c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * r, w * r, out_c)


class NoSkipUnetDecoder(nn.Module):
    """Skip-free U-Net decoder half: per factor-2, PixelShuffle upsample +
    two convs (NoSkipUnetBlock equivalent, ``encoder_decoder.py:230-240``)."""

    out_channels: int
    resolution_factor: int
    hidden_channels: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_stages = int(math.log2(self.resolution_factor))
        h = x
        ch = self.hidden_channels
        for stage in range(num_stages):
            h = nn.Conv(ch * 4, (1, 1), dtype=self.dtype)(h)
            h = pixel_shuffle(h, 2)
            h = nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype)(h)
            h = nn.relu(h)
            ch = max(ch // 2, 32)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(h)


def get_xresnet_unet(in_channels: int, resolution_factors,
                     hidden_channels: int, embeddings_dimension: int,
                     layers_per_downsampling_block: int = 4,
                     expansion: int = 1):
    """(encoders, decoders) dicts keyed 'top'/'bottom', mirroring
    ``get_xresnet_unet`` (``encoder_decoder.py:344-427``)."""
    encoders = {
        "bottom": XResNetEncoder(
            out_channels=hidden_channels,
            resolution_factor=int(resolution_factors["bottom"]),
            layers_per_block=layers_per_downsampling_block,
            expansion=expansion),
        "top": XResNetEncoder(
            out_channels=hidden_channels,
            resolution_factor=int(resolution_factors["top"]),
            layers_per_block=layers_per_downsampling_block,
            expansion=expansion,
            stem_channels=(hidden_channels // 2,) * 3),
    }
    decoders = {
        "top": NoSkipUnetDecoder(
            out_channels=embeddings_dimension,
            resolution_factor=int(resolution_factors["top"]),
            hidden_channels=hidden_channels),
        "bottom": NoSkipUnetDecoder(
            out_channels=in_channels,
            resolution_factor=int(resolution_factors["bottom"]),
            hidden_channels=hidden_channels),
    }
    return encoders, decoders
