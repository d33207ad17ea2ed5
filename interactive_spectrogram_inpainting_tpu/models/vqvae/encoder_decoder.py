"""Strided-conv encoder / transposed-conv decoder stacks (VQ-VAE-2 style).

Behavioral equivalent of the reference's Rosinality encoder/decoder
(``interactive_spectrogram_inpainting/vqvae/encoder_decoder.py:18-227``):
the same channel schedules per ``resolution_factor`` in {2, 4, 8, 16},
overlapping (kernel = 2*stride) or local (kernel = stride) down/upsampling
kernels, grouped convs, and ReLU-Conv3x3-ReLU-Conv1x1 residual blocks.

TPU-native design: NHWC layout throughout (feature-minor, the layout XLA
tiles best onto the MXU for convolutions), fp32 parameters with an optional
bf16 compute dtype, ``nn.compact`` flax modules that trace once under jit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class ResBlock(nn.Module):
    """ReLU -> 3x3 conv (to res channels) -> ReLU -> 1x1 conv (back), + skip.

    The skip adds the RELU'D input, not the raw input: the reference's
    ``RosinalityResBlock`` (``encoder_decoder.py:18-35``) opens its conv
    Sequential with ``nn.ReLU(inplace=True)``, which mutates the input
    tensor before ``out += input`` — so its effective computation is
    ``relu(x) + f(relu(x))``. Verified against the executed reference in
    ``tests/test_reference_parity.py``.

    COMPAT: checkpoints trained before this parity fix (round-1 commits
    up to a78c8da) used ``x + f(relu(x))`` and will produce shifted
    codes/reconstructions if loaded here; retrain or re-extract. No
    published checkpoints predate the fix.
    """

    channel: int
    res_channel: int
    groups: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(x)
        h = nn.Conv(self.res_channel, (3, 3), padding=1,
                    feature_group_count=self.groups, dtype=self.dtype)(y)
        h = nn.relu(h)
        h = nn.Conv(self.channel, (1, 1),
                    feature_group_count=self.groups, dtype=self.dtype)(h)
        return y + h


def _down_channel_schedule(channel: int, resolution_factor: int
                           ) -> Sequence[int]:
    """Output channels of each strided downsampling conv, per the reference
    schedules (``encoder_decoder.py:53-113``)."""
    if resolution_factor == 16:
        return (channel // 4, channel // 2, 3 * channel // 4, channel)
    if resolution_factor == 8:
        return (channel // 2, channel // 2, channel)
    if resolution_factor == 4:
        return (channel // 2, channel)
    if resolution_factor == 2:
        return (channel // 2,)
    raise ValueError(f"Unexpected resolution factor {resolution_factor}")


class Encoder(nn.Module):
    """Downsample by ``resolution_factor`` with strided convs + res blocks."""

    channel: int
    n_res_block: int
    res_channel: int
    resolution_factor: int
    groups: int = 1
    use_local_kernels: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = 2
        kernel = stride if self.use_local_kernels else 2 * stride
        # torch Conv2d(k=4, s=2, p=1) halves exactly; k=2, s=2, p=0 likewise
        pad = 1 if not self.use_local_kernels else 0
        schedule = _down_channel_schedule(self.channel,
                                          self.resolution_factor)
        h = x
        for out_ch in schedule:
            h = nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride),
                        padding=pad, feature_group_count=self.groups,
                        dtype=self.dtype)(h)
            h = nn.relu(h)
        # trailing full-width 3x3 conv (every schedule ends with one)
        h = nn.Conv(self.channel, (3, 3), padding=1,
                    feature_group_count=self.groups, dtype=self.dtype)(h)
        for _ in range(self.n_res_block):
            h = ResBlock(self.channel, self.res_channel, groups=self.groups,
                         dtype=self.dtype)(h)
        return nn.relu(h)


class Decoder(nn.Module):
    """3x3 conv + res blocks, then transposed-conv upsampling chain."""

    out_channel: int
    channel: int
    n_res_block: int
    res_channel: int
    resolution_factor: int
    groups: int = 1
    use_local_kernels: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = 2
        kernel = stride if self.use_local_kernels else 2 * stride
        h = nn.Conv(self.channel, (3, 3), padding=1, dtype=self.dtype)(x)
        for _ in range(self.n_res_block):
            h = ResBlock(self.channel, self.res_channel, groups=self.groups,
                         dtype=self.dtype)(h)
        h = nn.relu(h)
        # mirror of the encoder schedule (encoder_decoder.py:153-216)
        up_schedule = tuple(reversed(
            (self.out_channel,) + _down_channel_schedule(
                self.channel, self.resolution_factor)[:-1]))
        for i, out_ch in enumerate(up_schedule):
            h = nn.ConvTranspose(
                out_ch, (kernel, kernel), strides=(stride, stride),
                padding="SAME", dtype=self.dtype)(h)
            if i != len(up_schedule) - 1:
                h = nn.relu(h)
        return h


class UpsampleStack(nn.Module):
    """Plain ConvTranspose chain, used to lift top-level quantized maps to
    bottom resolution (reference ``vqvae.py:183-201``)."""

    channel: int
    num_doublings: int
    use_local_kernels: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = 2
        kernel = stride if self.use_local_kernels else 2 * stride
        h = x
        for _ in range(self.num_doublings):
            h = nn.ConvTranspose(
                self.channel, (kernel, kernel), strides=(stride, stride),
                padding="SAME", dtype=self.dtype)(h)
        return h
