"""Semantic encoder/decoder: conv residual stacks mapping SSL features to the
codec latent rate (HCodec vq/semantic_module.py). Channels-last."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from ...nn.conv import Conv1d, ConvTranspose1d


class ResidualUnit(nn.Module):
    """ELU -> conv k3 dilated -> ELU -> 1x1, residual (semantic_module.py:55-81)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv1d(self.channels, self.kernel_size, dilation=self.dilation,
                   use_bias=False, name="conv1")(nn.elu(x))
        y = Conv1d(self.channels, 1, padding=0, use_bias=False,
                   name="conv2")(nn.elu(y))
        return x + y


class EncoderBlock(nn.Module):
    """Residual units then strided conv (k = 2*stride, or 3 if stride==1)."""

    out_channels: int
    stride: int
    dilations: Tuple[int, ...] = (1, 1)
    unit_kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            x = ResidualUnit(x.shape[-1], self.unit_kernel_size, d,
                             name=f"res_{i}")(x)
        k = 3 if self.stride == 1 else 2 * self.stride
        return Conv1d(self.out_channels, k, stride=self.stride, name="conv")(x)


class DecoderBlock(nn.Module):
    """Upsampling conv (transpose if stride>1) then residual units."""

    out_channels: int
    stride: int
    dilations: Tuple[int, ...] = (1, 1)
    unit_kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        if self.stride == 1:
            x = Conv1d(self.out_channels, 3, name="conv")(x)
        else:
            x = ConvTranspose1d(self.out_channels, 2 * self.stride,
                                stride=self.stride, name="conv")(x)
        for i, d in enumerate(self.dilations):
            x = ResidualUnit(self.out_channels, self.unit_kernel_size, d,
                             name=f"res_{i}")(x)
        return x


class SemanticEncoder(nn.Module):
    """SSL feats (B, T, 768) -> latent (B, T/prod(strides), out_channels)
    (semantic_module.py:157-201)."""

    input_channels: int
    encode_channels: int
    out_channels: int
    channel_ratios: Sequence[float] = (1, 1)
    strides: Sequence[int] = (2, 1)
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.encode_channels, self.kernel_size, use_bias=False,
                   name="conv")(x)
        for i, stride in enumerate(self.strides):
            x = EncoderBlock(
                int(self.encode_channels * self.channel_ratios[i]), stride,
                name=f"block_{i}",
            )(x)
        return Conv1d(self.out_channels, self.kernel_size, use_bias=False,
                      name="conv2")(x)


class SemanticDecoder(nn.Module):
    """Latent -> SSL feature reconstruction (semantic_module.py:252-299)."""

    code_dim: int
    output_channels: int
    decode_channels: int
    channel_ratios: Sequence[float] = (1, 1)
    strides: Sequence[int] = (2, 1)
    kernel_size: int = 3

    @nn.compact
    def __call__(self, z):
        x = Conv1d(int(self.decode_channels * self.channel_ratios[0]),
                   self.kernel_size, use_bias=False, name="conv1")(z)
        n = len(self.strides)
        for i, stride in enumerate(self.strides):
            out_ch = (
                int(self.decode_channels * self.channel_ratios[i + 1])
                if i < n - 1 else self.decode_channels
            )
            x = DecoderBlock(out_ch, stride, name=f"block_{i}")(x)
        return Conv1d(self.output_channels, self.kernel_size, use_bias=False,
                      name="conv2")(x)
