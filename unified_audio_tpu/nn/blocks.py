"""Codec building blocks (channels-last (B, T, C)).

Covers every L1 block family in the reference inventory (SURVEY §1 L1):
ConvNeXt / Resnet / Attn blocks (HCodec vq/conv.py:168-338), Snake + DAC
residual units and the WaveGenerator decoder block (BiCodec
modules/blocks/layers.py, wave_generator.py), Vocos backbone with AdaLayerNorm
conditioning (modules/blocks/vocos.py), the learned up/down SamplingBlock
(modules/blocks/samper.py), and SEANet encoder/decoder stacks
(encoder_modules/seanet.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .conv import (
    CausalConv1d,
    Conv1d,
    ConvTranspose1d,
    SConv1d,
    SConvTranspose1d,
    SubPixelConvTranspose1d,
    pad1d,
)
from .recurrent import SLSTM
from .transformer import Transformer


def swish(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# ConvNeXt / AdaLayerNorm (HCodec vq/conv.py:168-211; vocos.py:26-110)
# ---------------------------------------------------------------------------

class AdaLayerNorm(nn.Module):
    """LayerNorm whose scale/shift come from a condition vector
    (vocos.py:87-110; identity-init scale, zero-init shift)."""

    embedding_dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Dense(
            self.embedding_dim, kernel_init=nn.initializers.ones, name="scale"
        )(cond)
        shift = nn.Dense(
            self.embedding_dim, kernel_init=nn.initializers.zeros, name="shift"
        )(cond)
        x = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=False)(x)
        return x * scale[..., None, :] + shift[..., None, :]


class ConvNeXtBlock(nn.Module):
    """1-D ConvNeXt: depthwise k7 conv -> LN (or AdaLN) -> pw MLP -> gamma.

    ``causal`` selects the HCodec constant-pad depthwise conv; with
    ``condition_dim`` set this is the Vocos conditional variant.
    """

    dim: int
    intermediate_dim: int
    causal: bool = False
    dilation: int = 1
    layer_scale_init_value: float = 0.0
    condition_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, cond=None):
        residual = x
        x = CausalConv1d(
            features=self.dim, kernel_size=7, dilation=self.dilation,
            groups=self.dim, causal=self.causal, name="dwconv",
        )(x)
        if self.condition_dim is not None:
            x = AdaLayerNorm(self.dim, name="norm")(x, cond)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma * x
        return residual + x


class _ScanConvNeXt(nn.Module):
    """nn.scan body for homogeneous ConvNeXt stacks."""

    dim: int
    intermediate_dim: int
    causal: bool
    layer_scale_init_value: float
    condition_dim: Optional[int]

    @nn.compact
    def __call__(self, x, cond):
        x = ConvNeXtBlock(
            dim=self.dim, intermediate_dim=self.intermediate_dim,
            causal=self.causal,
            layer_scale_init_value=self.layer_scale_init_value,
            condition_dim=self.condition_dim, name="block",
        )(x, cond if self.condition_dim is not None else None)
        return x, ()


class ConvNeXtStack(nn.Module):
    """N identical ConvNeXt blocks as ONE nn.scan over stacked params —
    a single layer body in the HLO instead of N copies (compile-time critical
    for the 12/24/32-block stacks in the codec decoders)."""

    dim: int
    intermediate_dim: int
    num_layers: int
    causal: bool = False
    layer_scale_init_value: float = 0.0
    condition_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, cond=None):
        scan = nn.scan(
            _ScanConvNeXt,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=self.num_layers,
        )
        if cond is None:
            cond = jnp.zeros((0,), x.dtype)
        x, _ = scan(
            self.dim, self.intermediate_dim, self.causal,
            self.layer_scale_init_value, self.condition_dim, name="stack",
        )(x, cond)
        return x


# ---------------------------------------------------------------------------
# GroupNorm Resnet / Attn blocks (HCodec vq/conv.py:259-338)
# ---------------------------------------------------------------------------

class ResnetBlock(nn.Module):
    """GroupNorm(32) + swish + conv3, twice, with 1x1 shortcut on dim change."""

    in_channels: int
    out_channels: Optional[int] = None
    dropout: float = 0.1
    causal: bool = False
    deterministic: bool = True

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.in_channels
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = swish(h)
        h = CausalConv1d(out_ch, 3, causal=self.causal, name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=self.deterministic)(h)
        h = CausalConv1d(out_ch, 3, causal=self.causal, name="conv2")(h)
        if self.in_channels != out_ch:
            x = CausalConv1d(out_ch, 1, causal=self.causal, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head 1x1-conv attention with GroupNorm (vq/conv.py:307-338)."""

    in_channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = CausalConv1d(self.in_channels, 1, name="q")(h)
        k = CausalConv1d(self.in_channels, 1, name="k")(h)
        v = CausalConv1d(self.in_channels, 1, name="v")(h)
        w = jnp.einsum("btc,bsc->bts", q, k) * self.in_channels**-0.5
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        h = jnp.einsum("bts,bsc->btc", w, v)
        h = CausalConv1d(self.in_channels, 1, name="proj_out")(h)
        return x + h


# ---------------------------------------------------------------------------
# Snake / DAC units / WaveGenerator blocks (layers.py:24-73, wave_generator.py)
# ---------------------------------------------------------------------------

class Snake1d(nn.Module):
    """x + sin^2(alpha x)/alpha periodic activation (layers.py:33-48)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1, 1, self.channels))
        return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x))


class DACResidualUnit(nn.Module):
    """Snake -> WNConv k7 dilated (same pad) -> Snake -> WNConv k1, residual
    (layers.py:51-67)."""

    dim: int
    dilation: int = 1
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, name="snake1")(x)
        y = Conv1d(self.dim, 7, dilation=self.dilation, padding=pad,
                   weight_norm=self.weight_norm, name="conv1")(y)
        y = Snake1d(self.dim, name="snake2")(y)
        y = Conv1d(self.dim, 1, padding=0, weight_norm=self.weight_norm,
                   name="conv2")(y)
        return x + y


class WaveDecoderBlock(nn.Module):
    """Snake -> WNConvTranspose (k, s, pad=(k-s)//2) -> 3 dilated residual units
    (wave_generator.py:32-56)."""

    output_dim: int
    kernel_size: int
    stride: int
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = Snake1d(x.shape[-1], name="snake")(x)
        x = ConvTranspose1d(
            self.output_dim, self.kernel_size, self.stride,
            padding=(self.kernel_size - self.stride) // 2, output_padding=0,
            weight_norm=self.weight_norm, name="upconv",
        )(x)
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.output_dim, dilation=d,
                                weight_norm=self.weight_norm, name=f"res_{i}")(x)
        return x


class WaveGenerator(nn.Module):
    """DAC-style vocoder head (wave_generator.py:59-91)."""

    input_channel: int
    channels: int
    rates: Sequence[int]
    kernel_sizes: Sequence[int]
    d_out: int = 1
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.channels, 7, padding=3, weight_norm=self.weight_norm,
                   name="conv_pre")(x)
        dim = self.channels
        for i, (k, s) in enumerate(zip(self.kernel_sizes, self.rates)):
            dim = self.channels // 2 ** (i + 1)
            x = WaveDecoderBlock(dim, k, s, weight_norm=self.weight_norm,
                                 name=f"block_{i}")(x)
        x = Snake1d(dim, name="snake_post")(x)
        x = Conv1d(self.d_out, 7, padding=3, weight_norm=self.weight_norm,
                   name="conv_post")(x)
        return jnp.tanh(x)


# ---------------------------------------------------------------------------
# SamplingBlock (samper.py:22-100)
# ---------------------------------------------------------------------------

class SamplingBlock(nn.Module):
    """Learned resampler: conv/deconv paths summed with repeat / avg-pool skips.
    Input (B, T, C) -> output (B, T*up/down, C)."""

    dim: int
    groups: int = 1
    upsample_scale: int = 1
    downsample_scale: int = 1

    @nn.compact
    def __call__(self, x):
        up, down = self.upsample_scale, self.downsample_scale
        if up > 1:
            y = nn.leaky_relu(x, 0.2)
            deconv = ConvTranspose1d(
                self.dim, kernel_size=up * 2, stride=up,
                padding=up // 2 + up % 2, output_padding=up % 2,
                groups=self.groups, name="de_conv_upsampler",
            )(y)
            repeat = jnp.repeat(x, up, axis=-2)
            merged = repeat + deconv
        else:
            merged = x
            repeat = x

        if down > 1:
            y = nn.leaky_relu(merged, 0.2)
            conv = Conv1d(
                self.dim, kernel_size=2 * down, stride=down,
                padding=down // 2 + down % 2, groups=self.groups,
                name="conv_downsampler",
            )(y)
            skip2 = nn.avg_pool(merged, (down,), strides=(down,))
            skip1 = nn.avg_pool(repeat, (down,), strides=(down,))
        else:
            conv, skip2, skip1 = merged, merged, repeat
        return conv + skip1 + skip2


# ---------------------------------------------------------------------------
# Vocos backbone (vocos.py:273-335)
# ---------------------------------------------------------------------------

class VocosBackbone(nn.Module):
    """Embed conv k7 -> (Ada)LN -> N ConvNeXt blocks -> final LN."""

    dim: int
    intermediate_dim: int
    num_layers: int
    layer_scale_init_value: Optional[float] = None
    condition_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, condition=None):
        x = Conv1d(self.dim, 7, padding=3, name="embed")(x)
        if self.condition_dim is not None:
            x = AdaLayerNorm(self.dim, name="norm")(x, condition)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        scale = self.layer_scale_init_value or 1.0 / self.num_layers
        x = ConvNeXtStack(
            dim=self.dim,
            intermediate_dim=self.intermediate_dim,
            num_layers=self.num_layers,
            layer_scale_init_value=scale,
            condition_dim=self.condition_dim,
            name="convnext",
        )(x, condition)
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)


# ---------------------------------------------------------------------------
# SEANet (seanet.py:34-302)
# ---------------------------------------------------------------------------

class SEANetResnetBlock(nn.Module):
    """ELU + SConv residual block, compressed hidden (seanet.py:34-76)."""

    dim: int
    kernel_sizes: Tuple[int, ...] = (3, 1)
    dilations: Tuple[int, ...] = (1, 1)
    causal: bool = False
    pad_mode: str = "reflect"
    compress: int = 2
    true_skip: bool = True
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        h = x
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            out_ch = self.dim if i == n - 1 else hidden
            h = nn.elu(h)
            h = SConv1d(
                out_ch, k, dilation=d, causal=self.causal,
                pad_mode=self.pad_mode, weight_norm=self.weight_norm,
                name=f"block_{i}",
            )(h)
        if self.true_skip:
            shortcut = x
        else:
            shortcut = SConv1d(
                self.dim, 1, causal=self.causal, pad_mode=self.pad_mode,
                weight_norm=self.weight_norm, name="shortcut",
            )(x)
        return shortcut + h


class SEANetEncoder(nn.Module):
    """EnCodec-style strided downsampler with a 2-layer hybrid transformer
    before the final stride-2 conv (seanet.py:79-208 as configured by
    HCodec-1.0 vq/codec.py:30-35 — hop 8*5*4*2*2 = 640)."""

    channels: int = 1
    dimension: int = 512
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)  # applied reversed: 2,4,5,8
    kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    transformer_layers: int = 2
    transformer_heads: int = 8
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        ratios = list(reversed(list(self.ratios)))
        mult = 1
        x = SConv1d(
            mult * self.n_filters, self.kernel_size, causal=self.causal,
            pad_mode=self.pad_mode, weight_norm=self.weight_norm, name="conv_in",
        )(x)
        for i, ratio in enumerate(ratios):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base**j, 1),
                    causal=self.causal, pad_mode=self.pad_mode,
                    compress=self.compress, true_skip=self.true_skip,
                    weight_norm=self.weight_norm, name=f"res_{i}_{j}",
                )(x)
            x = nn.elu(x)
            x = SConv1d(
                mult * self.n_filters * 2, kernel_size=ratio * 2, stride=ratio,
                causal=self.causal, pad_mode=self.pad_mode,
                weight_norm=self.weight_norm, name=f"down_{i}",
            )(x)
            mult *= 2
        x = Transformer(
            hidden_size=self.dimension,
            intermediate_size=self.dimension * 4,
            num_heads=self.transformer_heads,
            num_layers=self.transformer_layers,
            causal=self.causal,
            name="transformer",
        )(x)
        x = nn.elu(x)
        x = SConv1d(
            self.dimension, kernel_size=4, stride=2, causal=self.causal,
            pad_mode=self.pad_mode, weight_norm=self.weight_norm, name="conv_out",
        )(x)
        return x


class SEANetDecoder(nn.Module):
    """Mirror decoder (seanet.py:211-302); kept for capability parity."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    causal: bool = False
    pad_mode: str = "reflect"
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    trim_right_ratio: float = 1.0
    weight_norm: bool = True

    @nn.compact
    def __call__(self, z):
        mult = int(2 ** len(self.ratios))
        x = SConv1d(
            mult * self.n_filters, self.kernel_size, causal=self.causal,
            pad_mode=self.pad_mode, weight_norm=self.weight_norm, name="conv_in",
        )(z)
        if self.lstm:
            x = SLSTM(mult * self.n_filters, num_layers=self.lstm, name="lstm")(x)
        for i, ratio in enumerate(self.ratios):
            x = nn.elu(x)
            x = SConvTranspose1d(
                mult * self.n_filters // 2, kernel_size=ratio * 2, stride=ratio,
                causal=self.causal, trim_right_ratio=self.trim_right_ratio,
                weight_norm=self.weight_norm, name=f"up_{i}",
            )(x)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base**j, 1),
                    causal=self.causal, pad_mode=self.pad_mode,
                    compress=self.compress, true_skip=self.true_skip,
                    weight_norm=self.weight_norm, name=f"res_{i}_{j}",
                )(x)
            mult //= 2
        x = nn.elu(x)
        x = SConv1d(
            self.channels, self.last_kernel_size, causal=self.causal,
            pad_mode=self.pad_mode, weight_norm=self.weight_norm, name="conv_out",
        )(x)
        return x


# ---------------------------------------------------------------------------
# HiFiGAN ResBlock1 / Vocos ResNet backbone (vocos.py:113-254, 338-373)
# ---------------------------------------------------------------------------

class ResBlock1(nn.Module):
    """Dilated HiFiGAN-V1 residual block without upsampling
    (vocos.py:113-254): 3x (lrelu -> dilated WNConv -> lrelu -> WNConv),
    optional per-branch layer scale."""

    dim: int
    kernel_size: int = 3
    dilations: Tuple[int, int, int] = (1, 3, 5)
    lrelu_slope: float = 0.1
    layer_scale_init_value: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, self.lrelu_slope)
            h = Conv1d(self.dim, self.kernel_size, dilation=d,
                       weight_norm=True, name=f"conv1_{i}")(h)
            h = nn.leaky_relu(h, self.lrelu_slope)
            h = Conv1d(self.dim, self.kernel_size, weight_norm=True,
                       name=f"conv2_{i}")(h)
            if self.layer_scale_init_value is not None:
                gamma = self.param(
                    f"gamma_{i}",
                    nn.initializers.constant(self.layer_scale_init_value),
                    (self.dim,),
                )
                h = gamma * h
            x = x + h
        return x


class VocosResNetBackbone(nn.Module):
    """WNConv embed + N ResBlock1 (vocos.py:338-373)."""

    dim: int
    num_blocks: int
    layer_scale_init_value: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.dim, 3, weight_norm=True, name="embed")(x)
        scale = self.layer_scale_init_value or 1.0 / self.num_blocks / 3
        for i in range(self.num_blocks):
            x = ResBlock1(self.dim, layer_scale_init_value=scale,
                          name=f"resnet_{i}")(x)
        return x
