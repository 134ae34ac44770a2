"""1-D convolution primitives with codec padding semantics, channels-last.

Everything in this framework runs (B, T, C) — channels on the TPU lane
dimension — instead of torch's (B, C, T). Three padding families exist in the
reference and all are reproduced exactly (token-ID parity depends on them):

* EnCodec streaming convs (``SConv1d``/``SConvTranspose1d``): causal left-pad or
  asymmetric reflect pad with "extra padding" so the last window is full —
  semantics of HCodec-1.0 vq/encoder_modules/conv.py:54-253.
* HCodec constant-pad convs (``CausalConv1d``): odd kernels, constant pad
  ``(dk - stride, 0)`` causal / ``(dk//2, dk//2)`` otherwise — vq/conv.py:33-55.
* Sub-pixel transposed conv (``SubPixelConvTranspose1d``): 1x1 conv to C*stride,
  interleave, depthwise conv — vq/conv.py:58-91.

Weight norm is a parametrization (kernel = g * v/||v||) so GAN training matches
the reference recipe; converters can fold it for inference.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# Padding math (EnCodec semantics)
# ---------------------------------------------------------------------------

def get_extra_padding_for_conv1d(
    length: int, kernel_size: int, stride: int, padding_total: int = 0
) -> int:
    """Extra right-padding so the last conv window is full (static shape math)."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return ideal_length - length


def pad1d(
    x: jnp.ndarray,
    paddings: Tuple[int, int],
    mode: str = "constant",
    value: float = 0.0,
) -> jnp.ndarray:
    """Pad the time axis of (B, T, C); reflect-pads small inputs safely by
    zero-extending first (mirrors pad1d in conv.py:79-96)."""
    left, right = paddings
    assert left >= 0 and right >= 0, paddings
    spec = [(0, 0)] * (x.ndim - 2) + [(left, right), (0, 0)]
    if mode == "reflect":
        length = x.shape[-2]
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, extra), (0, 0)])
        out = jnp.pad(x, spec, mode="reflect")
        if extra:
            out = out[..., : out.shape[-2] - extra, :]
        return out
    return jnp.pad(x, spec, mode="constant", constant_values=value)


def unpad1d(x: jnp.ndarray, paddings: Tuple[int, int]) -> jnp.ndarray:
    left, right = paddings
    end = x.shape[-2] - right
    return x[..., left:end, :]


# ---------------------------------------------------------------------------
# Weight-normed conv kernels
# ---------------------------------------------------------------------------

def _wn_kernel(module: nn.Module, shape, use_weight_norm: bool, name="kernel"):
    """Create a (possibly weight-normed) conv kernel param of shape (K, Cin, Cout).

    Weight norm normalizes over (K, Cin) per output channel, matching torch's
    weight_norm(dim=0) on an (out, in, K) tensor.
    """
    init = nn.initializers.lecun_normal()
    if not use_weight_norm:
        return module.param(name, init, shape)
    v = module.param(f"{name}_v", init, shape)
    norm_init = lambda key, s: jnp.linalg.norm(
        init(key, shape).reshape(-1, shape[-1]), axis=0
    )
    g = module.param(f"{name}_g", norm_init, (shape[-1],))
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    return v * (g / norm)


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    padding="VALID",
) -> jnp.ndarray:
    """(B, T, Cin) x (K, Cin/groups, Cout) -> (B, T', Cout)."""
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=padding if isinstance(padding, str) else [padding],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )


def conv_transpose1d(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int
) -> jnp.ndarray:
    """Full (padding=0) transposed conv matching torch ConvTranspose1d.

    kernel: (K, Cin, Cout). Implemented as input-dilated conv with the kernel
    flipped along K — output length (T-1)*stride + K.
    """
    k = kernel.shape[0]
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(kernel, axis=0),
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class Conv1d(nn.Module):
    """Plain conv with explicit symmetric (torch-style ``padding=``) behavior."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding: Optional[int] = None  # None -> torch default (k-1)//2*dilation
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if pad is None:
            pad = (self.kernel_size - 1) // 2 * self.dilation
        cin = x.shape[-1]
        kernel = _wn_kernel(
            self,
            (self.kernel_size, cin // self.groups, self.features),
            self.weight_norm,
        )
        y = conv1d(
            x, kernel, self.stride, self.dilation, self.groups, padding=(pad, pad)
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class CausalConv1d(nn.Module):
    """HCodec constant-pad conv (vq/conv.py:33-55): odd kernel; causal pads
    (dk - stride, 0), else (dk//2, dk//2) with zeros."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        assert self.kernel_size % 2 == 1, "kernel_size must be odd"
        dk = (self.kernel_size - 1) * self.dilation + 1
        if self.causal:
            pads = (dk - self.stride, 0)
        else:
            pads = (dk // 2, dk // 2)
        x = pad1d(x, pads, mode="constant")
        cin = x.shape[-1]
        kernel = _wn_kernel(
            self,
            (self.kernel_size, cin // self.groups, self.features),
            self.weight_norm,
        )
        y = conv1d(x, kernel, self.stride, self.dilation, self.groups)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class SubPixelConvTranspose1d(nn.Module):
    """Streaming-friendly transposed conv (vq/conv.py:58-91): pointwise conv to
    C*stride, interleave along time, pad, depthwise conv."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    causal: bool = False
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        assert self.kernel_size % 2 == 1, "kernel_size must be odd"
        b, t, _ = x.shape
        up_kernel = _wn_kernel(
            self, (1, x.shape[-1], self.features * self.stride), self.weight_norm, "up_kernel"
        )
        y = conv1d(x, up_kernel)
        y = y + self.param("up_bias", nn.initializers.zeros, (self.features * self.stride,))
        # (B, T, stride*C) -> (B, T*stride, C): torch unflattens channel dim as
        # (stride, C) then interleaves time-major.
        y = y.reshape(b, t, self.stride, self.features).reshape(
            b, t * self.stride, self.features
        )
        dk = (self.kernel_size - 1) * self.dilation + 1
        pads = (dk - 1, 0) if self.causal else (dk // 2, dk // 2)
        y = pad1d(y, pads, mode="constant")
        dw_kernel = _wn_kernel(
            self, (self.kernel_size, 1, self.features), self.weight_norm, "dw_kernel"
        )
        y = conv1d(y, dw_kernel, dilation=self.dilation, groups=self.features)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class SConv1d(nn.Module):
    """EnCodec streaming conv (conv.py:175-211): causal left-pad or asymmetric
    reflect pad, plus extra right padding for a full last window."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    causal: bool = False
    pad_mode: str = "reflect"
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        length = x.shape[-2]
        dk = (self.kernel_size - 1) * self.dilation + 1
        padding_total = dk - self.stride
        extra = get_extra_padding_for_conv1d(length, dk, self.stride, padding_total)
        if self.causal:
            x = pad1d(x, (padding_total, extra), mode=self.pad_mode)
        else:
            pr = padding_total // 2
            pl = padding_total - pr
            x = pad1d(x, (pl, pr + extra), mode=self.pad_mode)
        cin = x.shape[-1]
        kernel = _wn_kernel(
            self,
            (self.kernel_size, cin // self.groups, self.features),
            self.weight_norm,
        )
        y = conv1d(x, kernel, self.stride, self.dilation, self.groups)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class SConvTranspose1d(nn.Module):
    """EnCodec streaming transposed conv (conv.py:214-253): full conv-transpose
    then trim ``kernel - stride`` (right under causal, asymmetric otherwise)."""

    features: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    causal: bool = False
    trim_right_ratio: float = 1.0
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = _wn_kernel(
            self, (self.kernel_size, cin, self.features), self.weight_norm
        )
        y = conv_transpose1d(x, kernel, self.stride)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        padding_total = self.kernel_size - self.stride
        if self.causal:
            pr = math.ceil(padding_total * self.trim_right_ratio)
            pl = padding_total - pr
        else:
            pr = padding_total // 2
            pl = padding_total - pr
        return unpad1d(y, (pl, pr))


class ConvTranspose1d(nn.Module):
    """torch-style ConvTranspose1d with explicit padding/output_padding
    (used by BiCodec SamplingBlock and WaveGenerator)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Optional[int] = None  # None -> (stride+1)//2 (semantic_module.py:97-100)
    output_padding: Optional[int] = None
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else (self.stride + 1) // 2
        opad = (
            self.output_padding
            if self.output_padding is not None
            else (1 if self.stride % 2 else 0)
        )
        cin = x.shape[-1]
        if self.groups == 1:
            kernel = _wn_kernel(
                self, (self.kernel_size, cin, self.features), self.weight_norm
            )
            y = conv_transpose1d(x, kernel, self.stride)
        else:
            assert cin == self.features and cin == self.groups, "only depthwise groups"
            kernel = _wn_kernel(
                self, (self.kernel_size, 1, self.features), self.weight_norm
            )
            k = kernel.shape[0]
            y = jax.lax.conv_general_dilated(
                x,
                jnp.flip(kernel, axis=0),
                window_strides=(1,),
                padding=[(k - 1, k - 1)],
                lhs_dilation=(self.stride,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        # torch: out_len = (T-1)*s - 2*pad + K + output_padding; the full
        # transpose above has length (T-1)*s + K, so trim pad on the left and
        # pad - output_padding on the right.
        assert pad >= opad, (pad, opad)
        return unpad1d(y, (pad, pad - opad))
