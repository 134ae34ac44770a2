"""Weight-compatible Mimi/Kyutai transformer blocks for the HCodec-1.5 line.

The adaptive codec's aggregators and decode bottleneck are Mimi
``StreamingTransformer`` stacks (HCodec-1.5 adaptive/model_blocks/mimi/
transformer.py:294-906) at a config where ``causal=False`` — offline that is
FULL bidirectional attention (transformer.py:409-415: ``attn_bias=None`` when
not causal; the ``context`` knob only shapes the causal mask / streaming
ring). This module reimplements exactly that layer, parameter-for-parameter,
so the reference's released ``hcode_1.5_adaptive_4+4.pt`` converts directly:

* pre-norm LayerNorm (eps 1e-5, transformer.py:114-115)
* fused qkv ``in_proj`` (3D x D, no bias, :339-345) + ``out_proj`` (no bias)
* interleaved-pair RoPE (module/rope.py:12-70 — NOT the half-split HF
  convention used elsewhere in this repo)
* LayerScale on both residual branches (:69-101, init 0.01)
* plain GELU MLP ``linear1``/``linear2`` (no bias, gating="none", :515-519)

``nn/streaming.py`` remains the TPU-native streaming stack (ring-KV state
threading) for the Mimi capability line (H16); this module is the
reference-checkpoint-compatible offline path.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .transformer import NEG_INF


def rope_interleaved(x: jnp.ndarray, positions: jnp.ndarray,
                     max_period: float = 10000.0) -> jnp.ndarray:
    """Mimi RoPE: rotate interleaved (even, odd) pairs (rope.py:38-70).

    x (B, S, H, D), positions (S,) -> same shape.
    """
    d = x.shape[-1]
    assert d % 2 == 0, f"rope head_dim must be even, got {d}" 
    ds = jnp.arange(d // 2, dtype=jnp.float32)
    freqs = jnp.exp(ds * (-np.log(max_period) * 2.0 / d))
    angles = positions.astype(jnp.float32)[:, None] * freqs  # (S, D/2)
    rotr = jnp.cos(angles)[None, :, None, :]
    roti = jnp.sin(angles)[None, :, None, :]
    xr = x[..., 0::2].astype(jnp.float32)
    xi = x[..., 1::2].astype(jnp.float32)
    yr = xr * rotr - xi * roti
    yi = xr * roti + xi * rotr
    out = jnp.stack([yr, yi], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class MimiTransformerLayer(nn.Module):
    """One StreamingTransformerLayer (transformer.py:436-593), offline."""

    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    causal: bool = False
    context: Optional[int] = None
    layer_scale: Optional[float] = 0.01
    max_period: float = 10000.0

    @nn.compact
    def __call__(self, x, key_valid=None):
        """x (B, S, D); key_valid (B, S) bool marks positions that exist
        (static-shape padding is EXCLUDED from attention — the reference
        runs unpadded at batch 1; see models/hcodec/adaptive.py)."""
        d, h = self.d_model, self.num_heads
        hd = d // h
        b, s, _ = x.shape

        hidd = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * d, use_bias=False, name="in_proj")(hidd)
        # torch rearrange "b t (p h d) -> p b h t d": p-major packing
        qkv = qkv.reshape(b, s, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, S, H, hd)
        pos = jnp.arange(s)
        q = rope_interleaved(q, pos, self.max_period)
        k = rope_interleaved(k, pos, self.max_period)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        mask = jnp.zeros((1, 1, s, s), logits.dtype)
        if self.causal:
            delta = pos[:, None] - pos[None, :]
            vis = delta >= 0
            if self.context is not None:
                vis &= delta < self.context
            mask = jnp.where(vis, 0.0, NEG_INF)[None, None]
        if key_valid is not None:
            mask = mask + jnp.where(key_valid, 0.0, NEG_INF)[:, None, None, :]
        logits = logits + mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        attended = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        update = nn.Dense(d, use_bias=False, name="out_proj")(attended)
        if self.layer_scale is not None:
            scale1 = self.param(
                "layer_scale_1",
                nn.initializers.constant(self.layer_scale), (d,))
            update = update * scale1
        x = x + update

        hidd = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        ff = nn.Dense(self.dim_feedforward, use_bias=False,
                      name="linear1")(hidd)
        ff = jax.nn.gelu(ff, approximate=False)  # torch F.gelu is erf-exact
        ff = nn.Dense(d, use_bias=False, name="linear2")(ff)
        if self.layer_scale is not None:
            scale2 = self.param(
                "layer_scale_2",
                nn.initializers.constant(self.layer_scale), (d,))
            ff = ff * scale2
        return x + ff


class MimiTransformer(nn.Module):
    """Layer stack under nn.scan (one layer body in the HLO — required for
    the 32-layer configs on the remote compiler, CLAUDE.md #3)."""

    d_model: int
    num_layers: int
    num_heads: int = 8
    dim_feedforward: int = 2048
    causal: bool = False
    context: Optional[int] = None
    layer_scale: Optional[float] = 0.01

    @nn.compact
    def __call__(self, x, key_valid=None):
        scan = nn.scan(
            _ScanLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=self.num_layers,
        )
        x, _ = scan(
            self.d_model, self.num_heads, self.dim_feedforward,
            self.causal, self.context, self.layer_scale, name="layers",
        )(x, key_valid)
        return x


class _ScanLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    causal: bool
    context: Optional[int]
    layer_scale: Optional[float]

    @nn.compact
    def __call__(self, x, key_valid):
        y = MimiTransformerLayer(
            self.d_model, self.num_heads, self.dim_feedforward,
            self.causal, self.context, self.layer_scale, name="layer",
        )(x, key_valid)
        return y, None


class MimiProjectedTransformer(nn.Module):
    """ProjectedTransformer (transformer.py:828-906): optional no-bias
    input/output projections (identity when dims match — as in both the
    aggregator and bottleneck configs). Channels-last (B, T, C); the
    reference's ``conv_layout`` transpose is the caller's concern."""

    d_model: int
    input_dim: int
    output_dim: int
    num_layers: int
    num_heads: int = 8
    dim_feedforward: int = 2048
    causal: bool = False
    context: Optional[int] = None
    layer_scale: Optional[float] = 0.01

    @nn.compact
    def __call__(self, x, key_valid=None):
        if self.input_dim != self.d_model:
            x = nn.Dense(self.d_model, use_bias=False, name="input_proj")(x)
        x = MimiTransformer(
            self.d_model, self.num_layers, self.num_heads,
            self.dim_feedforward, self.causal, self.context,
            self.layer_scale, name="transformer",
        )(x, key_valid)
        if self.output_dim != self.d_model:
            x = nn.Dense(self.output_dim, use_bias=False,
                         name="output_proj")(x)
        return x
