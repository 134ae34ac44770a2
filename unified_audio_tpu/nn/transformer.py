"""Transformer building blocks: RoPE, RMSNorm, gated MLP, DeepSeek-style MoE,
and the HCodec hybrid LSTM-attention transformer.

Reference parity: HCodec-1.0 vq/encoder_modules/transformer.py (RoPE :8-75,
RMSNorm :77-96, hybrid Attention :99-215, MLP :218-226, MoE/Gate :230-336,
Transformer :396-489). TPU-native choices: fp32 softmax, additive -inf masks
built from broadcasted iota (no bool scatter), dense expert dispatch for the
tiny routed-expert counts used here (static shapes beat dynamic gather/scatter
on the MXU at this scale).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .recurrent import LSTM

NEG_INF = -1e9  # large-negative instead of -inf: avoids NaN rows on fully masked


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(positions: jnp.ndarray, dim: int, theta: float = 10000.0):
    """cos/sin tables for GPT-NeoX style RoPE.

    positions: (..., T) int/float -> cos, sin each (..., T, dim).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )  # (dim/2,)
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., T, dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """q, k: (B, T, H, D); cos/sin: (T, D) or (B, T, D).

    The rotation runs in the cos/sin dtype (fp32 tables) but the outputs
    keep q/k's dtype: under bf16 inference the fp32 tables must not
    promote everything downstream of the attention to fp32 (a silent 2x
    HBM-traffic leak through every transformer block) — a no-op on fp32."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    q = (q * cos + rotate_half(q) * sin).astype(q.dtype)
    k = (k * cos + rotate_half(k) * sin).astype(k.dtype)
    return q, k


# ---------------------------------------------------------------------------
# Norms / MLPs
# ---------------------------------------------------------------------------

class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        return x * weight


class GatedMLP(nn.Module):
    """w2(silu(w1 x) * w3 x) — transformer.py:218-226."""

    inter_dim: int

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w1 = nn.Dense(self.inter_dim, use_bias=False, name="w1")
        w2 = nn.Dense(dim, use_bias=False, name="w2")
        w3 = nn.Dense(self.inter_dim, use_bias=False, name="w3")
        return w2(jax.nn.silu(w1(x)) * w3(x))


class MoE(nn.Module):
    """Routed experts + shared expert, softmax top-k gate with bias
    (transformer.py:230-336). Experts are STACKED parameters (E, ...) computed
    with one batched einsum per projection — static shapes, MXU-batched, and
    the expert axis shards directly for expert parallelism
    (parallel/mesh.py EP rules shard axis 0 of expert_w1/w2/w3)."""

    inter_dim: int
    n_routed_experts: int = 3
    n_activated_experts: int = 1
    n_shared_experts: int = 1
    route_scale: float = 1.0
    score_func: str = "softmax"

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        e, inter = self.n_routed_experts, self.inter_dim
        scores = nn.Dense(e, use_bias=False, name="gate_linear")(x)
        if self.score_func == "softmax":
            scores = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        else:
            scores = jax.nn.sigmoid(scores)
        original_scores = scores
        gate_bias = self.param("gate_bias", nn.initializers.zeros, (e,))
        scores = scores + gate_bias
        # top-k selection -> dense one-hot combine weights
        _, top_idx = jax.lax.top_k(scores, self.n_activated_experts)
        onehot = jax.nn.one_hot(top_idx, e, dtype=x.dtype)
        weights = (
            jnp.sum(onehot * original_scores[..., None, :].astype(x.dtype), axis=-1)
        )  # (..., k)
        if self.score_func == "sigmoid":
            weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
        weights = weights * self.route_scale
        combine = jnp.sum(onehot * weights[..., None], axis=-2)  # (..., E)

        init = nn.initializers.lecun_normal()
        w1 = self.param("expert_w1", init, (e, dim, inter))
        w3 = self.param("expert_w3", init, (e, dim, inter))
        w2 = self.param("expert_w2", init, (e, inter, dim))
        h = jax.nn.silu(jnp.einsum("...d,edi->...ei", x, w1)) * jnp.einsum(
            "...d,edi->...ei", x, w3
        )  # (..., E, I)
        y_e = jnp.einsum("...ei,eid->...ed", h, w2)  # (..., E, D)
        y = jnp.einsum("...ed,...e->...d", y_e, combine)
        z = GatedMLP(self.n_shared_experts * self.inter_dim, name="shared_expert")(x)
        return y + z


# ---------------------------------------------------------------------------
# Masks (additive, built from iota — no python loops, no bool scatters)
# ---------------------------------------------------------------------------

def causal_mask(t: int, dtype=jnp.float32) -> jnp.ndarray:
    """(T, T) additive mask, 0 where visible, NEG_INF above the diagonal."""
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    return jnp.where(col <= row, 0.0, NEG_INF).astype(dtype)


def sliding_window_mask(t: int, left_context: int, dtype=jnp.float32) -> jnp.ndarray:
    """Causal mask limited to ``left_context`` past positions
    (transformer.py:437-440)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    visible = (col <= row) & (col > row - left_context)
    return jnp.where(visible, 0.0, NEG_INF).astype(dtype)


def attend(q, k, v, mask: Optional[jnp.ndarray], scale: float):
    """Softmax attention, fp32 accumulation. q,k,v: (B, T, H, D);
    mask additive (T, T) / (B, T, T) / (B, H, T, S) or None."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None]
        elif mask.ndim == 3:
            mask = mask[:, None]
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# HCodec hybrid transformer
# ---------------------------------------------------------------------------

class HybridAttention(nn.Module):
    """LSTM-fed attention (transformer.py:99-157): an LSTM precedes the QKV
    projections, giving the block local recurrence plus global attention."""

    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, mask, cos, sin):
        hidden = x.shape[-1]
        x = LSTM(hidden_size=hidden, num_layers=1, name="rnn")(x)
        shape = (*x.shape[:-1], self.num_heads, self.head_dim)
        q = nn.Dense(self.num_heads * self.head_dim, name="q_proj")(x).reshape(shape)
        k = nn.Dense(self.num_heads * self.head_dim, name="k_proj")(x).reshape(shape)
        v = nn.Dense(self.num_heads * self.head_dim, name="v_proj")(x).reshape(shape)
        q, k = apply_rope(q, k, cos, sin)
        out = attend(q, k, v, mask, self.head_dim**-0.5)
        out = out.reshape(*x.shape[:-1], self.num_heads * self.head_dim)
        return nn.Dense(hidden, use_bias=False, name="o_proj")(out)


class TransformerLayer(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    head_dim: int
    use_moe: bool = False
    moe_experts: int = 3
    moe_topk: int = 1

    @nn.compact
    def __call__(self, x, mask, cos, sin):
        h = x + HybridAttention(
            num_heads=self.num_heads, head_dim=self.head_dim, name="self_attn"
        )(RMSNorm(self.hidden_size, name="input_layernorm")(x), mask, cos, sin)
        mlp_cls = (
            MoE(self.intermediate_size, n_routed_experts=self.moe_experts,
                n_activated_experts=self.moe_topk, name="mlp")
            if self.use_moe
            else GatedMLP(self.intermediate_size, name="mlp")
        )
        return h + mlp_cls(RMSNorm(self.hidden_size, name="post_attention_layernorm")(h))


class Transformer(nn.Module):
    """HCodec in-codec transformer (transformer.py:396-489): N hybrid layers,
    shared RoPE, optional causal / sliding-window masking."""

    hidden_size: int
    intermediate_size: int
    num_heads: int
    num_layers: int
    head_dim: Optional[int] = None
    use_moe: bool = False
    moe_experts: int = 3
    moe_topk: int = 1
    rope_theta: float = 10000.0
    causal: bool = False
    use_sliding_window: bool = False
    left_context: int = 0

    @nn.compact
    def __call__(self, x):
        t = x.shape[-2]
        head_dim = self.head_dim or self.hidden_size // self.num_heads
        cos, sin = rope_cos_sin(jnp.arange(t), head_dim, self.rope_theta)
        mask = None
        if self.causal:
            mask = (
                sliding_window_mask(t, self.left_context)
                if self.use_sliding_window
                else causal_mask(t)
            )
        for i in range(self.num_layers):
            x = TransformerLayer(
                hidden_size=self.hidden_size,
                intermediate_size=self.intermediate_size,
                num_heads=self.num_heads,
                head_dim=head_dim,
                use_moe=self.use_moe,
                moe_experts=self.moe_experts,
                moe_topk=self.moe_topk,
                name=f"layers_{i}",
            )(x, mask, cos, sin)
        return x
