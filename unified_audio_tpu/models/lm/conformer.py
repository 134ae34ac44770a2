"""Conformer condition encoder (UniSE model/llm/conformer.py:21-502).

The reference instantiates this as the mel-conditioning encoder of
CustomLlamaModel (llm.py:52-54) but bypasses it in LLM_SFT (llm_sft.py:62-66,
the adapter reads WavLM features directly). It remains part of the model
surface and checkpoint layout, so it is provided here: rotary-embedding
conformer blocks (half-FFN -> MHSA -> depthwise-conv module -> half-FFN -> LN).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.conv import CausalConv1d, Conv1d
from ...nn.transformer import RMSNorm, apply_rope, attend, rope_cos_sin


class ConformerFeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(self.dim * self.mult, name="ff1")(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.dim, name="ff2")(h)


class ConformerConvModule(nn.Module):
    """LN -> pointwise GLU -> depthwise conv -> swish -> pointwise."""

    dim: int
    kernel_size: int = 31

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(self.dim * 2, name="pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        h = CausalConv1d(self.dim, self.kernel_size, groups=self.dim,
                         causal=False, name="dwconv")(h)
        h = jax.nn.silu(nn.LayerNorm(name="dwnorm")(h))
        return nn.Dense(self.dim, name="pw2")(h)


class ConformerAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, cos, sin):
        b, t, _ = x.shape
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)
        q = q.reshape(b, t, self.heads, self.dim_head)
        k = k.reshape(b, t, self.heads, self.dim_head)
        v = v.reshape(b, t, self.heads, self.dim_head)
        q, k = apply_rope(q, k, cos, sin)
        out = attend(q, k, v, None, self.dim_head**-0.5)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(
            out.reshape(b, t, inner)
        )


class JointAttention(nn.Module):
    """MM-DiT style joint attention (the reference's JointAttnProcessor,
    conformer.py:192-302 — instantiated nowhere in the shipped configs but
    part of the module surface): the sample stream ``x`` and a context
    stream ``c`` get separate q/k/v projections, attend JOINTLY over the
    concatenated sequence, then split back to per-stream output projections.
    RoPE applies to each stream's positions independently; ``mask`` (B, N)
    masks padded sample positions (context is never masked).

    Returns ``(x_out, c_out)``; ``c_out`` is None when ``context_pre_only``
    (the reference skips to_out_c in that case).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    context_pre_only: bool = False

    @nn.compact
    def __call__(self, x, c, mask=None, rope=None, c_rope=None):
        b, n, _ = x.shape
        nt = c.shape[1]
        h, hd = self.heads, self.dim_head
        inner = h * hd

        def proj(y, t, name):
            return nn.Dense(inner, use_bias=False, name=name)(y).reshape(
                b, t, h, hd)

        q = proj(x, n, "to_q")
        k = proj(x, n, "to_k")
        v = proj(x, n, "to_v")
        cq = proj(c, nt, "to_q_c")
        ck = proj(c, nt, "to_k_c")
        cv = proj(c, nt, "to_v_c")

        if rope is not None:
            q, k = apply_rope(q, k, *rope)
        if c_rope is not None:
            cq, ck = apply_rope(cq, ck, *c_rope)

        q = jnp.concatenate([q, cq], axis=1)
        k = jnp.concatenate([k, ck], axis=1)
        v = jnp.concatenate([v, cv], axis=1)

        attn_mask = None
        if mask is not None:
            keep = jnp.concatenate(
                [mask, jnp.ones((b, nt), bool)], axis=1)  # context unmasked
            attn_mask = jnp.where(keep, 0.0, -1e9)[:, None, None, :]

        out = attend(q, k, v, attn_mask, hd**-0.5).reshape(b, n + nt, inner)
        x_out = nn.Dense(self.dim, use_bias=False, name="to_out")(out[:, :n])
        if mask is not None:
            x_out = jnp.where(mask[..., None], x_out, 0.0)
        c_out = None
        if not self.context_pre_only:
            c_out = nn.Dense(self.dim, use_bias=False, name="to_out_c")(
                out[:, n:])
        return x_out, c_out


class ConformerLayer(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    conv_kernel: int = 31

    @nn.compact
    def __call__(self, x, cos, sin):
        x = x + 0.5 * ConformerFeedForward(self.dim, self.ff_mult, name="ff1")(x)
        x = x + ConformerAttention(self.dim, self.heads, self.dim_head,
                                   name="attn")(x, cos, sin)
        x = x + ConformerConvModule(self.dim, self.conv_kernel, name="conv")(x)
        x = x + 0.5 * ConformerFeedForward(self.dim, self.ff_mult, name="ff2")(x)
        return nn.LayerNorm(name="post_norm")(x)


class ConformerEncoder(nn.Module):
    """num_layers conformer blocks with shared rotary tables
    (conformer.py:447-502; UniSE config: 6 layers, d=512, 8 heads, dh=64)."""

    num_layers: int = 6
    dim: int = 512
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    depthwise_conv_kernel_size: int = 31

    @nn.compact
    def __call__(self, x):
        t = x.shape[1]
        cos, sin = rope_cos_sin(jnp.arange(t), self.dim_head)
        for i in range(self.num_layers):
            x = ConformerLayer(
                self.dim, self.heads, self.dim_head, self.ff_mult,
                self.depthwise_conv_kernel_size, name=f"layers_{i}",
            )(x, cos, sin)
        return x
