"""Streaming transformer with a ring KV cache.

Capability-parity rebuild of the vendored Kyutai/Mimi streaming stack
(HCodec-1.5 adaptive/model_blocks/mimi: StreamingModule state protocol
module/streaming.py:33-150, RingKVCache :212-281, StreamingMultiheadAttention
:294, StreamingTransformer :605, ProjectedTransformer :828), redesigned as
pure functional state threading:

* State is an explicit pytree (ring k/v buffers + absolute write positions),
  so streaming steps jit cleanly and batch across streams.
* The ring holds the last ``capacity`` keys; attention masks to the causal
  ``context`` window using absolute positions stored per slot.
* ``__call__`` (offline) is mathematically identical to feeding the same
  sequence chunk-by-chunk through ``step`` whenever capacity >= context
  (test-enforced), which is the Mimi invariant the reference relies on.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .transformer import (
    NEG_INF, GatedMLP, RMSNorm, apply_rope, rope_cos_sin, sliding_window_mask,
)


def init_ring_state(num_layers: int, batch: int, capacity: int,
                    num_heads: int, head_dim: int, dtype=jnp.float32):
    shape = (num_layers, batch, capacity, num_heads, head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        # absolute position written into each ring slot; -1 = empty
        "pos": jnp.full((num_layers, capacity), -1, jnp.int32),
        "end": jnp.zeros((), jnp.int32),  # next absolute position
    }


class StreamingAttention(nn.Module):
    """Causal attention over a bounded ring of past keys."""

    num_heads: int
    head_dim: int
    context: int
    rope_theta: float = 10000.0

    @nn.compact
    def __call__(self, x, layer_state=None, end=None):
        """x (B, S, D). Offline when layer_state is None (sliding-window mask);
        streaming writes S new entries into the ring and attends over it.

        Returns (out, new_layer_state)."""
        d = x.shape[-1]
        h, hd = self.num_heads, self.head_dim
        b, s, _ = x.shape
        q = nn.Dense(h * hd, use_bias=False, name="q_proj")(x)
        k = nn.Dense(h * hd, use_bias=False, name="k_proj")(x)
        v = nn.Dense(h * hd, use_bias=False, name="v_proj")(x)
        q = q.reshape(b, s, h, hd)
        k = k.reshape(b, s, h, hd)
        v = v.reshape(b, s, h, hd)

        if layer_state is None:
            cos, sin = rope_cos_sin(jnp.arange(s), hd, self.rope_theta)
            q, k = apply_rope(q, k, cos, sin)
            mask = sliding_window_mask(s, self.context)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
            logits = logits + mask[None, None]
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
            new_state = None
        else:
            k_buf, v_buf, pos_buf = layer_state
            capacity = k_buf.shape[1]
            positions = end + jnp.arange(s)  # absolute query positions
            cos, sin = rope_cos_sin(positions, hd, self.rope_theta)
            q, k = apply_rope(q, k, cos, sin)
            slots = jnp.mod(positions, capacity)
            k_buf = k_buf.at[:, slots].set(k)
            v_buf = v_buf.at[:, slots].set(v)
            pos_buf = pos_buf.at[slots].set(positions)

            # visibility: key slot holds absolute position p; query at position
            # qp sees it iff 0 <= qp - p < context and slot non-empty
            delta = positions[:, None] - pos_buf[None, :]  # (S, C)
            visible = (delta >= 0) & (delta < self.context) & (pos_buf >= 0)[None]
            mask = jnp.where(visible, 0.0, NEG_INF)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_buf) * hd**-0.5
            logits = logits + mask[None, None]
            probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_buf)
            new_state = (k_buf, v_buf, pos_buf)

        out = out.reshape(b, s, h * hd)
        return nn.Dense(d, use_bias=False, name="o_proj")(out), new_state


class StreamingTransformerLayer(nn.Module):
    num_heads: int
    head_dim: int
    context: int

    @nn.compact
    def __call__(self, x, layer_state=None, end=None):
        d = x.shape[-1]
        h, new_state = StreamingAttention(
            self.num_heads, self.head_dim, self.context, name="self_attn"
        )(RMSNorm(d, name="norm1")(x), layer_state, end)
        x = x + h
        x = x + GatedMLP(d * 4, name="gating")(RMSNorm(d, name="norm2")(x))
        return x, new_state


class StreamingTransformer(nn.Module):
    """Context-limited streaming transformer (Mimi StreamingTransformer with
    gated FFN; context=16 in conf/config_adaptive_v3.yaml:99-112)."""

    dim: int
    num_layers: int = 4
    num_heads: int = 8
    context: int = 16

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    def setup(self):
        # nn.scan over the layer stack: ONE layer body in the HLO instead of
        # num_layers copies — required for the 32-layer bottleneck config
        # (config_adaptive_v3.yaml:99) on remote-compiled backends
        # (CLAUDE.md #3), same pattern as models/lm LlamaBackbone.
        scan = nn.scan(
            StreamingTransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(0, nn.broadcast),
            out_axes=0,
            length=self.num_layers,
        )
        self.layers = scan(self.num_heads, self.head_dim, self.context,
                           name="layers")

    def __call__(self, x):
        x, _ = self.layers(x, None, None)
        return x

    def init_state(self, batch: int, capacity: Optional[int] = None,
                   dtype=jnp.float32):
        capacity = capacity or self.context
        return init_ring_state(self.num_layers, batch, capacity,
                               self.num_heads, self.head_dim, dtype)

    def step(self, x, state):
        """Streaming chunk (B, S, D) -> (out, new_state)."""
        end = state["end"]
        x, (kb, vb, pb) = self.layers(
            x, (state["k"], state["v"], state["pos"]), end
        )
        new_state = {"k": kb, "v": vb, "pos": pb, "end": end + x.shape[1]}
        return x, new_state


class ProjectedStreamingTransformer(nn.Module):
    """Input/output dim projections around the streaming core
    (mimi/transformer.py:828 ProjectedTransformer)."""

    dim: int
    input_dim: int
    output_dim: int
    num_layers: int = 4
    num_heads: int = 8
    context: int = 16

    def setup(self):
        self.proj_in = nn.Dense(self.dim, use_bias=False, name="proj_in")
        self.core = StreamingTransformer(
            self.dim, self.num_layers, self.num_heads, self.context,
            name="core",
        )
        self.proj_out = nn.Dense(self.output_dim, use_bias=False,
                                 name="proj_out")

    def __call__(self, x):
        return self.proj_out(self.core(self.proj_in(x)))

    def init_state(self, batch: int, dtype=jnp.float32):
        return self.core.init_state(batch, dtype=dtype)

    def step(self, x, state):
        h, state = self.core.step(self.proj_in(x), state)
        return self.proj_out(h), state
