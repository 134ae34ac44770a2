"""Sequence-parallel (SP) prefill for the Llama stack.

The reference never needs SP (5 s chunks => ~537-token sequences, SURVEY
§5.7), but long-form audio prefill is the one place the LM sees long
sequences, so the framework ships an explicit SP path: activations are
sharded over the TIME axis across an ``sp`` mesh axis, every device projects
q/k/v from its local chunk, and the key/value blocks are all-gathered over
ICI so each device attends its local queries against the full sequence —
the all-gather-KV form of sequence parallelism (attention is causal; k/v for
a 512-dim model are small, so gathering KV beats ring attention's P-step
pipeline at these sizes).

Runs under ``shard_map`` directly against the SAME stacked ``nn.scan``
parameters as models/lm/llama.py (leading layer axis); numerical equality
with the dense forward is pinned in tests/test_parallel.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..nn.transformer import apply_rope, rope_cos_sin

NEG_INF = -1e9
_EPS = 1e-6


def _rmsnorm(x, weight):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + _EPS)).astype(x.dtype) * weight


def llama_sequence_parallel_forward(
    cfg, layer_params, embeds, mesh: Mesh, axis: str = "sp"
):
    """Full causal forward of the scanned Llama layer stack, sequence-sharded.

    Args:
      cfg: LlamaConfig.
      layer_params: ``params["backbone"]["layers"]`` (stacked, leading axis
        ``num_layers``).
      embeds: (B, S, D) with S divisible by the ``axis`` mesh size.
      mesh: mesh containing ``axis``; other axes may shard batch/params as
        usual.

    Returns pre-final-norm hidden states (B, S, D).
    """
    sp = mesh.shape[axis]
    b, s, d = embeds.shape
    if s % sp:
        raise ValueError(f"sequence {s} not divisible by sp={sp}")
    h, hd = cfg.num_heads, cfg.head_dim

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis, None)),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    def run(params, x_local):
        sl = x_local.shape[1]
        offset = jax.lax.axis_index(axis) * sl
        pos = offset + jnp.arange(sl)
        cos, sin = rope_cos_sin(pos, hd, cfg.rope_theta)
        key_pos = jax.lax.broadcasted_iota(jnp.int32, (sl, s), 1)
        mask = jnp.where(key_pos <= pos[:, None], 0.0, NEG_INF)[None, None]

        def layer(x, p):
            xn = _rmsnorm(x, p["input_layernorm"]["weight"])
            qkv = xn @ p["self_attn"]["qkv_proj"]["kernel"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, sl, h, hd)
            k = k.reshape(b, sl, h, hd)
            v = v.reshape(b, sl, h, hd)
            q, k = apply_rope(q, k, cos, sin)
            # gather the full-key/value sequence over the sp axis (tiled
            # concat along time, rank order == sequence order)
            k = jax.lax.all_gather(k, axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, axis, axis=1, tiled=True)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(
                jnp.float32) * hd**-0.5
            probs = jax.nn.softmax(logits + mask, axis=-1).astype(x.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, sl, d)
            x = x + attn @ p["self_attn"]["o_proj"]["kernel"]

            xn = _rmsnorm(x, p["post_attention_layernorm"]["weight"])
            gate_up = xn @ p["mlp"]["gate_up_proj"]["kernel"]
            gate, up = jnp.split(gate_up, 2, axis=-1)
            x = x + (jax.nn.silu(gate) * up) @ p["mlp"]["down_proj"]["kernel"]
            return x, None

        y, _ = jax.lax.scan(layer, x_local, params)
        return y

    return run(layer_params, embeds)
