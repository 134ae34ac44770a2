"""Paged KV cache: block-pool storage with per-sequence block tables.

The BASELINE north star calls for "continuous-batched TPU decode with a paged
KV cache". The slot engine (engine.py) reserves max_len per slot; this module
stores KV in fixed-size blocks from a shared pool, so memory scales with the
tokens actually cached and mixed-length sequences pack tightly.

Design (all static shapes, jit-friendly):
* pool: {k, v}: (L, num_blocks, block_size, H, hd) — physical storage.
* per sequence: block_table (max_blocks,) int32 mapping logical block i ->
  physical block (allocated host-side), plus a length scalar.
* ``paged_decode_step`` runs one token through the LlamaBackbone params: it
  scatters the new K/V into the pool and attends over the gathered logical
  view with a length mask. Verified equal to the dense-cache decode path.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp

from ..models.lm.llama import NEG_INF, LlamaConfig
from ..nn.transformer import apply_rope, rope_cos_sin


def init_pool(cfg: LlamaConfig, num_blocks: int, block_size: int,
              dtype=jnp.float32) -> Dict:
    shape = (cfg.num_layers, num_blocks, block_size, cfg.num_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


class BlockAllocator:
    """Host-side free-list of physical blocks."""

    def __init__(self, num_blocks: int):
        self.free: List[int] = list(range(num_blocks))

    def alloc(self, n: int) -> List[int]:
        if len(self.free) < n:
            raise RuntimeError("KV pool exhausted")
        out = self.free[:n]
        del self.free[:n]
        return out

    def release(self, blocks: List[int]):
        self.free.extend(int(b) for b in blocks)


def _rms(x, weight, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


@partial(jax.jit, static_argnames=("cfg", "block_size"))
def paged_decode_step(cfg: LlamaConfig, params, pool, block_table, length,
                      embeds, block_size: int = 64):
    """One decode step for a single sequence over the paged pool.

    params: LlamaBackbone variables["params"] (scan-stacked layers).
    block_table (max_blocks,), length scalar, embeds (1, 1, D).
    Returns (hidden (1, 1, D), new pool).
    """
    layers = params["layers"]
    bs = block_size
    max_blocks = block_table.shape[0]
    max_len = max_blocks * bs
    h, hd = cfg.num_heads, cfg.head_dim

    pos = length
    cos, sin = rope_cos_sin(pos[None], cfg.head_dim, cfg.rope_theta)
    key_pos = jnp.arange(max_len)
    mask = jnp.where(key_pos <= pos, 0.0, NEG_INF)[None, None, None, :]

    blk = length // bs
    off = length % bs
    phys = block_table[blk]

    x = embeds
    new_k_pool, new_v_pool = pool["k"], pool["v"]
    for li in range(cfg.num_layers):
        lp = jax.tree_util.tree_map(lambda p: p[li], layers)
        hin = _rms(x, lp["input_layernorm"]["weight"])
        qkv = hin @ lp["self_attn"]["qkv_proj"]["kernel"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(1, 1, h, hd)
        k = k.reshape(1, 1, h, hd)
        v = v.reshape(1, 1, h, hd)
        q, k = apply_rope(q, k, cos, sin)

        # scatter the new K/V into the pool at (layer, phys, off)
        new_k_pool = jax.lax.dynamic_update_slice(
            new_k_pool, k.astype(new_k_pool.dtype).reshape(1, 1, 1, h, hd),
            (li, phys, off, 0, 0),
        )
        new_v_pool = jax.lax.dynamic_update_slice(
            new_v_pool, v.astype(new_v_pool.dtype).reshape(1, 1, 1, h, hd),
            (li, phys, off, 0, 0),
        )
        # gather the logical view and attend
        k_all = new_k_pool[li][block_table].reshape(1, max_len, h, hd)
        v_all = new_v_pool[li][block_table].reshape(1, max_len, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_all).astype(jnp.float32)
        logits = logits * hd**-0.5 + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v_all).reshape(1, 1, h * hd)
        x = x + attn @ lp["self_attn"]["o_proj"]["kernel"]

        hmlp = _rms(x, lp["post_attention_layernorm"]["weight"])
        gate_up = hmlp @ lp["mlp"]["gate_up_proj"]["kernel"]
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = x + (jax.nn.silu(gate) * up) @ lp["mlp"]["down_proj"]["kernel"]

    x = _rms(x, params["norm"]["weight"])
    return x, {"k": new_k_pool, "v": new_v_pool}
