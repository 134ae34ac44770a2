"""Paged KV cache: block-pool storage with per-slot block tables.

The BASELINE north star calls for "continuous-batched TPU decode with a paged
KV cache". KV lives in fixed-size blocks of a shared physical pool; each
serving slot owns a block table mapping logical block i -> physical block.
Memory scales with the tokens actually cached, and mixed-length sequences
pack tightly instead of each reserving ``max_cache_len``.

Design (all static shapes, jit-friendly):

* pool: ``{k, v}``: (L, num_blocks, block_size, H, hd) — physical storage.
* per slot: ``block_table`` (max_blocks,) int32 + a length scalar (the cache
  index). Physical block 0 is a reserved TRASH block: inactive slots scatter
  there, so stale block tables can never corrupt a live slot's blocks.
* :func:`paged_decode_ids` advances ALL slots one token in one program:
  embed -> lax.scan over the stacked layer parameters (ONE layer body in the
  HLO, mirroring LlamaBackbone's nn.scan — see CLAUDE.md #3 on HLO size) ->
  logits. Per layer it scatters each slot's new K/V into its current block
  and attends over the FULL pool with a block-ownership mask (the pool is
  read once per layer; no per-slot gather copy — the decode-latency lever,
  see the inline notes). Verified equal to the dense static-cache path
  (tests/test_engine.py).

Replaces the reference's HF DynamicCache Python decode loop
(QuarkAudio-UniSE/model/llm/llm.py:150-227) with a static-shape TPU design.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.lm.llama import NEG_INF, LlamaConfig
from ..nn.transformer import apply_rope, rope_cos_sin
from ..ops.pallas.paged_attention import (paged_flash_decode_owner,
                                          paged_flash_decode_owner_q8,
                                          paged_flash_decode_stream_flat,
                                          paged_flash_decode_stream_flat_q8,
                                          visibility_mask)

TRASH_BLOCK = 0  # physical block 0 is never allocated; inactive slots write here


def init_pool(cfg: LlamaConfig, num_blocks: int, block_size: int,
              dtype=jnp.float32, quant: Optional[str] = None) -> Dict:
    """KV block pool, stored FLAT: (L, NB, BS, H*hd). The flat trailing
    dims (block_size=64, 512) map to dense bf16 TPU tiles; the 5-D
    (..., H=8, hd=64) layout forced padded (16, 128) tiles, and the Pallas
    stream kernel measured 3.8x less HBM bandwidth on its chunk DMAs
    (ops/pallas/paged_attention.py round-3 notes).

    ``quant="int8"``: K/V store as symmetric int8 with one fp32 scale per
    (layer, token, k|v) — the decode step streams the WHOLE allocated pool
    prefix every token, so halving pool bytes (vs bf16) halves the
    HBM-bound decode floor. Quantization happens at WRITE time
    (scatter_prefill / the per-step scatter); both attention paths dequant
    with the same fp32 math, so kernel == XLA stays exactly pinnable."""
    shape = (cfg.num_layers, num_blocks, block_size,
             cfg.num_heads * cfg.head_dim)
    if quant is None:
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if quant != "int8":
        raise ValueError(f"unknown pool quant {quant!r} (int8 or None)")
    sshape = shape[:3]
    return {"k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32)}


def quantize_kv(x):
    """Symmetric per-row int8: x (..., DH) float -> (int8 (..., DH),
    fp32 scale (...,)). Values exactly representable as n * amax/127
    round-trip bit-identically in fp32."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    q = jnp.clip(jnp.round(xf / jnp.maximum(scale, 1e-20)[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


class BlockAllocator:
    """Host-side free-list of physical blocks (block 0 reserved as trash).

    LOW-FIRST policy (a min-heap): allocated blocks cluster at the bottom of
    the pool, so the allocation high-water mark tracks the blocks actually
    in use. ``high_water()`` feeds the decode step's bounded pool read —
    attention cost becomes O(allocated blocks), not O(pool capacity)
    (round-2 scaling wall: 0.85 -> 4.46 ms/step as capacity grew 105 -> 417
    blocks at FIXED occupancy)."""

    def __init__(self, num_blocks: int):
        import heapq

        self._heapq = heapq
        self.num_blocks = num_blocks
        self.free: List[int] = list(range(1, num_blocks))
        self._heapq.heapify(self.free)
        self._allocated: set = set()

    def alloc(self, n: int) -> List[int]:
        if len(self.free) < n:
            raise RuntimeError(
                f"KV pool exhausted: need {n} blocks, {len(self.free)} free"
            )
        out = [self._heapq.heappop(self.free) for _ in range(n)]
        self._allocated.update(out)
        return out

    def release(self, blocks: List[int]):
        for b in blocks:
            self._heapq.heappush(self.free, int(b))
            self._allocated.discard(int(b))

    def high_water(self) -> int:
        """1 + the highest allocated block index (>= 1: trash block)."""
        return (max(self._allocated) + 1) if self._allocated else 1

    def bounded_high_water(self, bucket: int = 64) -> int:
        """Bucketed allocation high-water mark: the STATIC prefix bound for
        a paged decode read, capped at THIS allocator's capacity. 64-block
        buckets bound the set of compiled step programs; growing occupancy
        only recompiles at bucket crossings. The granularity must satisfy
        the Pallas flash-decode kernel's chunk/lane constraint — keeping
        the logic HERE keeps every engine sharing this allocator (and its
        pool) consistent."""
        b = -(-self.high_water() // bucket) * bucket
        return min(b, self.num_blocks)

    def block_cost(self, n: int) -> int:
        """Blocks actually consumed by alloc(n) — admission budget math
        must charge THIS, not n (the RegionAllocator rounds up)."""
        return n


class RegionAllocator:
    """Contiguous region-granular allocator for the OWNER-mode decode kernel
    (ops/pallas/paged_attention.py paged_flash_decode_owner).

    The pool is carved into fixed regions of ``region_blocks`` blocks;
    ``alloc(n)`` hands out the first ``n`` blocks of a whole free region, so
    every slot's block range is contiguous, chunk-aligned, and fully
    in-pool — the three invariants the owner kernel's clamped chunk DMAs
    rely on. Region 0 contains the reserved trash block (block 0) and is
    never allocated. LOW-FIRST region policy mirrors BlockAllocator so
    ``high_water()`` still bounds the allocated prefix for any engine on
    the same pool that reads bounded prefixes (stream/XLA paths).

    Same interface as BlockAllocator (``free``/``alloc``/``release``/
    ``high_water``/``bounded_high_water``/``block_cost``); engines charge
    ``block_cost(n)`` = a full region against their admission budget."""

    def __init__(self, num_blocks: int, region_blocks: int):
        import heapq

        self._heapq = heapq
        if region_blocks < 1:
            raise ValueError("region_blocks must be >= 1")
        self.num_blocks = num_blocks
        self.region_blocks = region_blocks
        self.num_regions = num_blocks // region_blocks
        if self.num_regions < 2:
            raise ValueError(
                f"pool of {num_blocks} blocks holds "
                f"{self.num_regions} regions of {region_blocks}; need >= 2 "
                "(region 0 is reserved for the trash block)")
        self._free_regions: List[int] = list(range(1, self.num_regions))
        self._heapq.heapify(self._free_regions)
        self._allocated_regions: set = set()

    @property
    def free(self) -> List[int]:
        """Free blocks (whole free regions), BlockAllocator-compatible:
        engines budget with ``len(allocator.free)`` and charge
        ``block_cost`` per admission."""
        r_blocks = self.region_blocks
        return [r * r_blocks + i for r in self._free_regions
                for i in range(r_blocks)]

    def block_cost(self, n: int) -> int:
        if n > self.region_blocks:
            raise ValueError(
                f"request of {n} blocks exceeds the region size "
                f"{self.region_blocks}")
        return self.region_blocks

    def alloc(self, n: int) -> List[int]:
        self.block_cost(n)  # validates n
        if not self._free_regions:
            raise RuntimeError(
                f"KV pool exhausted: need a region, 0 of "
                f"{self.num_regions - 1} free")
        r = self._heapq.heappop(self._free_regions)
        self._allocated_regions.add(r)
        base = r * self.region_blocks
        return [base + i for i in range(n)]

    def release(self, blocks: List[int]):
        if not blocks:
            return
        r = int(blocks[0]) // self.region_blocks
        if r not in self._allocated_regions:
            raise ValueError(f"release of unallocated region {r}")
        base = r * self.region_blocks
        for b in blocks:
            if not base <= int(b) < base + self.region_blocks:
                raise ValueError(
                    f"block {b} outside region {r}'s range "
                    f"[{base}, {base + self.region_blocks})")
        self._allocated_regions.discard(r)
        self._heapq.heappush(self._free_regions, r)

    def high_water(self) -> int:
        if not self._allocated_regions:
            return 1
        return (max(self._allocated_regions) + 1) * self.region_blocks

    def bounded_high_water(self, bucket: int = 64) -> int:
        b = -(-self.high_water() // bucket) * bucket
        return min(b, self.num_blocks)


def _rms(x, weight, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def paged_decode_ids(cfg: LlamaConfig, lm_params, pool, tables, index, active,
                     ids, block_size: int,
                     num_active_blocks: Optional[int] = None,
                     use_kernel=False, owner_chunk_blocks: int = 8):
    """One batched decode step over the paged pool, per-slot cache positions.

    lm_params: the CodecLM param subtree (codec_embedding / backbone /
    output_head) with nn.scan-stacked layers (leading L axis).
    tables (S, max_blocks) int32, index (S,) int32, active (S,) bool,
    ids (S,) int32. Returns (logits (S, V) float32, new pool).

    Math mirrors LlamaBackbone.decode_step_multi exactly (fused qkv /
    gate_up matmuls, fp32 attention logits+softmax) so the paged path is
    numerically identical to the dense static cache.

    ``num_active_blocks`` (STATIC) bounds the attended pool prefix — see
    paged_decode_embeds.
    """
    emb_table = lm_params["codec_embedding"]["embedding"]
    # compute dtype: the pool dtype when it IS a compute dtype; int8 pools
    # store quantized values, so activations follow the params instead
    x_dtype = (emb_table.dtype if "k_scale" in pool else pool["k"].dtype)
    x = emb_table[ids][:, None].astype(x_dtype)  # (S, 1, D)
    hidden, pool = paged_decode_embeds(
        cfg, lm_params["backbone"], pool, tables, index, active, x,
        block_size, num_active_blocks=num_active_blocks,
        use_kernel=use_kernel, owner_chunk_blocks=owner_chunk_blocks)
    logits = (hidden @ lm_params["output_head"]["kernel"]).astype(jnp.float32)
    return logits, pool


def paged_decode_embeds(cfg: LlamaConfig, backbone_params, pool, tables,
                        index, active, x, block_size: int,
                        num_active_blocks: Optional[int] = None,
                        use_kernel=False, owner_chunk_blocks: int = 8):
    """Embedding-level paged decode step: the shared backbone machinery
    behind paged_decode_ids, factored out so OTHER head/embedding schemes
    (UniTok's K summed code embeddings + K parallel heads,
    models/unitok/model.py) serve from the same block pool.

    x (S, 1, D) input embeddings -> (hidden (S, D) post-norm, new pool).

    ``num_active_blocks`` (STATIC int) restricts the attention read to the
    pool PREFIX [0, num_active_blocks): with the low-first BlockAllocator
    every allocated block sits below its high-water mark, so passing a
    (bucketed) high-water bound makes the decode's HBM traffic O(allocated
    KV) instead of O(pool capacity). KV writes still scatter into the FULL
    pool, so the bound never corrupts state — a too-small bound only masks
    out-of-range keys (callers must pass bound >= allocator.high_water()).

    ``use_kernel`` routes the attention through a Pallas flash-decode
    kernel (ops/pallas/paged_attention.py). ``True`` / ``"stream"``: the
    full-stream kernel — the pool prefix streams through VMEM in
    multi-block chunks at measured ~540 GB/s vs ~140 GB/s for the XLA
    einsum at 32-slot widths (the XLA path materializes (S, NB*BS) fp32
    logits per layer). ``"owner"``: the ownership-aware kernel — REQUIRES
    contiguous ``owner_chunk_blocks``-aligned per-slot block ranges (the
    RegionAllocator's contract) and computes each slot only against its
    own blocks (the stream kernel is VPU-bound on every-slot-times-
    every-key flash work; step time also becomes independent of pool
    capacity, so ``num_active_blocks`` is ignored). Off-TPU the kernels
    run in interpret mode (tests pin kernel == XLA equality).
    """
    mode = use_kernel if isinstance(use_kernel, str) else (
        "stream" if use_kernel else "")
    if mode not in ("", "stream", "owner"):
        raise ValueError(f"unknown kernel mode {mode!r}")
    layers = backbone_params["layers"]
    bs = block_size
    s_slots, max_blocks = tables.shape
    num_blocks = pool["k"].shape[1]
    nb = num_blocks if num_active_blocks is None \
        else min(int(num_active_blocks), num_blocks)
    h, hd = cfg.num_heads, cfg.head_dim

    cos, sin = rope_cos_sin(index[:, None], cfg.head_dim, cfg.rope_theta)

    # FULL-POOL attention: instead of gathering each slot's logical view
    # (k_buf[tables] materializes an (S, MB*BS, H, hd) copy per layer —
    # measured 2.1 ms/step), every slot attends over the whole pool with a
    # block-ownership mask built from the inverse table map (1.3 ms/step:
    # the pool is read once, nothing is copied). lmap[s, n] = logical block
    # index of physical block n in slot s's table, -1 if not owned; the
    # reserved trash block is never attended.
    interp = jax.default_backend() != "tpu"
    if mode == "owner":
        # contiguity contract: slot s owns blocks [tables[s,0],
        # tables[s,0]+n) with a chunk-aligned start — the RegionAllocator's
        # invariant. Inactive slots mask everything via index = -1.
        start = tables[:, 0]
        own_index = jnp.where(active, index, -1)
        oc = owner_chunk_blocks
        o_mc = -(-max_blocks // oc)
    else:
        rows = jnp.arange(s_slots)[:, None]
        lmap = jnp.full((s_slots, num_blocks), -1,
                        jnp.int32).at[rows, tables].set(
            jnp.broadcast_to(jnp.arange(max_blocks)[None], tables.shape),
            mode="drop",
        )
        lmap = lmap.at[:, TRASH_BLOCK].set(-1)
        lmap = lmap[:, :nb]  # bounded prefix (see docstring)
        # layer-invariant int8 key visibility, built once per step (shared
        # helper — the kernel and XLA paths must agree on the rule)
        vis_i8 = visibility_mask(lmap, index, bs)
    if mode == "stream":
        # chunk*block_size must be a 128-lane multiple for the visibility
        # tile (Mosaic); engines keep pool capacity (and thus every bound)
        # a 64-block multiple so a valid chunk always exists on TPU
        chunk = next(c for c in (16, 8, 4, 2, 1) if nb % c == 0)
        if not interp and (chunk * bs) % 128:
            raise ValueError(
                f"stream kernel: largest chunk dividing the block bound "
                f"({nb}) gives chunk*block_size ({chunk * bs}) that is not "
                "a 128-lane multiple; size the pool to a 64-block multiple")
    elif not mode:
        mask = jnp.where(vis_i8 != 0, 0.0, NEG_INF).reshape(
            s_slots, 1, 1, nb * bs)

    # scatter target: each slot's current (block, offset); inactive slots
    # are redirected to the trash block so stale tables cannot corrupt live
    # data. Inactive rows take DISTINCT trash offsets: duplicate indices
    # under unique_indices=True are documented undefined behavior, and with
    # a shared offset every inactive slot would collide at (li, 0, 0).
    # Slot counts never exceed block_size (64) in practice; the %bs guard
    # plus the hint switch below keep larger pools formally correct too.
    blk = jnp.take_along_axis(tables, (index // bs)[:, None], axis=1)[:, 0]
    blk = jnp.where(active, blk, TRASH_BLOCK)
    off = jnp.where(active, index % bs,
                    jnp.arange(s_slots, dtype=index.dtype) % bs)
    unique_scatter = s_slots <= bs

    quant = "k_scale" in pool

    def layer_body(carry, lp):
        # the FULL pool rides the carry and each layer scatters only into
        # its own (li, blk, off) rows: a scanned-xs/ys pool forces XLA to
        # materialize a fresh stacked buffer every step (measured
        # 3.3 ms/step at serving size vs 1.5 ms/step carried)
        x, p, li = carry
        k_pool, v_pool = p["k"], p["v"]
        hin = _rms(x, lp["input_layernorm"]["weight"])
        qkv = hin @ lp["self_attn"]["qkv_proj"]["kernel"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(s_slots, 1, h, hd)
        k = k.reshape(s_slots, 1, h, hd)
        v = v.reshape(s_slots, 1, h, hd)
        q, k = apply_rope(q, k, cos, sin)

        k_rows = k[:, 0].reshape(s_slots, h * hd)
        v_rows = v[:, 0].reshape(s_slots, h * hd)
        if quant:
            k_rows, k_sc = quantize_kv(k_rows)
            v_rows, v_sc = quantize_kv(v_rows)
            p = dict(p)
            p["k_scale"] = p["k_scale"].at[li, blk, off].set(
                k_sc, unique_indices=unique_scatter)
            p["v_scale"] = p["v_scale"].at[li, blk, off].set(
                v_sc, unique_indices=unique_scatter)
        k_pool = k_pool.at[li, blk, off].set(
            k_rows.astype(k_pool.dtype), unique_indices=unique_scatter)
        v_pool = v_pool.at[li, blk, off].set(
            v_rows.astype(v_pool.dtype), unique_indices=unique_scatter)
        p = {**p, "k": k_pool, "v": v_pool}
        if mode == "owner":
            if quant:
                # int8 pool + owner kernel: the owner formulation is
                # DMA-bound (the stream kernel was VPU-bound), so halving
                # pool bytes halves the decode floor here — the layer's
                # scales slice outside the kernel like the q8 stream path
                attn = paged_flash_decode_owner_q8(
                    q[:, 0], k_pool, v_pool,
                    jax.lax.dynamic_index_in_dim(
                        p["k_scale"], li, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(
                        p["v_scale"], li, 0, keepdims=False),
                    start, own_index, li,
                    num_heads=h, chunk_blocks=oc, max_chunks=o_mc,
                    interpret=interp)
            else:
                attn = paged_flash_decode_owner(
                    q[:, 0], k_pool, v_pool, start, own_index, li,
                    num_heads=h, chunk_blocks=oc, max_chunks=o_mc,
                    interpret=interp)  # (S, H, hd)
            attn = attn.reshape(s_slots, 1, h * hd).astype(x.dtype)
        elif mode == "stream":
            if quant:
                # the layer's scales slice here (tiny; XLA fuses the
                # dynamic slice) — the kernel's scale tiles must be blocks
                # of a single-row array (TPU lowering constraint, see the
                # kernel docstring)
                attn = paged_flash_decode_stream_flat_q8(
                    q[:, 0], k_pool, v_pool,
                    jax.lax.dynamic_index_in_dim(
                        p["k_scale"], li, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(
                        p["v_scale"], li, 0, keepdims=False),
                    vis_i8, li, num_heads=h, chunk_blocks=chunk,
                    num_active_blocks=nb, interpret=interp)
            else:
                attn = paged_flash_decode_stream_flat(
                    q[:, 0], k_pool, v_pool, vis_i8, li,
                    num_heads=h, chunk_blocks=chunk, num_active_blocks=nb,
                    interpret=interp)  # (S, H, hd)
            # cast back so the residual carry dtype is stable
            attn = attn.reshape(s_slots, 1, h * hd).astype(x.dtype)
        else:
            k_buf = jax.lax.dynamic_index_in_dim(
                k_pool, li, 0, keepdims=False)[:nb]
            v_buf = jax.lax.dynamic_index_in_dim(
                v_pool, li, 0, keepdims=False)[:nb]
            if quant:
                # ROW-WISE dequant, same formulation as the q8 kernel: the
                # per-token scales fold into (.., keys) multiplies on the
                # logits / probabilities instead of (keys, DH) tensor
                # multiplies (measured slower than bf16 despite half the
                # DMA) — and the equality pin between the two paths must
                # share the rounding order
                ksc = jax.lax.dynamic_index_in_dim(
                    p["k_scale"], li, 0, keepdims=False)[:nb].reshape(-1)
                vsc = jax.lax.dynamic_index_in_dim(
                    p["v_scale"], li, 0, keepdims=False)[:nb].reshape(-1)
                k_buf = k_buf.astype(jnp.float32)
                v_buf = v_buf.astype(jnp.float32)
            k_buf = k_buf.reshape(nb * bs, h, hd)
            v_buf = v_buf.reshape(nb * bs, h, hd)

            logits = jnp.einsum("bqhd,khd->bhqk", q,
                                k_buf).astype(jnp.float32)
            if quant:
                logits = logits * (ksc * hd**-0.5)[None, None, None] + mask
            else:
                logits = logits * hd**-0.5 + mask
            probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
            if quant:
                probs = probs * vsc[None, None, None].astype(probs.dtype)
            attn = jnp.einsum("bhqk,khd->bqhd", probs,
                              v_buf.astype(probs.dtype))
            # residual carry dtype must be scan-invariant (the quant path's
            # fp32 dequant would otherwise promote x to fp32)
            attn = attn.reshape(s_slots, 1, h * hd).astype(x.dtype)
        x = x + attn @ lp["self_attn"]["o_proj"]["kernel"]

        hmlp = _rms(x, lp["post_attention_layernorm"]["weight"])
        gate_up = hmlp @ lp["mlp"]["gate_up_proj"]["kernel"]
        gate, up = jnp.split(gate_up, 2, axis=-1)
        x = x + (jax.nn.silu(gate) * up) @ lp["mlp"]["down_proj"]["kernel"]
        return (x, p, li + 1), None

    (x, new_pool, _), _ = jax.lax.scan(
        layer_body, (x, dict(pool), jnp.int32(0)), layers
    )
    x = _rms(x, backbone_params["norm"]["weight"])
    return x[:, 0], new_pool


def scatter_prefill(pool, tables, cache_k, cache_v, block_size: int):
    """Write a dense prefilled cache into the paged pool.

    cache_k/cache_v: (L, B, Lp, H, hd) from LlamaBackbone.prefill;
    tables (B, max_blocks). Position p of row b lands in physical block
    ``tables[b, p // bs]`` at offset ``p % bs``. Returns the new pool
    (flat (L, NB, BS, H*hd) layout).
    """
    bs = block_size
    L, b, lp_len, h, hd = cache_k.shape
    cache_k = cache_k.reshape(L, b, lp_len, h * hd)
    cache_v = cache_v.reshape(L, b, lp_len, h * hd)
    pos = jnp.arange(lp_len)
    blk = tables[:, pos // bs]  # (B, Lp)
    off = jnp.broadcast_to(pos % bs, blk.shape)  # (B, Lp)
    if "k_scale" in pool:
        cache_k, k_sc = quantize_kv(cache_k)
        cache_v, v_sc = quantize_kv(cache_v)
        pool = {**pool,
                "k_scale": pool["k_scale"].at[:, blk, off].set(k_sc),
                "v_scale": pool["v_scale"].at[:, blk, off].set(v_sc)}
    new_k = pool["k"].at[:, blk, off].set(cache_k.astype(pool["k"].dtype))
    new_v = pool["v"].at[:, blk, off].set(cache_v.astype(pool["v"].dtype))
    return {**pool, "k": new_k, "v": new_v}


class PoolRef:
    """Shared handle to one physical KV block pool.

    Engines that accept a PoolRef read and write the pool THROUGH the
    handle, so donation-based buffer replacement in one engine's step is
    immediately visible to the other — the mechanism behind serving mixed
    UniSE + UniTok traffic from a single pool (one BlockAllocator partitions
    the physical blocks between them)."""

    def __init__(self, pool):
        self.pool = pool
