"""Pallas TPU kernel: paged flash-decode attention over a block table.

The serving decode step attends each slot's single query over its paged KV
blocks. The XLA path (serve/paged.py) reads the whole pool and materializes
an (S, NB*BS) logits buffer + mask per layer; this kernel DMA's exactly the
slot's own blocks (addressed through the scalar-prefetched block table) and
keeps the flash running-softmax state in VMEM scratch, so per-step HBM
traffic is just the owned KV blocks.

Grid (S, MB): step (s, m) processes logical block m of slot s, all heads at
once. Per-head contractions are expressed as elementwise multiply +
reductions (q·k over the lane dim, p·v over the sublane dim) — Mosaic
rejects batched dot_general dimension numbers, and at decode shapes
(1 query × 64 keys × 64 dims) the op is bandwidth-bound anyway. The layer
index rides scalar prefetch so the kernel slices the stacked
(L, NB, BS, H, hd) pool directly.

Falls back to interpret mode off-TPU so the math is test-covered on CPU
(tests/test_pallas_kernels.py pins equality with the XLA paged path).

MEASURED VERDICT (v5e, UniSE serving shapes: 8 slots x 13 blocks x 64 x
8 heads x 64): compiles and matches XLA (bf16 max err 7.7e-4) but runs at
0.70 ms per layer call — the 104-step grid serializes one small (131 KB)
DMA per step. The XLA full-pool formulation in serve/paged.py does all 12
layers in 1.29 ms (~0.11 ms/layer) with large fused reads, so it remains
the production decode path; this kernel is kept as the evaluated
alternative (it would need multi-block DMAs + double buffering to win).

SECOND EVALUATION (round 2, session 2): a per-head full-pool variant
(grid (H,), one 860 KB k + 860 KB v DMA per step, whole-row softmax in
VMEM, max err 6.7e-4) measured 41.5 us/layer with the slope method —
still grid/DMA-overhead bound vs ~18 us/layer for the XLA attention at
identical shapes, which runs at the measured HBM speed of light
(~780 GB/s). Conclusion stands, now with three data points: at decode
shapes this small, XLA's fused full-pool read is the right formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(tables_ref, index_ref, li_ref, q_ref, kpool_ref, vpool_ref,
            out_ref, acc_ref, m_ref, l_ref):
    s = pl.program_id(0)
    m = pl.program_id(1)
    num_m = pl.num_programs(1)

    @pl.when(m == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32)          # (H, hd)
    k = kpool_ref[0, 0].astype(jnp.float32)   # (BS, H, hd)
    v = vpool_ref[0, 0].astype(jnp.float32)   # (BS, H, hd)
    bs = k.shape[0]
    hd = q.shape[-1]

    # per-head q.k: elementwise multiply, reduce the lane (hd) dim -> (BS, H)
    logits = jnp.sum(k * q[None], axis=-1) * (hd ** -0.5)

    # positions covered by this logical block: m*BS + [0, BS)
    idx = index_ref[s]
    pos = m * bs + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    logits = jnp.where(pos <= idx, logits, NEG_INF)

    m_old = m_ref[0]                           # (H,)
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=0))
    scale = jnp.exp(m_old - m_new)             # (H,)
    p = jnp.exp(logits - m_new[None])          # (BS, H)
    l_new = l_ref[0] * scale + jnp.sum(p, axis=0)
    # p.v: broadcast over hd, reduce the sublane (BS) dim -> (H, hd)
    pv = jnp.sum(p[:, :, None] * v, axis=0)
    acc_ref[:] = acc_ref[:] * scale[:, None] + pv
    m_ref[0] = m_new
    l_ref[0] = l_new

    @pl.when(m == num_m - 1)
    def _finish():
        out_ref[0] = (acc_ref[:] /
                      jnp.maximum(l_ref[0], 1e-30)[:, None]).astype(
            out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode(q, kpool, vpool, tables, index, li,
                       interpret: bool = False):
    """q (S, H, hd); kpool/vpool (L, NB, BS, H, hd); tables (S, MB) int32;
    index (S,) int32 (current position per slot, already containing the new
    token's K/V at that position); li scalar int32 layer -> attn (S, H, hd).

    Equivalent to softmax(q . K_owned / sqrt(hd)) @ V_owned with key
    positions <= index, where "owned" = the blocks in the slot's table.
    Unallocated table entries (pointing at the trash block) stay masked
    because blocks cover exactly positions [0, need): entries at or beyond
    the allocation always satisfy m*BS > index.
    """
    s_slots, h, hd = q.shape
    _, _, bs, _, _ = kpool.shape
    mb = tables.shape[1]

    grid = (s_slots, mb)
    kernel = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, h, hd), lambda s, m, t, i, l: (s, 0, 0)),
                pl.BlockSpec((1, 1, bs, h, hd),
                             lambda s, m, t, i, l: (l[0], t[s, m], 0, 0, 0)),
                pl.BlockSpec((1, 1, bs, h, hd),
                             lambda s, m, t, i, l: (l[0], t[s, m], 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, hd), lambda s, m, t, i, l: (s, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((h, hd), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
                pltpu.VMEM((1, h), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s_slots, h, hd), q.dtype),
        interpret=interpret,
    )
    return kernel(tables, index, jnp.asarray(li, jnp.int32).reshape(1),
                  q, kpool, vpool)


# ---------------------------------------------------------------------------
# THIRD formulation (round 3): full-stream chunked flash decode.
#
# What changed: the serving problem changed. With the bounded-prefix pool
# read (serve/paged.py num_active_blocks) the pool prefix IS the working
# set, and at 32-slot serving widths (300-400 blocks) the XLA attention
# collapses to ~175 GB/s (fp32 logits/mask materialization per layer;
# benchmarks/bench_paged_step.py). This kernel streams the pool prefix
# ONCE per layer in multi-block chunks — Pallas auto-double-buffers the
# chunk DMAs through the BlockSpec grid — computing ALL slots against each
# chunk with flash online-softmax state in VMEM. No (S, NB*BS) logits
# buffer ever exists. The two earlier formulations above lost to
# per-(slot, block) DMA latency and to per-head grid overhead at SMALL
# pools; this one targets exactly the large-prefix regime they never ran
# in. A first 5-D cut (pools (L, NB, BS, H, hd)) matched XLA numerically
# but its chunk DMAs hit padded (16, 128) tiles on the (H=8, hd=64)
# trailing dims and measured ~3.8x less HBM bandwidth than the flat
# layout below — it was deleted after the flat variant won on chip
# (round-3 notes). Measured (v5e, slope method): see the docstring of
# paged_flash_decode_stream_flat.
# ---------------------------------------------------------------------------


def visibility_mask(lmap, index, block_size: int):
    """(S, NB) inverse block map + (S,) positions -> (S, NB*BS) int8 key
    visibility, layer-invariant: build ONCE per decode step and reuse for
    every layer's kernel call (serve/paged.py derives BOTH the kernel's
    visibility tile and the XLA path's additive mask from this)."""
    s, nb = lmap.shape
    key_pos = lmap[:, :, None] * block_size + \
        jnp.arange(block_size)[None, None]
    vis = (lmap[:, :, None] >= 0) & (key_pos <= index[:, None, None])
    return vis.reshape(s, nb * block_size).astype(jnp.int8)


def _stream_kernel_flat(li_ref, q_ref, vis_ref, kpool_ref, vpool_ref,
                        out_ref, acc_ref, m_ref, l_ref, *, num_heads: int):
    i = pl.program_id(0)
    num_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    k = kpool_ref[0].astype(jnp.float32)   # (C, BS, H*hd) — DENSE bf16 tiles
    v = vpool_ref[0].astype(jnp.float32)
    c, bs, dh = k.shape
    ck = c * bs
    h = num_heads
    hd = dh // h
    k = k.reshape(ck, dh)
    v = v.reshape(ck, dh)
    q = q_ref[:].astype(jnp.float32)       # (S, H, hd)

    vis = vis_ref[:] != 0                  # (S, CK)

    scale = hd ** -0.5
    m_old = m_ref[:]
    l_old = l_ref[:]
    for hh in range(h):
        sl = slice(hh * hd, (hh + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, hh, :], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                          # (S, CK)
        logits = jnp.where(vis, logits, NEG_INF)
        m_new = jnp.maximum(m_old[:, hh], jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_old[:, hh] - m_new)
        p = jnp.exp(logits - m_new[:, None])
        l_new = l_old[:, hh] * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (S, hd)
        acc_ref[:, hh, :] = acc_ref[:, hh, :] * alpha[:, None] + pv
        m_ref[:, hh] = m_new
        l_ref[:, hh] = l_new

    @pl.when(i == num_i - 1)
    def _finish():
        out_ref[:] = (acc_ref[:]
                      / jnp.maximum(l_ref[:], 1e-30)[:, :, None]).astype(
            out_ref.dtype)


def _stream_kernel_flat_q8(li_ref, q_ref, vis_ref, kpool_ref, vpool_ref,
                           ksc_ref, vsc_ref, out_ref, acc_ref, m_ref, l_ref,
                           *, num_heads: int):
    """int8-pool variant of _stream_kernel_flat: each chunk DMA moves HALF
    the bytes of bf16 (the decode floor is the pool stream), and the
    per-token fp32 scales dequantize in VMEM. Math after dequant is
    identical to the bf16 kernel's fp32 flash loop — serve/paged.py's XLA
    path dequantizes with the same expression, so the two stay pinnable."""
    i = pl.program_id(0)
    num_i = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # per-token scales stay OUT of the (CK, DH) tensors: dequantizing K/V
    # elementwise (a (C, BS, DH) fp32 multiply per chunk) measured SLOWER
    # than the bf16 kernel despite half the DMA bytes — the scales fold
    # into row-wise (S, CK) multiplies instead: logits scale by the key's
    # k-scale after the dot, probabilities scale by the key's v-scale
    # before the pv dot (softmax(x) @ (v*s) == (softmax(x)*s) @ v row-wise).
    # Scales arrive PRE-FLATTENED as (1, CK) tiles: Mosaic rejects the
    # in-kernel (C, BS) -> (CK,) shape cast (padded-lane relayout).
    ksc = ksc_ref[:]                        # (1, CK) fp32
    vsc = vsc_ref[:]
    k = kpool_ref[0].astype(jnp.float32)    # (C, BS, DH) — convert only
    v = vpool_ref[0].astype(jnp.float32)
    c, bs, dh = k.shape
    ck = c * bs
    h = num_heads
    hd = dh // h
    k = k.reshape(ck, dh)
    v = v.reshape(ck, dh)
    q = q_ref[:].astype(jnp.float32)        # (S, H, hd)

    vis = vis_ref[:] != 0                   # (S, CK)

    scale = hd ** -0.5
    m_old = m_ref[:]
    l_old = l_ref[:]
    for hh in range(h):
        sl = slice(hh * hd, (hh + 1) * hd)
        logits = jax.lax.dot_general(
            q[:, hh, :], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ksc * scale)                                  # (S, CK)
        logits = jnp.where(vis, logits, NEG_INF)
        m_new = jnp.maximum(m_old[:, hh], jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_old[:, hh] - m_new)
        p = jnp.exp(logits - m_new[:, None])
        l_new = l_old[:, hh] * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(
            p * vsc, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # (S, hd)
        acc_ref[:, hh, :] = acc_ref[:, hh, :] * alpha[:, None] + pv
        m_ref[:, hh] = m_new
        l_ref[:, hh] = l_new

    @pl.when(i == num_i - 1)
    def _finish():
        out_ref[:] = (acc_ref[:]
                      / jnp.maximum(l_ref[:], 1e-30)[:, :, None]).astype(
            out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "chunk_blocks",
                                    "num_active_blocks", "interpret"))
def paged_flash_decode_stream_flat_q8(q, kpool, vpool, k_scale, v_scale,
                                      vis, li, num_heads: int,
                                      chunk_blocks: int = 8,
                                      num_active_blocks: int | None = None,
                                      interpret: bool = False):
    """int8-pool stream flash decode: kpool/vpool (L, NB, BS, H*hd) int8,
    k_scale/v_scale the CURRENT LAYER's (NB, BS) fp32 per-token symmetric
    scales (serve/paged.py quantize_kv) — the caller slices the layer
    outside the kernel (a ~16 KB dynamic slice XLA fuses) because the TPU
    lowering rejects both the (1, c, bs) -> flat in-kernel reshape and a
    (1, c*bs) block over an (L, NB*BS) array. Same contract as
    paged_flash_decode_stream_flat otherwise."""
    s_slots, h, hd = q.shape
    _, nb_total, bs, dh = kpool.shape
    nb = nb_total if num_active_blocks is None else num_active_blocks
    if nb > nb_total:
        raise ValueError(
            f"num_active_blocks {nb} exceeds pool capacity {nb_total}")
    if vis.shape != (s_slots, nb * bs):
        raise ValueError(
            f"visibility shape {vis.shape} != (slots, bound*block_size) "
            f"({s_slots}, {nb * bs})")
    c = min(chunk_blocks, nb)
    if nb % c:
        raise ValueError(f"bound {nb} not divisible by chunk {c}")
    nbt = k_scale.shape[0]
    # flatten the layer's (NB, BS) scales to one (1, NB*BS) row: the
    # kernel consumes (1, C*BS) tiles, legal because the block's first dim
    # equals the whole array's
    k_scale = k_scale.reshape(1, nbt * bs)
    v_scale = v_scale.reshape(1, nbt * bs)
    kernel = pl.pallas_call(
        functools.partial(_stream_kernel_flat_q8, num_heads=num_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb // c,),
            in_specs=[
                pl.BlockSpec((s_slots, h, hd), lambda i, l: (0, 0, 0)),
                pl.BlockSpec((s_slots, c * bs), lambda i, l: (0, i)),
                pl.BlockSpec((1, c, bs, dh), lambda i, l: (l[0], i, 0, 0)),
                pl.BlockSpec((1, c, bs, dh), lambda i, l: (l[0], i, 0, 0)),
                pl.BlockSpec((1, c * bs), lambda i, l: (0, i)),
                pl.BlockSpec((1, c * bs), lambda i, l: (0, i)),
            ],
            out_specs=pl.BlockSpec((s_slots, h, hd), lambda i, l: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((s_slots, h, hd), jnp.float32),
                pltpu.VMEM((s_slots, num_heads), jnp.float32),
                pltpu.VMEM((s_slots, num_heads), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s_slots, h, hd), q.dtype),
        interpret=interpret,
    )
    return kernel(jnp.asarray(li, jnp.int32).reshape(1), q, vis,
                  kpool, vpool, k_scale, v_scale)


# ---------------------------------------------------------------------------
# FOURTH formulation (round 4): ownership-aware flash decode.
#
# The stream kernel above is VPU-bound, not HBM-bound, at serving shapes:
# every slot computes flash logits/exp against every pool key while owning
# only ~7% of them (int8 halving the streamed bytes moved the step 1.04 ->
# 1.08 ms — measured negative). This kernel restores O(owned) COMPUTE by
# gridding over (slot, owned-chunk): each grid step DMAs a c-block chunk of
# ONE slot's own contiguous block range (RegionAllocator in serve/paged.py
# hands every slot a c-aligned contiguous region) and computes that slot's
# (1, c*BS) flash update only. Total VPU work drops ~S-fold; HBM traffic
# stays ~one pool-prefix read (sum of owned regions), and the step time
# becomes independent of POOL CAPACITY — no more bucketed high-water
# bounds or bucket-crossing recompiles in the serving step.
# ---------------------------------------------------------------------------


def _owner_kernel_flat(sc_ref, idx_ref, li_ref, q_ref, kpool_ref, vpool_ref,
                       out_ref, acc_ref, m_ref, l_ref, *, num_heads: int):
    s = pl.program_id(0)
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    k = kpool_ref[0].astype(jnp.float32)   # (C, BS, DH) dense bf16 tiles
    v = vpool_ref[0].astype(jnp.float32)
    c, bs, dh = k.shape
    ck = c * bs
    h = num_heads
    hd = dh // h
    k = k.reshape(ck, dh)
    v = v.reshape(ck, dh)
    q = q_ref[0].astype(jnp.float32)       # (H, hd)

    # slot-local key positions covered by logical chunk j. The index map
    # CLAMPS the DMA to the last live chunk for j >= nc (in-bounds re-read
    # of already-seen data), so visibility must gate on j < nc as well as
    # the position test — otherwise clamped re-reads double-count keys.
    idx = idx_ref[s]
    nc = (idx + ck) // ck                  # ceil((idx+1)/ck); idx<0 -> 0
    pos = j * ck + jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
    vis = (j < nc) & (pos <= idx)          # (1, CK)

    scale = hd ** -0.5
    # ONE block-diagonal (H, DH) x (DH, CK) matmul replaces H sequential
    # (1, hd) x (hd, CK) dots: the round-4 head loop — not DMA — bounded
    # the kernel (q8 halving of streamed bytes moved the step <4%,
    # benchmarks/RESULTS.json paged_step_owner). Row i of qbd carries
    # q[i] at columns [i*hd, (i+1)*hd) and exact zeros elsewhere, so the
    # full-DH contraction yields the per-head logits unchanged.
    # Mosaic-legal construction only: no (h, h, hd) -> (h, dh) shape cast
    # (infer-vector-layout rejects it). `pick` (hd, DH), pick[i, c] =
    # (c % hd == i), replicates q across the h head blocks via an MXU dot;
    # `blk` zeroes the off-diagonal blocks.
    pick = (jax.lax.broadcasted_iota(jnp.int32, (hd, dh), 1) % hd
            == jax.lax.broadcasted_iota(jnp.int32, (hd, dh), 0)
            ).astype(jnp.float32)
    blk = (jax.lax.broadcasted_iota(jnp.int32, (h, dh), 1) // hd
           == jax.lax.broadcasted_iota(jnp.int32, (h, dh), 0)
           ).astype(jnp.float32)
    qbd = jax.lax.dot_general(
        q, pick, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * blk                                # (H, DH) block-diagonal
    m_old = m_ref[:]                       # (H, 1)
    l_old = l_ref[:]
    logits = jax.lax.dot_general(
        qbd, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                              # (H, CK)
    logits = jnp.where(vis, logits, NEG_INF)
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                               # (H, 1)
    p = jnp.exp(logits - m_new)                                  # (H, CK)
    l_ref[:] = l_old * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    # accumulate the FULL (H, DH) pv: the flash recurrence is linear, so
    # the diagonal hd-blocks of the final accumulator equal the per-head
    # accumulators; _finish extracts them once per slot instead of paying
    # a per-chunk reshape
    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                      # (H, DH)
    acc_ref[0] = acc_ref[0] * alpha + pv

    @pl.when(j == num_j - 1)
    def _finish():
        # fully-masked rows (inactive slots, idx < 0) emit zeros.
        # Diagonal-block extraction as a fold matmul: zero the cross-head
        # blocks, then contract DH back to hd with the same picker
        # ((H, DH) x (DH, hd)) — no shape casts.
        inv_l = 1.0 / jnp.maximum(l_ref[:], 1e-30)       # (H, 1)
        outhd = jax.lax.dot_general(
            acc_ref[0] * blk, pick, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (H, hd)
        out_ref[0] = (outhd * inv_l).astype(out_ref.dtype)


def _owner_kernel_flat_q8(sc_ref, idx_ref, li_ref, q_ref, kpool_ref,
                          vpool_ref, ksc_ref, vsc_ref, out_ref, acc_ref,
                          m_ref, l_ref, *, num_heads: int):
    """int8-pool owner kernel: the bf16 owner kernel measured DMA-BOUND
    (577 GB/s at 16 slots x 16-block regions, vs VPU-bound for the stream
    kernel) — so halving the streamed bytes halves the step here, where it
    measured NEUTRAL for the stream formulation (docs/PERFORMANCE.md int8
    section). Scales fold row-wise into logits/probs exactly like
    _stream_kernel_flat_q8, so the XLA dequant path stays pinnable."""
    s = pl.program_id(0)
    j = pl.program_id(1)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    ksc = ksc_ref[:]                        # (1, CK) fp32
    vsc = vsc_ref[:]
    k = kpool_ref[0].astype(jnp.float32)    # (C, BS, DH) — convert only
    v = vpool_ref[0].astype(jnp.float32)
    c, bs, dh = k.shape
    ck = c * bs
    h = num_heads
    hd = dh // h
    k = k.reshape(ck, dh)
    v = v.reshape(ck, dh)
    q = q_ref[0].astype(jnp.float32)        # (H, hd)

    idx = idx_ref[s]
    nc = (idx + ck) // ck
    pos = j * ck + jax.lax.broadcasted_iota(jnp.int32, (1, ck), 1)
    vis = (j < nc) & (pos <= idx)           # (1, CK)

    scale = hd ** -0.5
    # block-diagonal single-matmul head restructure — see
    # _owner_kernel_flat (Mosaic-legal picker/mask construction, no shape
    # casts); scales fold row-wise ((1, CK) broadcasts over (H, CK))
    # exactly like the per-head formulation
    pick = (jax.lax.broadcasted_iota(jnp.int32, (hd, dh), 1) % hd
            == jax.lax.broadcasted_iota(jnp.int32, (hd, dh), 0)
            ).astype(jnp.float32)
    blk = (jax.lax.broadcasted_iota(jnp.int32, (h, dh), 1) // hd
           == jax.lax.broadcasted_iota(jnp.int32, (h, dh), 0)
           ).astype(jnp.float32)
    qbd = jax.lax.dot_general(
        q, pick, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * blk                                 # (H, DH) block-diagonal
    m_old = m_ref[:]                        # (H, 1)
    l_old = l_ref[:]
    logits = jax.lax.dot_general(
        qbd, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (ksc * scale)                       # (H, CK)
    logits = jnp.where(vis, logits, NEG_INF)
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_old - m_new)                               # (H, 1)
    p = jnp.exp(logits - m_new)                                  # (H, CK)
    l_ref[:] = l_old * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    pv = jax.lax.dot_general(
        p * vsc, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                       # (H, DH)
    acc_ref[0] = acc_ref[0] * alpha + pv

    @pl.when(j == num_j - 1)
    def _finish():
        inv_l = 1.0 / jnp.maximum(l_ref[:], 1e-30)       # (H, 1)
        outhd = jax.lax.dot_general(
            acc_ref[0] * blk, pick, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # (H, hd)
        out_ref[0] = (outhd * inv_l).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "chunk_blocks", "max_chunks",
                                    "interpret"))
def paged_flash_decode_owner_q8(q, kpool, vpool, k_scale, v_scale,
                                start_block, index, li, num_heads: int,
                                chunk_blocks: int, max_chunks: int,
                                interpret: bool = False):
    """int8-pool ownership-aware flash decode: kpool/vpool flat
    (L, NB, BS, H*hd) int8, k_scale/v_scale the CURRENT LAYER's (NB, BS)
    fp32 per-token symmetric scales (the caller slices the layer outside —
    same TPU lowering constraint as the q8 stream kernel). Contract
    otherwise identical to paged_flash_decode_owner."""
    s_slots, h, hd = q.shape
    _, nbt, bs, dh = kpool.shape
    c = chunk_blocks
    if not interpret and (c * bs) % 128:
        raise ValueError(
            f"owner kernel: chunk_blocks*block_size ({c * bs}) must be a "
            "128-lane multiple on TPU")
    ck = c * bs
    k_scale = k_scale.reshape(1, nbt * bs)
    v_scale = v_scale.reshape(1, nbt * bs)

    def kmap(s, j, sc, idx, l):
        nc = (idx[s] + ck) // ck
        jc = jnp.minimum(j, jnp.maximum(nc - 1, 0))
        return (l[0], sc[s] // c + jc, 0, 0)

    def scmap(s, j, sc, idx, l):
        nc = (idx[s] + ck) // ck
        jc = jnp.minimum(j, jnp.maximum(nc - 1, 0))
        return (0, sc[s] // c + jc)

    kernel = pl.pallas_call(
        functools.partial(_owner_kernel_flat_q8, num_heads=num_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(s_slots, max_chunks),
            in_specs=[
                pl.BlockSpec((1, h, hd), lambda s, j, sc, idx, l: (s, 0, 0)),
                pl.BlockSpec((1, c, bs, dh), kmap),
                pl.BlockSpec((1, c, bs, dh), kmap),
                pl.BlockSpec((1, ck), scmap),
                pl.BlockSpec((1, ck), scmap),
            ],
            out_specs=pl.BlockSpec((1, h, hd),
                                   lambda s, j, sc, idx, l: (s, 0, 0)),
            scratch_shapes=[
                # (H, DH) full-pv accumulator: _finish extracts the
                # diagonal hd-blocks (block-diagonal head restructure)
                pltpu.VMEM((1, h, dh), jnp.float32),
                pltpu.VMEM((num_heads, 1), jnp.float32),
                pltpu.VMEM((num_heads, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s_slots, h, hd), q.dtype),
        interpret=interpret,
    )
    return kernel(start_block, index, jnp.asarray(li, jnp.int32).reshape(1),
                  q, kpool, vpool, k_scale, v_scale)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "chunk_blocks", "max_chunks",
                                    "interpret"))
def paged_flash_decode_owner(q, kpool, vpool, start_block, index, li,
                             num_heads: int, chunk_blocks: int,
                             max_chunks: int, interpret: bool = False):
    """Ownership-aware flash decode: q (S, H, hd); kpool/vpool flat
    (L, NB, BS, H*hd); start_block (S,) int32 = FIRST physical block of
    each slot's contiguous range (must be chunk_blocks-aligned; the
    RegionAllocator guarantees it); index (S,) int32 current position per
    slot, -1 for inactive slots (their rows come back zero); li scalar
    layer index.

    Equivalent to softmax(q . K_own / sqrt(hd)) @ V_own over slot-local key
    positions <= index, where slot s's position p lives at physical block
    start_block[s] + p // BS. Grid (S, max_chunks): step (s, j) streams
    chunk j of slot s's region — the whole region [start, start +
    max_chunks*chunk_blocks) must lie inside the pool (the allocator only
    hands out full in-pool regions). Chunks past the slot's live prefix
    clamp their DMA to the last live chunk and mask the compute, so dead
    region tails cost bandwidth only when allocated.
    """
    s_slots, h, hd = q.shape
    _, nb_total, bs, dh = kpool.shape
    c = chunk_blocks
    if not interpret and (c * bs) % 128:
        raise ValueError(
            f"owner kernel: chunk_blocks*block_size ({c * bs}) must be a "
            "128-lane multiple on TPU")
    ck = c * bs

    def kmap(s, j, sc, idx, l):
        # clamp to the last live chunk (j >= nc re-reads in-bounds data the
        # kernel masks out); inactive slots (idx=-1 -> nc=0) read chunk 0
        # of their (stale or trash) region, fully masked
        nc = (idx[s] + ck) // ck
        jc = jnp.minimum(j, jnp.maximum(nc - 1, 0))
        return (l[0], sc[s] // c + jc, 0, 0)

    kernel = pl.pallas_call(
        functools.partial(_owner_kernel_flat, num_heads=num_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(s_slots, max_chunks),
            in_specs=[
                pl.BlockSpec((1, h, hd), lambda s, j, sc, idx, l: (s, 0, 0)),
                pl.BlockSpec((1, c, bs, dh), kmap),
                pl.BlockSpec((1, c, bs, dh), kmap),
            ],
            out_specs=pl.BlockSpec((1, h, hd),
                                   lambda s, j, sc, idx, l: (s, 0, 0)),
            scratch_shapes=[
                # (H, DH) full-pv accumulator: _finish extracts the
                # diagonal hd-blocks (block-diagonal head restructure)
                pltpu.VMEM((1, h, dh), jnp.float32),
                pltpu.VMEM((num_heads, 1), jnp.float32),
                pltpu.VMEM((num_heads, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s_slots, h, hd), q.dtype),
        interpret=interpret,
    )
    return kernel(start_block, index, jnp.asarray(li, jnp.int32).reshape(1),
                  q, kpool, vpool)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "chunk_blocks",
                                    "num_active_blocks", "interpret"))
def paged_flash_decode_stream_flat(q, kpool, vpool, vis, li, num_heads: int,
                                   chunk_blocks: int = 8,
                                   num_active_blocks: int | None = None,
                                   interpret: bool = False):
    """Flat-KV variant of the stream kernel: pools are (L, NB, BS, H*hd) so
    each chunk's trailing dims (BS=64, 512) map to DENSE bf16 tiles — the
    5-D layout's (H=8, hd=64) trailing dims force padded (16, 128) tiles
    and waste HBM bandwidth on every chunk DMA. q/out stay (S, H, hd);
    per-head K/V columns are 64-lane read slices of the flat chunk."""
    s_slots, h, hd = q.shape
    _, nb_total, bs, dh = kpool.shape
    nb = nb_total if num_active_blocks is None else num_active_blocks
    if nb > nb_total:
        # an oversized bound would drive the BlockSpec index map past the
        # pool's end — Pallas out-of-range block reads return garbage
        # rather than failing, silently corrupting attention output
        raise ValueError(
            f"num_active_blocks {nb} exceeds pool capacity {nb_total}")
    if vis.shape != (s_slots, nb * bs):
        raise ValueError(
            f"visibility shape {vis.shape} != (slots, bound*block_size) "
            f"({s_slots}, {nb * bs})")
    c = min(chunk_blocks, nb)
    if nb % c:
        raise ValueError(f"bound {nb} not divisible by chunk {c}")
    kernel = pl.pallas_call(
        functools.partial(_stream_kernel_flat, num_heads=num_heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb // c,),
            in_specs=[
                pl.BlockSpec((s_slots, h, hd), lambda i, l: (0, 0, 0)),
                pl.BlockSpec((s_slots, c * bs), lambda i, l: (0, i)),
                pl.BlockSpec((1, c, bs, dh), lambda i, l: (l[0], i, 0, 0)),
                pl.BlockSpec((1, c, bs, dh), lambda i, l: (l[0], i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((s_slots, h, hd), lambda i, l: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((s_slots, h, hd), jnp.float32),
                pltpu.VMEM((s_slots, num_heads), jnp.float32),
                pltpu.VMEM((s_slots, num_heads), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((s_slots, h, hd), q.dtype),
        interpret=interpret,
    )
    return kernel(jnp.asarray(li, jnp.int32).reshape(1), q, vis,
                  kpool, vpool)
