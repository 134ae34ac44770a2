"""Continuous-batched AR decode engine for UniSE serving (paged KV cache).

The BASELINE north star: "decoder-only AR-LM ... runs continuous-batched TPU
decode with a paged KV cache; mixed-task requests saturate the MXU instead of
running per-task Python loops."

Design: a fixed pool of S slots. KV lives in a shared block pool
(serve/paged.py); each slot owns a block table sized to its request, so
memory scales with tokens actually cached. ``admit_many()`` prefills a WAVE
of requests in one dispatch — prompts are padded to static length buckets
(compile-once per signature), mixed tasks batch together (task identity is
just an embedding row, llm_sft.py:29,60), and the prefilled KV is scattered
straight into the pool inside the same program. ``step()`` advances ALL
active slots one token per step in a single lax.scan'd program with
per-slot cache positions, per-slot RNG, and PER-REQUEST sampling params
(temperature / top_k / top_p vectorized over slots). Finished slots are
harvested and their blocks released without stopping the pool.

Prompt padding correctness: padded positions sit strictly to the RIGHT of
every real token (enroll/mix segments are compacted left in-graph before
prefill), so causal attention never sees a pad key, RoPE positions of real
tokens are contiguous from 0 (exactly the unpadded layout), and the garbage
KV written at positions >= true_len is overwritten by each decode step
before it ever becomes visible (the step at index i rewrites position i and
attends key_pos <= i). The paged path is therefore numerically identical to
``LLMSFT.generate`` (tests/test_engine.py pins greedy equivalence).

Waveform admission: engines built with ``feature_fn`` accept requests
carrying RAW AUDIO (``Request.mix_wav``/``enroll_wav``) — int16 samples
cross the host->device link (~2.5x fewer bytes than bf16 feature frames;
the link is the measured serving bottleneck at ~70 MB/s, and transfers do
NOT overlap dispatched compute on this backend — benchmarks/
probe_staging.py) and the SSL frontend runs batched on device at admission
time — by default as its own jitted per-bucket program feeding the feats
prefill program (``fuse_frontend=True`` traces it into the prefill program
instead; bit-identical, but the monolithic HLO compiles pathologically on
remote-compile backends). Mix and enroll choose their wire independently
(hybrid): a
frontend with global attention computes different features for
bucket-padded audio, so partial-bucket enrolls ride as exact-length
precomputed features while full-segment audio rides the sample wire with
zero approximation.

Scheduling (run()) is DETERMINISTIC and sync-free between waves: decode
lengths are fixed, so completions are known host-side; finished slots are
reaped and reused by displacing admissions whose insert program stashes the
finished outputs in-graph; the host fetches stashes while the next wave's
decode chunks (an exact power-of-two decomposition to the next completion
point) execute on device. Every host<->device interaction on a
tunnel-attached chip costs ~25 ms — the design keeps them off the critical
path (measured 2.9x sustained throughput over the sync-per-wave scheduler).
"""
from __future__ import annotations

import math
import time
from collections import deque
from dataclasses import dataclass, replace
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.lm.llama import (LlamaConfig, init_cache, range_mask,
                               sample_logits_vec)
from ..models.lm.sft import LLMSFT
from .paged import (TRASH_BLOCK, BlockAllocator, RegionAllocator,
                    init_pool, paged_decode_ids,
                    scatter_prefill)

PHASE_GLOBAL, PHASE_SEMANTIC, PHASE_DONE = 0, 1, 2


@dataclass
class Request:
    """One serving request. Inputs are EITHER precomputed SSL features
    (``mix_feats``/``enroll_feats``) or raw waveforms (``mix_wav``/
    ``enroll_wav``, engines built with ``feature_fn``): waveform admission
    ships ~2.5x fewer bytes over the host->device link (int16 samples vs
    bf16 feature frames) and runs the SSL frontend batched on device inside
    the prefill program — on tunnel-attached chips the link is the measured
    bottleneck (~70 MB/s, benchmarks/probe_staging.py)."""
    task_id: int
    mix_feats: Optional[np.ndarray] = None  # (T, D)
    enroll_feats: Optional[np.ndarray] = None  # (T, D) or None
    mix_wav: Optional[np.ndarray] = None  # (N,) float in [-1, 1]
    enroll_wav: Optional[np.ndarray] = None  # (N,) or None
    # inputs that already live ON DEVICE (serve/cascade.py: the SS
    # cascade's SE-phase output featurized in place, and segment features
    # shared between its TSE and rTSE passes): the true frame count here,
    # with the (buffer, row) references supplied via stage_request()
    # before admission — the feature rows never cross the host link
    mix_device_frames: Optional[int] = None
    enroll_device_frames: Optional[int] = None
    global_length: int = 32
    semantic_length: int = 250
    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.95
    do_sample: bool = True
    uid: int = 0

    @property
    def is_wav(self) -> bool:
        return self.mix_wav is not None


@dataclass
class Result:
    uid: int
    global_ids: np.ndarray
    semantic_ids: np.ndarray


@jax.jit
def _scatter_rows(zero, buf, pos, rows):
    """zero (B, ...), buf (N, ...), pos/rows (B,) -> zero with
    zero[pos[i]] = buf[rows[i]]; pos entries >= B are dropped (padding).
    One compiled program per (zero, buf) shape pair — index vectors are
    always full length, so live-row count never changes the program."""
    return zero.at[pos].set(buf[rows], mode="drop", unique_indices=True)


def _dequant_feats_vals(rows):
    """int8 feature-wire rows (..., F, D+1) -> (..., F, D) fp32 features.
    The last column is a per-frame power-of-two exponent e; values
    dequantize as q * 2^e (see _quantize_feats_row). Zero rows (zero
    template / padding) carry e=0, q=0 -> exact zeros."""
    q = rows[..., :-1].astype(jnp.float32)
    e = rows[..., -1:].astype(jnp.float32)
    return q * jnp.exp2(e)


@partial(jax.jit, static_argnames=("out_dtype",))
def _dequant_feats(rows, out_dtype):
    return _dequant_feats_vals(rows).astype(out_dtype)


@jax.jit
def _scatter_rows_dequant(zero, buf, pos, rows):
    """_scatter_rows with the int8 feature-wire dequant FUSED into the one
    gather+scatter program: an extra dispatch per wave costs ~25 ms of
    serialized link time on tunnel-attached chips (measured: separate
    dequant dispatches made the int8 wire a net LOSS at 16 slots)."""
    vals = _dequant_feats_vals(buf[rows]).astype(zero.dtype)
    return zero.at[pos].set(vals, mode="drop", unique_indices=True)


def _quantize_feats_row(x: np.ndarray) -> np.ndarray:
    """(F, D) float features -> (F, D+1) int8 wire row: symmetric int8 with
    a PER-FRAME power-of-two scale stored as an exponent in the last column.
    Power-of-two scales cost <=1 bit of precision vs exact max-abs scales
    but keep the wave buffer a SINGLE int8 transfer (no side scale buffer,
    no second dispatch) — ~41 dB feature SNR at half the bf16 wire bytes."""
    x = np.asarray(x, np.float32)
    m = np.abs(x).max(axis=-1)
    e = np.ceil(np.log2(np.maximum(m, 1e-30) / 127.0))
    e = np.clip(e, -100.0, 100.0)
    q = np.clip(np.rint(x * np.exp2(-e)[:, None]), -127, 127)
    return np.concatenate([q, e[:, None]], axis=-1).astype(np.int8)


def _wire_to_float(x):
    """Decode staged waveform rows from the wire dtype (traceable). Shared
    by the split-mode frontend program and the fused prefill path — the two
    MUST decode identically for the documented fused/split bit-equality
    guarantee (and for int16 exactness vs the host feature path)."""
    if x.dtype == jnp.int16:
        return x.astype(jnp.float32) * (1.0 / 32768.0)
    return x.astype(jnp.float32)


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 0).bit_length()


def _pick_bucket(n: int, buckets: Sequence[int], what: str) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"{what} length {n} exceeds largest bucket {buckets[-1]}")


def segment_chunks(remaining: int, max_rem: int, poll_interval: int,
                   overshoot: float, coarse: bool = False) -> List[int]:
    """Pow2 chunk decomposition of a decode segment, minimizing the
    DISPATCH COUNT: every dispatch costs a host enqueue and — on a relay
    that has stopped pipelining deliveries — a serialized link latency
    that no amount of device speed can hide, while an overshot device
    step is in-graph no-ops (finished rows are fully masked in both
    engines' step programs). A chunk may round UP to the next pow2 while
    the cumulative overshoot stays within ``overshoot`` of the segment
    (283-token mixed-task waves then take 2 dispatches instead of 5-8).
    ``coarse`` additionally spends the other slots' live work
    (``max_rem - remaining``) as budget — those steps are productive for
    at least one slot. Chunk sizes stay inside the warmed pow2 program
    set (all <= poll_interval). Shared by ContinuousBatchingEngine and
    UniTokEngine."""
    budget = int(remaining * overshoot)
    if coarse:
        budget += max(0, max_rem - remaining)
    chunks: List[int] = []
    rem = remaining
    while rem > 0:
        up = 1 << max(rem - 1, 0).bit_length()  # next pow2 >= rem
        if up <= poll_interval and up - rem <= budget:
            budget -= up - rem
            chunks.append(up)
            break
        c = min(poll_interval, 1 << (rem.bit_length() - 1))
        chunks.append(c)
        rem -= c
    return chunks


class ContinuousBatchingEngine:
    """Slot-pool continuous batching over a paged KV block pool."""

    @property
    def pool(self):
        return self._pool_ref.pool

    @pool.setter
    def pool(self, value):
        self._pool_ref.pool = value

    def __init__(
        self,
        sft: LLMSFT,
        params,
        num_slots: int = 8,
        block_size: int = 64,
        num_blocks: Optional[int] = None,
        max_global: int = 32,
        max_semantic: int = 256,
        mix_buckets: Sequence[int] = (64, 128, 256, 320),
        enroll_buckets: Optional[Sequence[int]] = None,
        max_top_k: int = 256,
        pool_ref=None,
        allocator=None,
        dtype=None,
        use_flash_kernel=None,
        owner_chunk_blocks: int = 14,
        unify_waves: bool = True,
        feature_fn=None,
        feature_params=None,
        wav_buckets: Optional[Sequence[int]] = None,
        enroll_wav_buckets: Optional[Sequence[int]] = None,
        wav_wire: str = "int16",
        feats_wire: str = "bf16",
        fuse_frontend: bool = False,
        eager_drain: bool = False,
        kv_quant: Optional[str] = None,
        link_adapt: bool = True,
        degraded_dispatch_ms: float = 25.0,
        dispatch_overshoot: float = 0.05,
    ):
        """``feature_fn(feature_params, wav (B, N)) -> (B, F, D)`` enables
        waveform admission (Request.mix_wav): the SSL frontend runs batched
        on device at admission time and raw samples cross the host->device
        link instead of feature frames. ``wav_buckets`` are sample-length
        buckets (pow-2-ish, like ``mix_buckets``); ``wav_wire`` is the
        staging dtype on the link: "int16" (exact for 16-bit PCM, half the
        bytes of fp32), "float16" or "float32".

        ``fuse_frontend`` picks where the frontend runs. False (default):
        a SEPARATE jitted per-bucket program whose feature output stays on
        device and feeds the regular feats prefill program — one extra
        dispatch per wave (~25 ms on tunnel-attached chips), but each
        program compiles in minutes. True: the frontend is traced INTO the
        prefill+insert program (single dispatch per wave) — on the
        remote-compile deployment that monolithic HLO (full SSL encoder +
        prompt assembly + LM prefill + pool scatter) compiled
        pathologically (>40 min fresh, measured), so fusion is opt-in for
        backends with a fast local compiler. Outputs are bit-identical
        either way (same programs, same dtypes).

        ``feats_wire`` is the staging dtype for FEATURE rows on the link:
        "bf16" (engine compute dtype, lossless vs the offline path) or
        "int8" (symmetric int8 with a per-frame power-of-two scale packed
        into the row — half the staged bytes, ~41 dB feature SNR,
        dequantized by one tiny jitted program per wave). On links that
        serialize transfers with compute (docs/PERFORMANCE.md:
        probe_staging measured NO overlap on the tunnel relay), staged
        bytes are on the serving critical path, so halving them buys
        throughput directly. Features exactly representable as
        int8 x 2^e round-trip bit-identically.

        ``kv_quant="int8"`` stores the KV pool as symmetric int8 with one
        fp32 scale per (layer, token, k|v) (serve/paged.py quantize_kv).
        The decode step streams the whole allocated pool prefix every
        token, so halving pool bytes halves the HBM-bound decode floor;
        quality cost is per-token KV rounding (~0.4% relative). Engines
        sharing a pool must agree (inferred from the pool for pool_ref
        engines).

        ``eager_drain`` picks when stashed outputs (from displacing
        inserts) are fetched. False (default): all stashes accumulate on
        device and drain in ONE batched fetch when the run ends — fewer
        round trips on links that serialize transfers with compute
        (measured 12.6k vs 9.4k tok/s at 16 slots on the tunnel relay).
        True: once per wave, right after the first decode chunk of the
        next wave is dispatched — overlaps the fetch with decode when the
        link allows it, and bounds host memory for unbounded request
        streams. Results are identical; only fetch timing changes.

        ``link_adapt`` (default True) makes ``run()`` degrade gracefully on
        a degraded link (docs/PERFORMANCE.md "third failure mode": the
        relay intermittently stops pipelining dispatches, so every step
        dispatch blocks ~RTT instead of enqueueing asynchronously).
        ``step()`` records per-dispatch wall times; once their median
        exceeds ``degraded_dispatch_ms``, run() switches to a COARSE step
        decomposition — one power-of-two dispatch per completion segment
        (rounding the segment UP) instead of the popcount-many exact
        decomposition. Overshoot is exactly correct: the in-graph phase
        machinery no-ops finished slots (KV scatters route to the trash
        block, outputs/state freeze), so overshot steps keep decoding the
        OTHER live slots — the only cost is admissions landing at the
        overshot boundary. Overshoot is gated to never exceed the longest
        live request, and the chunk sizes stay in the same pow2 program
        set (no new compiles). Results are bit-identical either way.

        ``dispatch_overshoot`` (default 0.05) additionally lets EVERY
        segment round a chunk up to the next pow2 while the cumulative
        overshoot stays within that fraction of the segment — the relay's
        delivery-serialization failure mode is invisible to dispatch
        walls (enqueue stays ~1 ms while deliveries queue), so minimizing
        dispatch count unconditionally is the robust mitigation; on a
        healthy link the saved enqueues roughly pay for the ~2% of no-op
        device steps (_segment_chunks). 0 restores the exact popcount
        decomposition."""
        self.sft = sft
        self.cfg = cfg = sft.cfg
        if dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                params,
            )
        self.params = params
        self.kv_dtype = params["params"]["lm"]["codec_embedding"][
            "embedding"].dtype
        self.num_slots = num_slots
        self.block_size = block_size
        self.max_global = max_global
        self.max_semantic = max_semantic
        self.mix_buckets = tuple(sorted(mix_buckets))
        self.enroll_buckets = tuple(sorted(enroll_buckets or mix_buckets))
        self.max_top_k = max_top_k
        # Pallas flash-decode kernel mode (serve/paged.py use_kernel):
        # "owner" (default on TPU) = ownership-aware kernel over contiguous
        # RegionAllocator ranges — O(owned) compute per slot and step time
        # independent of pool capacity; "stream" = round-3 full-stream
        # kernel (every slot against the whole bounded pool prefix,
        # measured VPU-bound at 16+ slots); False = XLA einsum attention.
        # int8 pools ride the matching q8 kernel variant on either path
        # (serve/paged.py routes owner+int8 onto paged_flash_decode_owner_q8).
        # Interpret-mode-correct off-TPU but slow — tests opt in
        # explicitly.
        if use_flash_kernel is None:
            use_flash_kernel = (
                "owner" if jax.default_backend() == "tpu" else False)
        if use_flash_kernel is True:
            use_flash_kernel = "stream"
        self.use_flash_kernel = use_flash_kernel or ""
        if self.use_flash_kernel not in ("", "stream", "owner"):
            raise ValueError(
                f"use_flash_kernel={use_flash_kernel!r}: expected None, "
                "bool, 'stream' or 'owner'")
        self.owner_chunk_blocks = owner_chunk_blocks
        # one admission wave (and ONE prefill program) per mix bucket even
        # for mixed se/tse/rtse traffic: enroll-less requests ride the
        # with-enroll program with zero enroll rows that the head-compaction
        # gather drops (n_head=1). Splitting by enroll presence ran TWO
        # full-width padded prefills per wave (measured 2x prefill waves on
        # the mixed-task bench)
        self.unify_waves = unify_waves

        self.feature_fn = feature_fn
        self.feature_params = feature_params if feature_params is not None \
            else {}
        # the frontend pytree packs into ONE flat buffer per dtype — a
        # ~250-tensor frontend measurably dominates the prefill DISPATCH
        # cost on remote-attached chips (per-buffer arg marshaling,
        # ~150 ms/wave vs ~34 ms packed); unpacking inside the program is
        # static slices XLA fuses away (utils/param_pack.py). Weights stay
        # in their given dtype (fp32 frontend == the host-side feature
        # path's numerics exactly).
        self._feat_packed = None
        self._feat_spec = None
        self._feat_skeleton = None
        self.fuse_frontend = fuse_frontend
        self.eager_drain = eager_drain
        if feature_fn is not None:
            # stateless frontends (feature_params=None, e.g. a pure fbank
            # fn) pack the empty pytree — the frontend program must exist
            # for every engine that can admit waveform requests
            from ..utils.param_pack import pack_pytree, unpack_pytree

            fp = self.feature_params
            self._feat_skeleton = jax.tree_util.tree_map(
                lambda p: jax.ShapeDtypeStruct(jnp.shape(p),
                                               jnp.asarray(p).dtype), fp)
            self._feat_packed, self._feat_spec = pack_pytree(fp)

            kv_dtype = self.kv_dtype

            @jax.jit
            def _frontend_program(feat_packed, wav_wire_rows):
                """Split-mode frontend: wire decode + SSL features for one
                staged wave buffer. Output (B, F, D) in the engine dtype
                stays on device and feeds the feats prefill program."""
                fvars = unpack_pytree(feat_packed, self._feat_spec,
                                      self._feat_skeleton)
                return feature_fn(
                    fvars, _wire_to_float(wav_wire_rows)).astype(kv_dtype)

            self._frontend_program = _frontend_program
        if wav_wire not in ("int16", "float16", "float32"):
            raise ValueError(f"wav_wire {wav_wire!r} not in "
                             "('int16', 'float16', 'float32')")
        self.wav_wire = wav_wire
        if feats_wire not in ("bf16", "int8"):
            raise ValueError(f"feats_wire {feats_wire!r} not in "
                             "('bf16', 'int8')")
        self.feats_wire = feats_wire
        self.wav_buckets = tuple(sorted(wav_buckets or ()))
        self.enroll_wav_buckets = tuple(
            sorted(enroll_wav_buckets or self.wav_buckets))
        if self.wav_buckets and feature_fn is None:
            raise ValueError("wav_buckets requires feature_fn")
        # sample-bucket -> feature-frame count, resolved by abstract
        # evaluation of feature_fn (exact for any frontend, no hardcoded
        # stride math); also extends mix/enroll FRAME buckets so prompt
        # assembly and table sizing see the wav-admitted lengths
        self._frames_cache: Dict[int, int] = {}
        if self.wav_buckets:
            mix_f = {self._frames_for(b) for b in self.wav_buckets}
            enr_f = {self._frames_for(b) for b in self.enroll_wav_buckets}
            self.mix_buckets = tuple(sorted(set(self.mix_buckets) | mix_f))
            self.enroll_buckets = tuple(
                sorted(set(self.enroll_buckets) | enr_f))

        # table width: enough logical blocks for the largest possible request
        max_prompt = 3 + self.enroll_buckets[-1] + self.mix_buckets[-1]
        max_tokens = max_prompt + max_global + 1 + max_semantic + 1
        self.max_blocks = math.ceil(max_tokens / block_size)
        owner = self.use_flash_kernel == "owner"
        # region size for owner-mode contiguous allocation: the kernel
        # reads ceil(max_blocks/c) chunks of c blocks per slot, so regions
        # are that many blocks and every slot's range stays in-pool
        self._region_blocks = (
            -(-self.max_blocks // owner_chunk_blocks) * owner_chunk_blocks)
        if num_blocks is None:
            if owner:
                # one region per slot + the reserved trash region + one
                # spare, rounded to the 64-block granularity shared-pool
                # stream engines need
                num_blocks = -(-((num_slots + 2)
                                 * self._region_blocks) // 64) * 64
            else:
                # +1 trash block, then rounded to the 64-block bucket
                # granularity: the decode bound (_block_bound) is then
                # always a 64-multiple, which the Pallas stream kernel
                # needs to chunk evenly (chunk*block_size must tile to 128
                # lanes); the spare blocks are allocator headroom. An
                # explicit num_blocks is honored as-is (the kernel raises
                # on incompatible bounds).
                num_blocks = -(-(1 + num_slots * self.max_blocks) // 64) * 64
        self.num_blocks = num_blocks

        if pool_ref is not None:
            # shared physical pool (serve/paged.py PoolRef): blocks are
            # partitioned between engines by the shared allocator
            assert allocator is not None, "shared pool needs its allocator"
            self._pool_ref = pool_ref
            self.allocator = allocator
            self.num_blocks = num_blocks = pool_ref.pool["k"].shape[1]
            # every engine on one pool must agree on its storage format
            self.kv_quant = ("int8" if "k_scale" in pool_ref.pool else None)
            if kv_quant is not None and kv_quant != self.kv_quant:
                raise ValueError(
                    f"kv_quant={kv_quant!r} conflicts with the shared "
                    f"pool's storage ({self.kv_quant!r})")
        else:
            from .paged import PoolRef

            self.kv_quant = kv_quant
            self._pool_ref = PoolRef(
                init_pool(cfg, num_blocks, block_size, dtype=self.kv_dtype,
                          quant=kv_quant))
            if allocator is None:
                allocator = (RegionAllocator(num_blocks, self._region_blocks)
                             if owner else BlockAllocator(num_blocks))
            self.allocator = allocator
        if owner:
            # the owner kernel's contiguity/alignment/in-pool invariants
            # are the RegionAllocator's contract — enforce the pairing
            if not isinstance(self.allocator, RegionAllocator):
                raise ValueError(
                    "use_flash_kernel='owner' requires a RegionAllocator "
                    "(contiguous chunk-aligned per-slot block ranges)")
            ra = self.allocator
            if (ra.region_blocks % owner_chunk_blocks
                    or ra.region_blocks < self._region_blocks):
                raise ValueError(
                    f"owner kernel: allocator regions ({ra.region_blocks} "
                    f"blocks) must be a multiple of owner_chunk_blocks "
                    f"({owner_chunk_blocks}) and cover max_blocks "
                    f"({self.max_blocks})")
        self._slot_blocks: List[List[int]] = [[] for _ in range(num_slots)]
        self._uids: List[Optional[int]] = [None] * num_slots
        self._phase_cache: Optional[np.ndarray] = None
        # host-side mirror of each slot's remaining decode steps: decode
        # lengths are FIXED (global_length+1 then semantic_length, no EOS
        # early-exit — mirroring llm_sft.py's fixed-length phases), so the
        # scheduler knows exactly when the next slot completes and only
        # pays a device->host sync at those points
        self._remaining: List[int] = [0] * num_slots
        # host-side mirror of each slot's do_sample: when NO live slot
        # samples, step() dispatches the sampler-free greedy step variant
        # (static flag — a separate compiled program family)
        self._slot_sampled: List[bool] = [False] * num_slots

        s = num_slots
        self.state = {
            "phase": jnp.full((s,), PHASE_DONE, jnp.int32),
            "steps_in_phase": jnp.zeros((s,), jnp.int32),
            "global_len": jnp.zeros((s,), jnp.int32),
            "semantic_len": jnp.zeros((s,), jnp.int32),
            "last_ids": jnp.zeros((s,), jnp.int32),
            "rng": jnp.zeros((s, 2), jnp.uint32),
            "do_sample": jnp.zeros((s,), jnp.bool_),
            "temperature": jnp.ones((s,), jnp.float32),
            "top_k": jnp.ones((s,), jnp.int32),
            "top_p": jnp.ones((s,), jnp.float32),
            "index": jnp.zeros((s,), jnp.int32),
            "block_tables": jnp.full((s, self.max_blocks), TRASH_BLOCK,
                                     jnp.int32),
            "out_global": jnp.zeros((s, max_global), jnp.int32),
            "out_semantic": jnp.zeros((s, max_semantic), jnp.int32),
        }

        gmask = range_mask(cfg, cfg.global_offset, cfg.global_size)
        smask = range_mask(cfg, cfg.semantic_offset, cfg.semantic_size)
        kv_dtype, bs = self.kv_dtype, block_size

        @partial(jax.jit,
                 static_argnames=("with_enroll", "mix_is_wav",
                                  "enroll_is_wav"),
                 donate_argnums=(1, 2))
        def _prefill_insert(params, pool, state, with_enroll, tables,
                            mix_feats, enroll_feats, meta_i, rngs, meta_f,
                            mix_is_wav=False, enroll_is_wav=False,
                            feat_params=None):
            """Prefill a wave of B prompts and insert them into the pool +
            state in ONE dispatched program (no per-request host syncs).
            Per-row metadata arrives packed (meta_i int32 / rngs uint32 /
            meta_f fp32 — three transfers, not eleven). With
            ``mix_is_wav``/``enroll_is_wav`` the corresponding input is RAW
            SAMPLE rows in the wire dtype; the SSL frontend
            (``feature_fn``) runs right here, batched over the wave — raw
            samples cross the link instead of feature frames, and the
            per-request host-side feature round trip disappears entirely."""
            slot_ids, task_ids, n_head, true_total = (
                meta_i[:, 0], meta_i[:, 1], meta_i[:, 2], meta_i[:, 3])
            glens, slens, top_ks = meta_i[:, 4], meta_i[:, 5], meta_i[:, 6]
            do_samples = meta_i[:, 7] != 0
            temps, top_ps = meta_f[:, 0], meta_f[:, 1]


            if mix_is_wav or (enroll_is_wav and with_enroll):
                from ..utils.param_pack import unpack_pytree

                # feat_params arrives as the PACKED buffers (one per dtype:
                # dispatch marshals 1-2 handles, not ~250); the spec /
                # skeleton are tiny static metadata, safe as closures
                fvars = unpack_pytree(feat_params, self._feat_spec,
                                      self._feat_skeleton)
            if mix_is_wav:
                mix_feats = self.feature_fn(
                    fvars, _wire_to_float(mix_feats)).astype(kv_dtype)
            if enroll_is_wav and with_enroll:
                enroll_feats = self.feature_fn(
                    fvars, _wire_to_float(enroll_feats)).astype(kv_dtype)
            prompt = self.sft.apply(
                params, task_ids,
                enroll_feats if with_enroll else None, mix_feats,
                method="_prompt",
            )  # (B, La, D) — assembled with bucket-padded segments
            b_wave, la, _ = prompt.shape
            if with_enroll:
                # compact real tokens left: enroll pad sits between the
                # enroll and mix segments; gather real positions contiguous
                # so RoPE/cache layout matches the unpadded prompt exactly.
                # n_head = 1 marks an enroll-less row riding a unified wave
                # (head is the task embedding alone; enroll_sos + zero
                # enroll are compacted out with the pad)
                le_b = enroll_feats.shape[1]
                t = jnp.arange(la)[None]
                src = jnp.where(t < n_head[:, None], t,
                                t - n_head[:, None] + 2 + le_b)
                src = jnp.clip(src, 0, la - 1)
                prompt = jnp.take_along_axis(prompt, src[..., None], axis=1)

            cache = init_cache(cfg, b_wave, la, dtype=kv_dtype)
            _, cache = self.sft.apply(
                params, prompt.astype(kv_dtype), cache,
                method=lambda m, p, c: m.lm.prefill(p, c),
            )
            pool = scatter_prefill(pool, tables, cache["k"], cache["v"], bs)

            st = dict(state)

            # STASH the displaced slots' finished outputs before the insert
            # overwrites them: the host fetches this AFTER dispatching the
            # next decode chunks, so the ~25 ms fetch round trip overlaps
            # with decode instead of stalling the pool between waves
            rows = jnp.minimum(slot_ids, self.num_slots - 1)
            stash = {
                "g": st["out_global"][rows],
                "s": st["out_semantic"][rows],
                "glen": st["global_len"][rows],
                "slen": st["semantic_len"][rows],
            }

            def upd(name, vals):
                st[name] = st[name].at[slot_ids].set(vals, mode="drop")

            upd("block_tables", tables)
            upd("index", true_total)
            upd("phase", jnp.full((b_wave,), PHASE_GLOBAL, jnp.int32))
            upd("steps_in_phase", jnp.zeros((b_wave,), jnp.int32))
            upd("global_len", glens)
            upd("semantic_len", slens)
            upd("last_ids", jnp.full((b_wave,), cfg.global_sos, jnp.int32))
            upd("rng", rngs)
            upd("do_sample", do_samples)
            upd("temperature", temps)
            upd("top_k", top_ks)
            upd("top_p", top_ps)
            upd("out_global", jnp.zeros((b_wave, max_global), jnp.int32))
            upd("out_semantic", jnp.zeros((b_wave, max_semantic), jnp.int32))
            return pool, st, stash

        def _step_body(lm_params, pool, state, nb, greedy=False):
            phase = state["phase"]
            active = phase != PHASE_DONE

            logits, pool = paged_decode_ids(
                cfg, lm_params, pool, state["block_tables"], state["index"],
                active, state["last_ids"], bs, num_active_blocks=nb,
                use_kernel=self.use_flash_kernel,
                owner_chunk_blocks=self.owner_chunk_blocks,
            )  # (S, V) fp32

            mask = jnp.where(
                (phase == PHASE_GLOBAL)[:, None], gmask[None], smask[None]
            )
            if greedy:
                # host-selected fast path: no active slot samples, so the
                # per-step sampler VPU work (Gumbel draws over the FULL
                # vocab per row inside jax.random.categorical, the
                # max_top_k lax.top_k, softmax/cumsum) is dead weight —
                # measured ~0.45 ms of the 1.37 ms full step at 32 slots.
                # rng streams stay untouched: greedy rows never consume
                # theirs, and a sampled request admitted later gets a
                # fresh key at admission (run() flips the variant at the
                # next wave), so its token stream is unchanged.
                tokens = jnp.argmax(logits + mask, axis=-1).astype(jnp.int32)
                next_rngs = state["rng"]
            else:
                rngs = jax.vmap(jax.random.split, in_axes=(0, None))(
                    state["rng"], 2
                )  # (S, 2, 2)
                step_keys, next_rngs = rngs[:, 0], rngs[:, 1]
                tokens = sample_logits_vec(
                    step_keys, logits + mask,
                    state["temperature"], state["top_k"], state["top_p"],
                    state["do_sample"], max_top_k=self.max_top_k,
                )

            steps = state["steps_in_phase"]
            in_global = phase == PHASE_GLOBAL
            in_semantic = phase == PHASE_SEMANTIC
            rows = jnp.arange(self.num_slots)

            # write outputs. Phase-1 emits global_len+1 tokens; the final one
            # is discarded-but-cached (llm_sft.py:139-164 quirk), so only
            # steps < global_len are stored.
            write_g = in_global & (steps < state["global_len"]) & active
            g_idx = jnp.minimum(steps, max_global - 1)
            out_global = state["out_global"].at[rows, g_idx].set(
                jnp.where(write_g, tokens - cfg.global_offset,
                          state["out_global"][rows, g_idx])
            )
            write_s = in_semantic & active
            s_idx = jnp.minimum(steps, max_semantic - 1)
            out_semantic = state["out_semantic"].at[rows, s_idx].set(
                jnp.where(write_s, tokens - cfg.semantic_offset,
                          state["out_semantic"][rows, s_idx])
            )

            steps_next = steps + 1
            finish_global = in_global & (steps_next == state["global_len"] + 1)
            finish_semantic = in_semantic & (steps_next == state["semantic_len"])
            new_phase = jnp.where(finish_global, PHASE_SEMANTIC, phase)
            new_phase = jnp.where(finish_semantic, PHASE_DONE, new_phase)
            new_steps = jnp.where(finish_global, 0, steps_next)

            # next input token: semantic SOS right after the global phase
            next_ids = jnp.where(finish_global, cfg.semantic_sos, tokens)
            next_ids = jnp.where(active, next_ids, state["last_ids"])

            new_state = dict(state)
            new_state["phase"] = jnp.where(active, new_phase, phase)
            new_state["steps_in_phase"] = jnp.where(active, new_steps, steps)
            new_state["last_ids"] = next_ids
            new_state["rng"] = next_rngs
            new_state["index"] = jnp.where(active, state["index"] + 1,
                                           state["index"])
            new_state["out_global"] = out_global
            new_state["out_semantic"] = out_semantic
            # pool needs no inactive-slot restore: inactive slots scatter
            # into the reserved trash block (paged.py), never into live data
            return pool, new_state

        @partial(jax.jit, static_argnames=("n", "nb", "greedy"),
                 donate_argnums=(1, 2))
        def _step_n(lm_params, pool, state, n=1, nb=None, greedy=False):
            """n decode steps for the whole pool as ONE dispatched lax.scan —
            per-step host round trips dominate on remote-attached chips.
            ``nb`` (static) bounds the attended pool prefix to the bucketed
            allocation high-water mark (paged.py paged_decode_embeds).
            ``greedy`` (static) compiles the sampler-free variant; the
            caller asserts no active slot has do_sample."""
            def body(carry, _):
                pool, state = carry
                return _step_body(lm_params, pool, state, nb, greedy), None

            (pool, state), _ = jax.lax.scan(body, (pool, state), None,
                                            length=n)
            return pool, state

        self._prefill_insert = _prefill_insert
        self._step_n = _step_n
        # uid -> ((mix_buf, row), (enroll_buf, row) or None): bucket-padded
        # features resident on device, referenced as rows of (possibly
        # wave-wide) staged buffers (see prestage() / _stage_one())
        self._staged: Dict[int, tuple] = {}
        self._zero_rows: Dict[tuple, jax.Array] = {}
        # pipelined harvest (run() fast path): slots whose request finished
        # (host-tracked, deterministic) but whose outputs have not been
        # fetched; stashes captured in-graph by displacing inserts
        self._done_slots: set = set()
        self._pending_stashes: List[tuple] = []
        # observability counters (SURVEY §5.5): serving metrics the
        # reference has no analogue for
        self._stats = {
            "requests_admitted": 0,
            "requests_completed": 0,
            "tokens_generated": 0,
            "decode_steps": 0,
            "step_dispatches": 0,
            "prefill_waves": 0,
            "stash_fetches": 0,
            "coarse_chunks": 0,
        }
        # degraded-link adaptation (see __init__ docstring): rolling window
        # of step-dispatch wall times; when the median inflates past the
        # threshold, run() coarsens its step decomposition
        self.link_adapt = link_adapt
        self.degraded_dispatch_ms = degraded_dispatch_ms
        self.dispatch_overshoot = dispatch_overshoot
        self._dispatch_walls: deque = deque(maxlen=32)

    # --- host-side API ---

    def _phase_host(self) -> np.ndarray:
        """Fetch the phase vector once per step/admit cycle: every device ->
        host read is a full round trip on remote-attached chips, so harvest()
        and free_slots() share one cached fetch."""
        if self._phase_cache is None:
            self._phase_cache = np.asarray(self.state["phase"])
        return self._phase_cache

    def free_slots(self) -> List[int]:
        phase = self._phase_host()
        return [i for i in range(self.num_slots)
                if phase[i] == PHASE_DONE and self._uids[i] is None]

    def validate(self, req: Request) -> None:
        """Static-cap validation: reject requests that can never run, loudly,
        instead of silently clamping scatter indices (reference behavior has
        no server mode; caps here are the engine's static shapes)."""
        if not (1 <= req.global_length <= self.max_global):
            raise ValueError(
                f"global_length {req.global_length} not in [1, {self.max_global}]")
        if not (1 <= req.semantic_length <= self.max_semantic):
            raise ValueError(
                f"semantic_length {req.semantic_length} not in "
                f"[1, {self.max_semantic}]")
        if req.temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {req.temperature}")
        if not (0 < req.top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {req.top_p}")
        if not (1 <= req.top_k <= self.max_top_k):
            raise ValueError(
                f"top_k {req.top_k} not in [1, {self.max_top_k}]")
        n_mix = sum(x is not None for x in
                    (req.mix_wav, req.mix_feats, req.mix_device_frames))
        if n_mix != 1:
            raise ValueError(
                "request needs exactly one of mix_wav / mix_feats / "
                f"mix_device_frames, got {n_mix}")
        if req.enroll_wav is not None and req.enroll_feats is not None:
            raise ValueError("request has both enroll_wav and enroll_feats")
        if req.enroll_device_frames is not None and (
                req.enroll_wav is not None or req.enroll_feats is not None):
            raise ValueError(
                "enroll_device_frames excludes enroll_wav/enroll_feats")
        if (req.enroll_device_frames is not None
                or req.mix_device_frames is not None):
            if self.feats_wire != "bf16":
                raise ValueError(
                    "device-staged inputs require feats_wire='bf16' "
                    "(device rows are engine-dtype feature frames; the int8 "
                    "wire's packed rows would need an on-device quantizer)")
            if req.enroll_device_frames is not None:
                _pick_bucket(req.enroll_device_frames, self.enroll_buckets,
                             "enroll_device")
            if req.mix_device_frames is not None:
                _pick_bucket(req.mix_device_frames, self.mix_buckets,
                             "mix_device")
        if ((req.mix_wav is not None or req.enroll_wav is not None)
                and (self.feature_fn is None or not self.wav_buckets)):
            raise ValueError(
                "waveform request needs an engine built with "
                "feature_fn + wav_buckets")
        if req.is_wav:
            _pick_bucket(req.mix_wav.shape[-1], self.wav_buckets, "mix_wav")
        elif req.mix_feats is not None:
            _pick_bucket(req.mix_feats.shape[0], self.mix_buckets, "mix")
        if req.enroll_wav is not None:
            _pick_bucket(req.enroll_wav.shape[-1],
                         self.enroll_wav_buckets, "enroll_wav")
        elif req.enroll_feats is not None:
            _pick_bucket(req.enroll_feats.shape[0], self.enroll_buckets,
                         "enroll")

    def _frames_for(self, n_samples: int) -> int:
        """Feature frames produced by ``feature_fn`` for an ``n_samples``
        waveform — abstract evaluation, no device work, cached per length."""
        f = self._frames_cache.get(n_samples)
        if f is None:
            import jax as _jax

            out = _jax.eval_shape(
                self.feature_fn, self.feature_params,
                _jax.ShapeDtypeStruct((1, n_samples), jnp.float32))
            f = self._frames_cache.setdefault(n_samples, out.shape[1])
        return f

    def _mix_frames(self, req: Request) -> int:
        """True mix length in feature frames (any input form)."""
        if req.is_wav:
            return self._frames_for(req.mix_wav.shape[-1])
        if req.mix_device_frames is not None:
            return req.mix_device_frames
        return req.mix_feats.shape[0]

    def _enroll_frames(self, req: Request) -> Optional[int]:
        if req.enroll_wav is not None:
            return self._frames_for(req.enroll_wav.shape[-1])
        if req.enroll_feats is not None:
            return req.enroll_feats.shape[0]
        if req.enroll_device_frames is not None:
            return req.enroll_device_frames
        return None

    def _signature(self, req: Request):
        """Admission-wave grouping key ``(mk, mix_b, ek, enr_b)``: mix and
        enroll each carry their own kind — "w" (SAMPLE bucket, frontend
        runs in the prefill program) or "f" (frame bucket, precomputed
        features); "-" marks no enroll. Hybrid requests (mix as waveform +
        enroll as features) are first-class: a frontend with global
        attention (WavLM) computes DIFFERENT features for bucket-padded
        audio, so exact-length enroll features stay exact while the
        fixed-segment mix rides the cheap sample wire."""
        if req.is_wav:
            mk = "w"
            mix_b = _pick_bucket(req.mix_wav.shape[-1], self.wav_buckets,
                                 "mix_wav")
        elif req.mix_device_frames is not None:
            mk = "f"
            mix_b = _pick_bucket(req.mix_device_frames, self.mix_buckets,
                                 "mix_device")
        else:
            mk = "f"
            mix_b = _pick_bucket(req.mix_feats.shape[0], self.mix_buckets,
                                 "mix")
        if req.enroll_wav is not None:
            ek = "w"
            enr_b = _pick_bucket(req.enroll_wav.shape[-1],
                                 self.enroll_wav_buckets, "enroll_wav")
        elif req.enroll_feats is not None:
            ek = "f"
            enr_b = _pick_bucket(req.enroll_feats.shape[0],
                                 self.enroll_buckets, "enroll")
        elif req.enroll_device_frames is not None:
            # device-staged enrollment rows are engine-dtype feature frames
            # (stage_request contract): they ride the feats gather path
            ek = "f"
            enr_b = _pick_bucket(req.enroll_device_frames,
                                 self.enroll_buckets, "enroll_device")
        elif self.unify_waves:
            # enroll-less requests join the widest enroll group: their zero
            # enroll rows are compacted out in-graph (n_head=1), so the only
            # cost is padded prefill length — far cheaper than a second
            # full-width prefill program per wave. They join the enroll KIND
            # that matches their mix (waveform-mix traffic's enrolled peers
            # ride the sample wire too — serve CLI fast path), falling back
            # to the feats group.
            if mk == "w" and self.enroll_wav_buckets:
                ek, enr_b = "w", self.enroll_wav_buckets[-1]
            else:
                ek, enr_b = "f", self.enroll_buckets[-1]
        else:
            ek, enr_b = "-", None
        return mk, mix_b, ek, enr_b

    def _wire_dtype(self) -> np.dtype:
        return np.dtype({"int16": np.int16, "float16": np.float16,
                         "float32": np.float32}[self.wav_wire])

    def _to_wire(self, wav: np.ndarray) -> np.ndarray:
        """Host-side cast to the link format. int16 is exact for 16-bit PCM
        sources and halves the bytes of fp32."""
        if self.wav_wire == "int16":
            # rint, not truncation: exact-PCM sources (n/32768 samples) are
            # unchanged either way, but peak-normalized audio would pick up
            # a full LSB of truncation error where rounding keeps <=0.5
            return np.clip(np.rint(np.asarray(wav, np.float32) * 32768.0),
                           -32768, 32767).astype(np.int16)
        return np.asarray(wav, self._wire_dtype())

    def _row_spec(self, kind: str, bucket: int):
        """(buffer row shape, numpy dtype) for one staged input of ``kind``
        ("w" sample rows on the wire dtype / "f" feature rows: bf16, or
        int8 with a trailing per-frame exponent column on the int8 wire)."""
        if kind == "w":
            return (bucket,), self._wire_dtype()
        if self.feats_wire == "int8":
            return (bucket, self.sft.feats_dim + 1), np.dtype(np.int8)
        return (bucket, self.sft.feats_dim), np.dtype(self.kv_dtype)

    def _fill_row(self, buf, row: int, kind: str, data) -> None:
        if kind == "w":
            buf[row, : data.shape[-1]] = self._to_wire(data)
        elif self.feats_wire == "int8":
            buf[row, : data.shape[0]] = _quantize_feats_row(data)
        else:
            buf[row, : data.shape[0]] = data

    def _stage_one(self, req: Request):
        """Bucket-pad one request's inputs and start their host->device
        transfer (async under jax dispatch). Staged entries are (buffer,
        row) references — single-row buffers here, wave-wide buffers from
        :meth:`prestage`."""
        if (req.enroll_device_frames is not None
                or req.mix_device_frames is not None):
            raise ValueError(
                f"request {req.uid} declares device-staged inputs but "
                "was never staged — call stage_request(req, ...) "
                "with the on-device (buffer, row) refs before admission")
        mk, mix_b, ek, enr_b = self._signature(req)
        shape, dt = self._row_spec(mk, mix_b)
        mix = np.zeros((1,) + shape, dt)  # rows cast on assignment
        self._fill_row(mix, 0, mk, req.mix_wav if mk == "w"
                       else req.mix_feats)
        mix_ref = (jnp.asarray(mix), 0)
        enr_ref = None
        enr_data = (req.enroll_wav if req.enroll_wav is not None
                    else req.enroll_feats)
        if enr_data is not None:
            ekind = "w" if req.enroll_wav is not None else "f"
            shape, dt = self._row_spec(ekind, enr_b)
            enr = np.zeros((1,) + shape, dt)
            self._fill_row(enr, 0, ekind, enr_data)
            enr_ref = (jnp.asarray(enr), 0)
        return mix_ref, enr_ref

    def prestage(self, reqs: List[Request]) -> None:
        """Overlap admissions with decode: start the feature transfers for
        the next wave NOW, while previously dispatched decode chunks are
        still executing on device. Requests are packed into ONE host buffer
        (and one transfer) per (mix, enroll) signature — per-request
        transfers cost ~3 ms of dispatch overhead each on remote-attached
        chips. ``admit_many`` picks rows out of the staged wave buffers with
        a device-side gather — by then the bytes are already across the
        tunnel."""
        todo = [r for r in reqs[: self.num_slots]
                if r.uid not in self._staged]
        if not todo:
            return
        for r in todo:
            if (r.enroll_device_frames is not None
                    or r.mix_device_frames is not None):
                raise ValueError(
                    f"request {r.uid} declares device-staged inputs but "
                    "was never staged — call stage_request(req, ...) "
                    "before handing it to the engine")
        groups: Dict[tuple, List[Request]] = {}
        for r in todo:
            groups.setdefault(self._signature(r), []).append(r)
        for (mk, mix_b, ek, enr_b), group in groups.items():
            # buffer row counts bucket to powers of two: the downstream
            # gather program is keyed on the buffer shape, and a distinct
            # shape per wave composition means a remote recompile per wave.
            # int16/bf16 host buffers: rows cast on assignment, saving a
            # full-buffer conversion pass per wave
            shape, dt = self._row_spec(mk, mix_b)
            mix = np.zeros((_next_pow2(len(group)),) + shape, dt)
            with_enr = [r for r in group
                        if r.enroll_wav is not None
                        or r.enroll_feats is not None]
            enr = None
            if with_enr:
                ekind = "w" if with_enr[0].enroll_wav is not None else "f"
                shape, dt = self._row_spec(ekind, enr_b)
                enr = np.zeros((_next_pow2(len(with_enr)),) + shape, dt)
            enr_row: Dict[int, int] = {}
            j = 0
            for i, r in enumerate(group):
                self._fill_row(mix, i, mk,
                               r.mix_wav if mk == "w" else r.mix_feats)
                data = (r.enroll_wav if r.enroll_wav is not None
                        else r.enroll_feats)
                if data is not None:
                    self._fill_row(
                        enr, j, "w" if r.enroll_wav is not None else "f",
                        data)
                    enr_row[r.uid] = j
                    j += 1
            mix_dev = jnp.asarray(mix)
            enr_dev = jnp.asarray(enr) if enr is not None else None
            for i, r in enumerate(group):
                self._staged[r.uid] = (
                    (mix_dev, i),
                    (enr_dev, enr_row[r.uid]) if r.uid in enr_row else None)

    def stage_request(self, req: Request, mix_ref=None, enroll_ref=None
                      ) -> None:
        """Stage a request from caller-provided device buffers.

        ``mix_ref`` / ``enroll_ref`` are ``(buffer, row)`` pairs pointing
        into device arrays whose rows follow the staged-row contract:
        feature rows are ``(bucket, feats_dim)`` in the engine compute dtype
        (``kv_dtype``), zero-padded past the true frame count, with
        ``bucket`` one of the engine's admission buckets. This is how
        device-RESIDENT inputs (e.g. the SS cascade's SE output featurized
        in place, serve/cascade.py) enter the pool without their feature
        rows ever crossing the host link. A ``None`` mix_ref falls back to
        the regular single-row host staging path."""
        self.validate(req)
        if mix_ref is None and req.mix_device_frames is not None:
            raise ValueError(
                "mix_device_frames set but no mix_ref supplied")
        if enroll_ref is None and req.enroll_device_frames is not None:
            raise ValueError(
                "enroll_device_frames set but no enroll_ref supplied")
        if mix_ref is None:
            mix_ref = self._stage_one(
                req if req.enroll_device_frames is None else
                replace(req, enroll_device_frames=None))[0]
        self._staged[req.uid] = (mix_ref, enroll_ref)

    def _gather_rows(self, refs, b_pad: int, row_shape: tuple, dtype=None,
                     dequant: bool = False):
        """(buffer, row) refs (None entries -> zero rows) -> one (b_pad,
        *row_shape) device array. Single-buffer fast path is ONE jitted
        gather+scatter into a cached zero template, with index vectors
        padded to b_pad (pad positions unique and out of range -> dropped)
        so the program shape never depends on how many rows are live —
        variable shapes meant a remote recompile per wave (measured
        seconds/wave). Mixed buffers fall back to a per-row stack.

        ``dequant``: the buffers hold int8 feature-wire rows (row_shape is
        the WIRE shape, (bucket, D+1)); the returned array is the decoded
        (b_pad, bucket, D) kv_dtype features — the dequant runs INSIDE the
        one gather+scatter program (an extra dispatch costs ~25 ms of
        serialized link time per wave, measured)."""
        dtype = self.kv_dtype if dtype is None else dtype
        if dequant:
            out_shape, dtype = (row_shape[0], row_shape[1] - 1), self.kv_dtype
        else:
            out_shape = row_shape
        key = ("wave", b_pad, np.dtype(dtype).name) + out_shape
        zero = self._zero_rows.get(key)
        if zero is None:
            zero = jnp.zeros((b_pad,) + out_shape, dtype)
            self._zero_rows[key] = zero
        live = [(pos, ref) for pos, ref in enumerate(refs) if ref is not None]
        if not live:
            return zero
        bufs = {id(ref[0]) for _, ref in live}
        if len(bufs) == 1:
            buf = live[0][1][0]
            k = len(live)
            pos = np.arange(b_pad, 2 * b_pad - k, dtype=np.int32)
            pos = np.concatenate(
                [np.asarray([p for p, _ in live], np.int32), pos])
            rows = np.zeros((b_pad,), np.int32)
            rows[:k] = [ref[1] for _, ref in live]
            scatter = _scatter_rows_dequant if dequant else _scatter_rows
            return scatter(zero, buf, jnp.asarray(pos), jnp.asarray(rows))
        rows = [ref[0][ref[1]] if ref is not None else None for ref in refs]
        if dequant:
            wire_zero = jnp.zeros(row_shape, np.int8)
            rows = [wire_zero if r is None else r for r in rows]
            stacked = jnp.stack(
                rows[:b_pad] + [wire_zero] * (b_pad - len(rows)))
            return _dequant_feats(stacked, jnp.dtype(self.kv_dtype))
        rows = [zero[0] if r is None else r for r in rows]
        return jnp.stack(rows[:b_pad] + [zero[0]] * (b_pad - len(rows)))

    def _reap_host(self) -> None:
        """Deterministic completion bookkeeping (no device sync): decode
        lengths are fixed, so a slot whose host-tracked remaining count hit
        zero IS finished — release its blocks now (the finished outputs live
        in the state arrays, not the pool; the inactive slot scatters to the
        trash block) and mark it displaceable."""
        for s in range(self.num_slots):
            if (self._uids[s] is not None and self._remaining[s] == 0
                    and s not in self._done_slots):
                self._done_slots.add(s)
                self.allocator.release(self._slot_blocks[s])
                self._slot_blocks[s] = []

    def admit_many(self, reqs: List[Request], rng,
                   displace: bool = False) -> List[int]:
        """Admit as many requests as slots + pool blocks allow; returns the
        uids admitted. Requests violating static caps raise ValueError.

        With ``displace=True`` (the run() fast path), slots whose request
        finished — tracked host-side, no device sync — are reused directly;
        the insert program stashes their outputs in-graph for a later
        overlapped fetch (see _prefill_insert).

        ``rng`` may be a jax PRNG key or a ``np.random.Generator``. Per-slot
        decode keys are derived HOST-side: deriving them with
        ``jax.random.split`` + ``key_data`` costs a ~28 ms device round trip
        PER REQUEST on tunnel-attached chips (measured), which dominated
        wave admission."""
        for r in reqs:
            self.validate(r)
        if not isinstance(rng, np.random.Generator):
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(rng), np.uint32))
        if displace:
            self._reap_host()
            slots = [i for i in range(self.num_slots)
                     if self._uids[i] is None or i in self._done_slots]
        else:
            slots = self.free_slots()
        if not slots or not reqs:
            return []
        take = reqs[: len(slots)]

        groups: Dict[tuple, List[Request]] = {}
        for r in take:
            groups.setdefault(self._signature(r), []).append(r)

        admitted: List[int] = []
        for (mk, mix_b, ek, enr_b), group in groups.items():
            # prompt geometry is in FEATURE FRAMES; waveform inputs map
            # their sample buckets through the frontend's frame function
            mix_fb = self._frames_for(mix_b) if mk == "w" else mix_b
            enr_fb = (self._frames_for(enr_b) if ek == "w"
                      else enr_b if ek == "f" else None)
            # drop group members that don't fit the remaining block budget
            fitting: List[tuple] = []  # (req, n_blocks)
            budget = len(self.allocator.free)
            la = 2 + mix_fb + (1 + enr_fb if enr_fb is not None else 0)
            for r in group:
                enr_frames = self._enroll_frames(r)
                true_total = (2 + self._mix_frames(r)
                              + (1 + enr_frames
                                 if enr_frames is not None else 0))
                need_tokens = max(
                    la, true_total + r.global_length + 1 + r.semantic_length)
                n_blk = math.ceil(need_tokens / self.block_size)
                # region allocators consume a whole region per request —
                # budget math must charge actual consumption
                cost = self.allocator.block_cost(n_blk)
                if cost <= budget:
                    fitting.append((r, n_blk, true_total))
                    budget -= cost
            if not fitting:
                continue

            # fixed wave size: ONE prefill program per (mix, enroll) bucket
            # signature for the engine's lifetime. Padded rows cost negligible
            # prefill compute but mid-run recompiles cost 6-8 s each on
            # remote-compiled backends (CLAUDE.md #3).
            b_pad = self.num_slots
            tables = np.full((b_pad, self.max_blocks), TRASH_BLOCK, np.int32)
            # metadata packed into THREE host->device transfers (int / rng /
            # float) instead of eleven: each transfer costs ~ms of dispatch
            # overhead on remote-attached chips. Columns: slot, task,
            # n_head, true_total, glen, slen, top_k, do_sample
            meta_i = np.zeros((b_pad, 8), np.int32)
            meta_i[:, 0] = self.num_slots  # dropped rows
            meta_i[:, 4:6] = 1
            meta_i[:, 6] = 1
            rngs = np.zeros((b_pad, 2), np.uint32)
            meta_f = np.ones((b_pad, 2), np.float32)
            mix_refs: List = []
            enr_refs: List = []

            if displace:
                free = [i for i in range(self.num_slots)
                        if self._uids[i] is None or i in self._done_slots]
            else:
                free = self.free_slots()
            replaced: List[Optional[int]] = [None] * b_pad
            for i, (r, n_blk, true_total) in enumerate(fitting):
                slot = free[0]
                free = free[1:]
                if slot in self._done_slots:
                    replaced[i] = self._uids[slot]
                    self._done_slots.discard(slot)
                blocks = self.allocator.alloc(n_blk)
                self._slot_blocks[slot] = blocks
                self._uids[slot] = r.uid
                self._remaining[slot] = r.global_length + 1 + r.semantic_length
                self._slot_sampled[slot] = bool(r.do_sample)
                tables[i, : n_blk] = blocks
                staged = self._staged.pop(r.uid, None)
                mix_ref, enr_ref = staged if staged else self._stage_one(r)
                mix_refs.append(mix_ref)
                enr_refs.append(enr_ref)
                # head (compacted out for enroll-less rows): task alone, or
                # task + enroll_sos + enroll
                enr_frames = self._enroll_frames(r)
                meta_i[i] = (slot, r.task_id,
                             1 if enr_frames is None else 2 + enr_frames,
                             true_total, r.global_length, r.semantic_length,
                             r.top_k, int(r.do_sample))
                rngs[i] = rng.integers(0, 2**32, size=2, dtype=np.uint32)
                meta_f[i] = (r.temperature, r.top_p)
                admitted.append(r.uid)

            # rows were bucket-padded, cast to the wire dtype (bf16/int8
            # feature frames, or int16 samples for wav groups) and
            # transferred when they were STAGED — possibly while earlier
            # decode chunks were still running; this gather is a device-side
            # op. On the int8 feature wire the dequant is FUSED into the one
            # gather+scatter program (dequant=True) — a separate dequant
            # dispatch cost ~25 ms/wave of serialized link time and made the
            # wire a net loss at 16 slots (measured).
            quant = self.feats_wire == "int8"

            def _wave_feats(kind, refs, bucket):
                shape, dt = self._row_spec(kind, bucket if bucket else 1)
                return self._gather_rows(
                    refs, b_pad, shape, dtype=jnp.dtype(dt.name),
                    dequant=quant and kind == "f")

            mix_in = _wave_feats(mk, mix_refs, mix_b)
            enroll_in = _wave_feats(ek if ek != "-" else "f", enr_refs,
                                    enr_b)
            mix_is_wav, enroll_is_wav = mk == "w", ek == "w"
            if not self.fuse_frontend:
                # split mode (default): frontend runs as its OWN jitted
                # program per staged wave buffer — features stay on device
                # and the (already compiled) feats prefill program consumes
                # them. One extra dispatch per wave; no monolithic HLO.
                if mix_is_wav:
                    mix_in = self._frontend_program(self._feat_packed,
                                                    mix_in)
                    mix_is_wav = False
                if enroll_is_wav:
                    if all(ref is None for ref in enr_refs):
                        # enroll-less wave (pure-SE traffic): every enroll
                        # row is compacted out in-graph (n_head=1), value-
                        # independently — skip a full SSL pass over the
                        # all-zero sample buffer and hand the prefill the
                        # cached zero FEATURE template instead
                        shape, dt = self._row_spec(
                            "f", self._frames_for(enr_b))
                        enroll_in = self._gather_rows(
                            [None] * b_pad, b_pad, shape,
                            dtype=jnp.dtype(dt.name), dequant=quant)
                    else:
                        enroll_in = self._frontend_program(
                            self._feat_packed, enroll_in)
                    enroll_is_wav = False
            self.pool, self.state, stash = self._prefill_insert(
                self.params, self.pool, self.state,
                with_enroll=enr_b is not None,
                mix_is_wav=mix_is_wav,
                enroll_is_wav=enroll_is_wav,
                tables=jnp.asarray(tables),
                mix_feats=mix_in,
                enroll_feats=enroll_in,
                meta_i=jnp.asarray(meta_i),
                rngs=jnp.asarray(rngs),
                meta_f=jnp.asarray(meta_f),
                feat_params=(self._feat_packed
                             if mix_is_wav or enroll_is_wav else None),
            )
            if any(u is not None for u in replaced):
                self._pending_stashes.append((replaced, stash))
            self._phase_cache = None
            self._stats["prefill_waves"] += 1
        self._stats["requests_admitted"] += len(admitted)
        return admitted

    def stats(self) -> Dict[str, float]:
        """Serving counters (host-side, no device sync): admissions,
        completions, tokens, dispatch counts, and current pool occupancy."""
        held = sum(len(b) for b in self._slot_blocks)
        out = dict(self._stats)
        out["active_slots"] = sum(
            1 for s in range(self.num_slots)
            if self._uids[s] is not None and self._remaining[s] > 0)
        out["blocks_held"] = held
        out["pool_utilization"] = held / max(1, self.num_blocks - 1)
        if self._dispatch_walls:
            out["dispatch_ms_median"] = float(
                np.median(self._dispatch_walls)) * 1e3
        out["link_degraded"] = self._link_degraded()
        return out

    def cancel(self, uid: int) -> bool:
        """Cancel an in-flight request: release its blocks and mark the slot
        inactive (the slot scatters to the trash block until reused). Returns
        False if the uid is not currently in a slot. No device sync; the
        in-graph phase flips lazily at the next admission over that slot —
        until then the slot decodes into discarded state."""
        # drop any prestaged device arrays for a not-yet-admitted uid so a
        # long-lived engine doesn't accumulate bucket-padded buffers
        self._staged.pop(uid, None)
        for s in range(self.num_slots):
            if self._uids[s] == uid:
                self.allocator.release(self._slot_blocks[s])
                self._slot_blocks[s] = []
                self._uids[s] = None
                self._remaining[s] = 0
                self._done_slots.discard(s)
                # deactivate in-graph so the slot stops writing KV/outputs
                self.state = dict(self.state)
                self.state["phase"] = self.state["phase"].at[s].set(
                    PHASE_DONE)
                self._phase_cache = None
                self._stats["requests_cancelled"] = (
                    self._stats.get("requests_cancelled", 0) + 1)
                return True
        return False

    def drain_stashes(self) -> List[Result]:
        """Fetch the outputs stashed by displacing inserts. Call AFTER
        dispatching the next decode chunks so the fetch round trip overlaps
        with decode executing on device."""
        if not self._pending_stashes:
            return []
        out: List[Result] = []
        # ONE batched fetch for every pending stash: device_get on the whole
        # list dispatches all leaf fetches together (a per-stash fetch costs
        # a full round trip each on tunnel-attached chips)
        fetched = jax.device_get([s for _, s in self._pending_stashes])
        self._stats["stash_fetches"] += 1
        for (replaced, _), data in zip(self._pending_stashes, fetched):
            for j, uid in enumerate(replaced):
                if uid is None:
                    continue
                glen, slen = int(data["glen"][j]), int(data["slen"][j])
                out.append(Result(uid, data["g"][j, :glen],
                                  data["s"][j, :slen]))
        self._pending_stashes = []
        self._stats["requests_completed"] += len(out)
        self._stats["tokens_generated"] += sum(
            len(r.global_ids) + 1 + len(r.semantic_ids) for r in out)
        return out

    def admit(self, req: Request, rng) -> bool:
        return bool(self.admit_many([req], rng))

    def _link_degraded(self) -> bool:
        """True when the rolling median step-dispatch wall says the link has
        stopped pipelining (docs/PERFORMANCE.md "third failure mode")."""
        w = self._dispatch_walls
        if not self.link_adapt or len(w) < 8:
            return False
        return float(np.median(w)) * 1e3 > self.degraded_dispatch_ms

    def _segment_chunks(self, remaining: int, max_rem: int,
                        poll_interval: int, coarse: bool) -> List[int]:
        """See :func:`segment_chunks` — coarse mode (detected link
        degradation) additionally spends the other slots' live work as
        budget, driving toward ONE dispatch per segment."""
        return segment_chunks(remaining, max_rem, poll_interval,
                              self.dispatch_overshoot, coarse)

    def _block_bound(self) -> int:
        """Static decode-read prefix bound (allocator-bucketed; see
        BlockAllocator.bounded_high_water). Owner-kernel mode attends each
        slot over its own region only — the bound is irrelevant to the
        step, so a CONSTANT keeps the (n, nb) program cache at one entry
        per n (no bucket-crossing recompiles)."""
        if self.use_flash_kernel == "owner":
            return self.num_blocks
        return self.allocator.bounded_high_water()

    def step(self, n: int = 1, nb: Optional[int] = None):
        """Decode ``n`` tokens for every active slot. ``nb`` overrides the
        pool-read bound (default: the allocator's current bucketed high
        water) — benchmarks re-timing a finished run's compiled programs
        must pass the run's bound (stats()["last_nb"]): after the final
        release the high water DROPS, and a fresh (n, nb) pairing is a new
        program (a multi-second remote compile on this deployment)."""
        lm_params = self.params["params"]["lm"]
        nb = self._block_bound() if nb is None else nb
        self._stats["last_nb"] = nb
        # sampler-free fast path when no LIVE slot samples (host-known):
        # drops the per-step lax.top_k over the vocab + full-V Gumbel draw
        # + rng splits. Greedy rows never consume their rng stream and a
        # sampled request admitted later gets a fresh key at admission, so
        # token streams are identical either way (tests pin this).
        greedy = not any(
            self._slot_sampled[i] for i in range(self.num_slots)
            if self._uids[i] is not None and self._remaining[i] > 0)
        self._stats["last_greedy_variant"] = greedy
        t0 = time.perf_counter()
        self.pool, self.state = self._step_n(lm_params, self.pool,
                                             self.state, n=n, nb=nb,
                                             greedy=greedy)
        wall = time.perf_counter() - t0
        # dispatch-health window: a healthy link enqueues asynchronously
        # (~1 ms); a degraded relay blocks ~RTT per dispatch. Walls > 2 s
        # are compiles, not link signal.
        if wall < 2.0:
            self._dispatch_walls.append(wall)
        self._phase_cache = None
        self._stats["decode_steps"] += n
        self._stats["step_dispatches"] += 1
        for i in range(self.num_slots):
            if self._uids[i] is not None:
                self._remaining[i] = max(0, self._remaining[i] - n)

    def harvest(self) -> List[Result]:
        # completion is host-known (fixed decode lengths, no EOS): a slot
        # with remaining == 0 IS done, so no device phase fetch is needed.
        # The earlier formulation fetched phase (~25 ms RTT) and dispatched
        # four eager gathers before the fetch — ~0.34 s of the 16-slot run
        # wall (probe_engine_levers budget); this is ONE wholesale fetch
        # (the four state arrays total ~20 KB at serving size) sliced on
        # the host.
        done = [i for i in range(self.num_slots)
                if self._uids[i] is not None and self._remaining[i] == 0]
        if not done:
            return []
        data = jax.device_get({
            "g": self.state["out_global"],
            "s": self.state["out_semantic"],
            "glen": self.state["global_len"],
            "slen": self.state["semantic_len"],
        })
        out = []
        for i in done:
            glen, slen = int(data["glen"][i]), int(data["slen"][i])
            out.append(Result(self._uids[i], data["g"][i, :glen],
                              data["s"][i, :slen]))
            self._uids[i] = None
            self.allocator.release(self._slot_blocks[i])
            self._slot_blocks[i] = []
            self._done_slots.discard(i)
        self._stats["requests_completed"] += len(out)
        self._stats["tokens_generated"] += sum(
            len(r.global_ids) + 1 + len(r.semantic_ids) for r in out)
        return out

    def run(self, requests: List[Request], rng,
            poll_interval: int = 256) -> Dict[int, Result]:
        """Drive the pool until all requests complete.

        Deterministic scheduling: decode lengths are fixed (no EOS
        early-exit), so the engine steps EXACTLY to the next completion
        point, decomposed into power-of-two dispatches capped at
        ``poll_interval`` (283 remaining -> 256+16+8+2+1). No overshoot
        steps, at most log2(poll_interval)+1 distinct compiled step
        programs, and the device->host sync happens only at completion
        points — every sync on a remote-attached chip is a ~25 ms round
        trip.

        ``poll_interval`` is floored to the nearest power of two (256 -> 256,
        100 -> 64) so every dispatch size is a reused compiled program; the
        effective value is reported once via stats()["poll_interval"]."""
        pending = list(requests)
        results: Dict[int, Result] = {}
        # ONE key-data fetch for the whole run; all per-request keys derive
        # host-side (a per-wave jax.random.split costs a device round trip)
        if not isinstance(rng, np.random.Generator):
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(rng), np.uint32))
        # power-of-two cap keeps the set of compiled step programs bounded
        poll_interval = 1 << (max(int(poll_interval), 1).bit_length() - 1)
        self._stats["poll_interval"] = poll_interval
        i = 0
        try:
            return self._run_inner(pending, results, rng, poll_interval, i)
        finally:
            # staged arrays for requests that were never admitted (error
            # paths, pool-too-small aborts) must not outlive the run
            self._staged = {
                u: v for u, v in self._staged.items()
                if any(self._uids[s] == u for s in range(self.num_slots))}

    def _run_inner(self, pending, results, rng, poll_interval, i):
        # host-phase wall-clock accumulators (stats()["t_*"]): on
        # tunnel-attached chips the host path IS the utilization gap, so
        # run() keeps an always-on budget of where wall time goes.
        # t_drain/t_harvest include the decode wait (the fetch blocks on
        # the dispatched chunks); t_admit/t_step are dispatch-side.
        t = self._stats
        for k in ("t_prestage", "t_admit", "t_step", "t_drain", "t_harvest"):
            t[k] = t.get(k, 0.0)
        clock = time.perf_counter
        # first wave: batch-stage before admitting (later waves prestage
        # during decode)
        if pending:
            t0 = clock()
            self.prestage(pending)
            t["t_prestage"] += clock() - t0
        while True:
            if pending:
                # displacing admissions: finished slots are known host-side
                # (deterministic lengths) — no device sync between waves.
                # The insert stashes the displaced outputs in-graph.
                t0 = clock()
                admitted = set(self.admit_many(pending, rng, displace=True))
                pending = [r for r in pending if r.uid not in admitted]
                t["t_admit"] += clock() - t0
            active = [self._remaining[s] for s in range(self.num_slots)
                      if self._uids[s] is not None and self._remaining[s] > 0]
            if not active:
                if pending:
                    raise RuntimeError(
                        "requests cannot be admitted (KV pool too small for "
                        "any pending request)")
                break
            remaining = min(active)
            max_rem = max(active)
            coarse = self._link_degraded()
            chunks = self._segment_chunks(remaining, max_rem, poll_interval,
                                          coarse)
            if coarse:
                t["coarse_chunks"] = t.get("coarse_chunks", 0) + len(chunks)
            staged = not pending
            first = True
            for c in chunks:
                t0 = clock()
                self.step(n=c)
                t["t_step"] += clock() - t0
                if not staged:
                    # overlap: transfer the next wave's features while the
                    # first decode chunk executes on device
                    t0 = clock()
                    self.prestage(pending)
                    t["t_prestage"] += clock() - t0
                    staged = True
                if first:
                    if self.eager_drain:
                        # overlap: fetch the previous wave's stashed outputs
                        # while these decode chunks execute on device
                        t0 = clock()
                        for r in self.drain_stashes():
                            results[r.uid] = r
                        t["t_drain"] += clock() - t0
                    first = False
            i += min(active)
            if i > 400000:
                raise RuntimeError("engine did not converge")
        t0 = clock()
        for r in self.drain_stashes():
            results[r.uid] = r
        t["t_drain"] += clock() - t0
        t0 = clock()
        for r in self.harvest():
            results[r.uid] = r
        t["t_harvest"] += clock() - t0
        return results
