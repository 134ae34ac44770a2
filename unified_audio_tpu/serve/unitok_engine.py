"""Continuous-batched UniTok serving over the SAME paged KV block pool.

The UniTok delay-pattern LM (models/unitok/model.py) decodes K codebook
streams per step through a Llama backbone of the same geometry as the UniSE
LM, so its KV blocks are pool-compatible: this engine reuses
serve/paged.py's block pool / allocator / paged decode machinery, and a pool
+ allocator pair can be SHARED between a ContinuousBatchingEngine (UniSE)
and a UniTokEngine — "multitask heads share one batched token pipeline"
(SURVEY §2.3) extended to serving time: mixed UniSE + UniTok traffic draws
blocks from one pool (tests/test_unitok_engine.py pins both engines'
outputs against their solo generates while interleaved on a shared pool).

Differences from the UniSE engine's phase machine, absorbed here:
* every step emits K tokens (one per codebook) — input embedding is the SUM
  of K code embeddings and the output is K parallel heads, evaluated as one
  stacked (K, D, V) einsum;
* the two-phase global/semantic masking is replaced by the MusicGen-style
  delay window: codebook k may emit real codes only for step in
  [k, k + num_frames), PAD outside (model.py:156-229);
* decode length is num_frames + K - 1 (fixed, deterministic scheduling).

The scheduler is the UniSE engine's fully-overlapped displacing design
(round 4): finished slots are known host-side (deterministic lengths, no
device sync), the insert program stashes the displaced slots' outputs
in-graph, and stashes drain in one batched end-of-run fetch (or per wave
with ``eager_drain=True``) — power-of-two step decomposition to each
completion point throughout.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..models.lm.llama import init_cache, sample_logits_vec
from ..models.unitok.model import UniTokLM
from .engine import _pick_bucket, segment_chunks
from .paged import (TRASH_BLOCK, BlockAllocator, RegionAllocator,
                    init_pool,
                    paged_decode_embeds, scatter_prefill)


NEG = -1e9


@dataclass
class UniTokRequest:
    task_id: int
    num_frames: int
    caption_feats: Optional[np.ndarray] = None  # (Tc, text_dim)
    ref_feats: Optional[np.ndarray] = None      # (Tr, audio_dim)
    input_feats: Optional[np.ndarray] = None    # (Ti, audio_dim)
    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.95
    do_sample: bool = True
    uid: int = 0


@dataclass
class UniTokResult:
    uid: int
    codes: np.ndarray  # (num_frames, K)


class UniTokEngine:
    """Slot-pool continuous batching for the delay-pattern LM."""

    @property
    def pool(self):
        return self._pool_ref.pool

    @pool.setter
    def pool(self, value):
        self._pool_ref.pool = value

    def __init__(
        self,
        lm: UniTokLM,
        params,
        num_slots: int = 8,
        block_size: int = 64,
        num_blocks: Optional[int] = None,
        max_frames: int = 256,
        feat_buckets: Sequence[int] = (64, 128, 256),
        max_top_k: int = 256,
        pool_ref=None,
        allocator: Optional[BlockAllocator] = None,
        dtype=None,
        use_flash_kernel=None,
        owner_chunk_blocks: int = 14,
        eager_drain: bool = False,
        kv_quant: Optional[str] = None,
        dispatch_overshoot: float = 0.05,
    ):
        self.lm = lm
        cfg = lm.cfg
        self.cfg = cfg
        self.K = cfg.num_codebooks
        if dtype is not None:
            params = jax.tree_util.tree_map(
                lambda p: p.astype(dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
        self.params = params
        p = params["params"]
        self.kv_dtype = p["code_embed_0"]["embedding"].dtype
        # stacked (K, Vl, D) embeddings and (K, D, Vl) heads: one gather /
        # one einsum per step instead of K
        self._emb = jnp.stack(
            [p[f"code_embed_{k}"]["embedding"] for k in range(self.K)])
        self._heads = jnp.stack(
            [p[f"head_{k}"]["kernel"] for k in range(self.K)])
        self.num_slots = num_slots
        self.block_size = block_size
        self.max_frames = max_frames
        self.feat_buckets = tuple(sorted(feat_buckets))
        self.max_top_k = max_top_k
        self.max_steps = max_frames + self.K - 1
        # kernel-mode policy mirrors ContinuousBatchingEngine: "owner"
        # (default on TPU, RegionAllocator-paired), "stream", or False
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
        owner = self.use_flash_kernel == "owner"

        max_prompt = 5 + 3 * self.feat_buckets[-1]
        max_tokens = max_prompt + self.max_steps + 1
        self.max_blocks = math.ceil(max_tokens / block_size)
        self._region_blocks = (
            -(-self.max_blocks // owner_chunk_blocks) * owner_chunk_blocks)
        self.lcfg = cfg.llama_config  # shared with UniTokLM.setup
        if pool_ref is not None:
            assert allocator is not None, "shared pool needs its allocator"
            self._pool_ref = pool_ref
            self.allocator = allocator
            self.num_blocks = pool_ref.pool["k"].shape[1]
            # engines sharing one pool must agree on its storage format
            self.kv_quant = ("int8" if "k_scale" in pool_ref.pool else None)
            if kv_quant is not None and kv_quant != self.kv_quant:
                raise ValueError(
                    f"kv_quant={kv_quant!r} conflicts with the shared "
                    f"pool's storage ({self.kv_quant!r})")
        else:
            if num_blocks is None:
                # 64-block bucket granularity (see ContinuousBatchingEngine)
                if owner:
                    num_blocks = -(-((num_slots + 2)
                                     * self._region_blocks) // 64) * 64
                else:
                    num_blocks = -(-(1 + num_slots
                                     * self.max_blocks) // 64) * 64
            self.num_blocks = num_blocks
            from .paged import PoolRef

            self.kv_quant = kv_quant
            self._pool_ref = PoolRef(init_pool(
                self.lcfg, num_blocks, block_size, dtype=self.kv_dtype,
                quant=kv_quant))
            if allocator is None:
                allocator = (RegionAllocator(num_blocks, self._region_blocks)
                             if owner else BlockAllocator(num_blocks))
            self.allocator = allocator
        if owner:
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

        s = num_slots
        self.state = {
            "active": jnp.zeros((s,), jnp.bool_),
            "step": jnp.zeros((s,), jnp.int32),
            "num_frames": jnp.zeros((s,), jnp.int32),
            "last_ids": jnp.zeros((s, self.K), jnp.int32),
            "rng": jnp.zeros((s, 2), jnp.uint32),
            "do_sample": jnp.zeros((s,), jnp.bool_),
            "temperature": jnp.ones((s,), jnp.float32),
            "top_k": jnp.ones((s,), jnp.int32),
            "top_p": jnp.ones((s,), jnp.float32),
            "index": jnp.zeros((s,), jnp.int32),
            "block_tables": jnp.full((s, self.max_blocks), TRASH_BLOCK,
                                     jnp.int32),
            "out": jnp.zeros((s, self.max_steps, self.K), jnp.int32),
        }
        self._slot_blocks: List[List[int]] = [[] for _ in range(s)]
        self._uids: List[Optional[int]] = [None] * s
        self._remaining: List[int] = [0] * s
        self._results: Dict[int, UniTokResult] = {}
        self.eager_drain = eager_drain
        self.dispatch_overshoot = dispatch_overshoot
        self._done_slots: set = set()
        self._pending_stashes: List[tuple] = []
        self._stats: Dict[str, float] = {"stash_fetches": 0,
                                         "prefill_waves": 0,
                                         "step_dispatches": 0}

        vocab_ids = jnp.arange(cfg.layer_vocab)
        code_mask = jnp.where(vocab_ids < cfg.codebook_size, 0.0, NEG)
        pad_only = jnp.where(vocab_ids == cfg.pad, 0.0, NEG)
        kv_dtype, bs = self.kv_dtype, block_size

        @partial(jax.jit,
                 static_argnames=("has_cap", "has_ref", "has_inp"),
                 donate_argnums=(1, 2))
        def _prefill_insert(params, pool, state, slot_ids,
                            tables, task_ids, cap, cap_len, ref, ref_len,
                            inp, inp_len, nframes, rngs, do_samples, temps,
                            top_ks, top_ps, has_cap, has_ref, has_inp):
            b_wave = task_ids.shape[0]
            # stash the displaced slots' finished outputs BEFORE the upd()
            # scatters overwrite them — fetched later in one batched
            # device_get, overlapped with decode (the UniSE engine's
            # displacing-insert recipe). Dropped rows (slot id == num_slots)
            # clamp to the last slot; the host ignores their stash entries.
            clip_ids = jnp.clip(slot_ids, 0, self.num_slots - 1)
            stash = (state["out"][clip_ids], state["num_frames"][clip_ids])
            prompt = self.lm.apply(
                params, task_ids[0],
                cap if has_cap else None,
                ref if has_ref else None,
                inp if has_inp else None, b_wave,
                method="build_prompt",
            )  # (B, La, D) — but per-slot task ids vary: fix below
            # per-slot task embedding (build_prompt used row 0's task id)
            task_emb = self.lm.apply(
                params, task_ids.reshape(b_wave, 1),
                method=lambda m, t: m.task_embedding(t))
            prompt = prompt.at[:, :1].set(task_emb)

            # validity over prompt positions: [task][C][cap pad...][R][ref
            # pad...][I][inp pad...][S] — compact valid tokens left (stable)
            segs = [jnp.ones((b_wave, 1), bool)]
            if has_cap:
                segs.append(jnp.ones((b_wave, 1), bool))
                segs.append(jnp.arange(cap.shape[1])[None]
                            < cap_len[:, None])
            if has_ref:
                segs.append(jnp.ones((b_wave, 1), bool))
                segs.append(jnp.arange(ref.shape[1])[None]
                            < ref_len[:, None])
            if has_inp:
                segs.append(jnp.ones((b_wave, 1), bool))
                segs.append(jnp.arange(inp.shape[1])[None]
                            < inp_len[:, None])
            segs.append(jnp.ones((b_wave, 1), bool))
            valid = jnp.concatenate(segs, axis=1)  # (B, La)
            order = jnp.argsort(~valid, axis=1, stable=True)
            prompt = jnp.take_along_axis(prompt, order[..., None], axis=1)
            true_len = jnp.sum(valid.astype(jnp.int32), axis=1)

            la = prompt.shape[1]
            cache = init_cache(self.lcfg, b_wave, la, dtype=kv_dtype)
            _, cache = self.lm.apply(
                params, prompt.astype(kv_dtype), cache,
                method=lambda m, pr, c: m.backbone.prefill(pr, c))
            pool = scatter_prefill(pool, tables, cache["k"], cache["v"], bs)

            st = dict(state)

            def upd(name, vals):
                st[name] = st[name].at[slot_ids].set(vals, mode="drop")

            upd("active", jnp.ones((b_wave,), bool))
            upd("step", jnp.zeros((b_wave,), jnp.int32))
            upd("num_frames", nframes)
            upd("last_ids",
                jnp.full((b_wave, self.K), self.cfg.bos, jnp.int32))
            upd("rng", rngs)
            upd("do_sample", do_samples)
            upd("temperature", temps)
            upd("top_k", top_ks)
            upd("top_p", top_ps)
            upd("index", true_len)
            upd("block_tables", tables)
            upd("out", jnp.zeros((b_wave, self.max_steps, self.K),
                                 jnp.int32))
            return pool, st, stash

        def _step_body(backbone_params, emb, heads, pool, state, nb):
            s = self.num_slots
            active = state["active"]
            ids = state["last_ids"]  # (S, K)
            # summed code embeddings: emb (K, Vl, D)
            x = jnp.sum(
                jax.vmap(lambda e, i: e[i], in_axes=(0, 1))(emb, ids),
                axis=0,
            )[:, None].astype(kv_dtype)  # (S, 1, D) — compute dtype: an
            # int8 pool stores QUANTIZED values, not the compute dtype
            hidden, pool = paged_decode_embeds(
                self.lcfg, backbone_params, pool, state["block_tables"],
                state["index"], active, x, bs, num_active_blocks=nb,
                use_kernel=self.use_flash_kernel,
                owner_chunk_blocks=self.owner_chunk_blocks)
            logits = jnp.einsum(
                "sd,kdv->skv", hidden, heads.astype(hidden.dtype)
            ).astype(jnp.float32)  # (S, K, V)

            step = state["step"]  # (S,)
            karange = jnp.arange(self.K)[None]  # (1, K)
            in_range = ((step[:, None] >= karange)
                        & (step[:, None] < karange
                           + state["num_frames"][:, None]))  # (S, K)
            mask = jnp.where(in_range[..., None], code_mask[None, None],
                             pad_only[None, None])
            logits = logits + mask

            rngs = jax.vmap(jax.random.split, in_axes=(0, None))(
                state["rng"], self.K + 1)  # (S, K+1, 2)
            next_rngs = rngs[:, 0]
            step_keys = rngs[:, 1:].reshape(s * self.K, 2)
            rep = lambda a: jnp.repeat(a, self.K, axis=0)
            tokens = sample_logits_vec(
                step_keys, logits.reshape(s * self.K, -1),
                rep(state["temperature"]), rep(state["top_k"]),
                rep(state["top_p"]), rep(state["do_sample"]),
                max_top_k=self.max_top_k,
            ).reshape(s, self.K)

            rows = jnp.arange(s)
            w_idx = jnp.minimum(step, self.max_steps - 1)
            out = state["out"].at[rows, w_idx].set(
                jnp.where(active[:, None], tokens, state["out"][rows, w_idx]))

            steps_next = step + 1
            finished = active & (steps_next
                                 == state["num_frames"] + self.K - 1)
            new_state = dict(state)
            new_state["active"] = active & ~finished
            new_state["step"] = jnp.where(active, steps_next, step)
            new_state["last_ids"] = jnp.where(active[:, None], tokens, ids)
            new_state["rng"] = next_rngs
            new_state["index"] = jnp.where(active, state["index"] + 1,
                                           state["index"])
            new_state["out"] = out
            return pool, new_state

        @partial(jax.jit, static_argnames=("n", "nb"),
                 donate_argnums=(3, 4))
        def _step_n(backbone_params, emb, heads, pool, state, n=1, nb=None):
            def body(carry, _):
                pool, state = carry
                return _step_body(backbone_params, emb, heads, pool,
                                  state, nb), None

            (pool, state), _ = jax.lax.scan(body, (pool, state), None,
                                            length=n)
            return pool, state

        self._prefill_insert = _prefill_insert
        self._step_n = _step_n

    # -- scheduling ---------------------------------------------------------

    def _signature(self, r: UniTokRequest):
        def seg(x, what):
            return (None if x is None
                    else _pick_bucket(len(x), self.feat_buckets, what))

        return (seg(r.caption_feats, "caption"), seg(r.ref_feats, "ref"),
                seg(r.input_feats, "input"))

    def validate(self, req: UniTokRequest) -> None:
        """Static-cap validation, mirroring ContinuousBatchingEngine:
        reject requests that can never run (or would silently produce
        garbage sampling) loudly, BEFORE any slot/block mutation."""
        if not (1 <= req.num_frames <= self.max_frames):
            raise ValueError(
                f"num_frames {req.num_frames} not in [1, {self.max_frames}]")
        if req.temperature <= 0:
            raise ValueError(f"temperature must be > 0, got {req.temperature}")
        if not (0 < req.top_p <= 1.0):
            raise ValueError(f"top_p must be in (0, 1], got {req.top_p}")
        if not (1 <= req.top_k <= self.max_top_k):
            raise ValueError(
                f"top_k {req.top_k} not in [1, {self.max_top_k}]")
        self._signature(req)  # raises on over-long feature segments

    def _free_slots(self) -> List[int]:
        return [s for s in range(self.num_slots) if self._uids[s] is None]

    def _reap_host(self) -> None:
        """Deterministic completion bookkeeping (no device sync): decode
        lengths are fixed, so a slot whose host-tracked remaining count hit
        zero IS finished — release its blocks now; its outputs stay in the
        state arrays until a displacing insert stashes them (or harvest
        fetches them)."""
        for s in range(self.num_slots):
            if (self._uids[s] is not None and self._remaining[s] == 0
                    and s not in self._done_slots):
                self.allocator.release(self._slot_blocks[s])
                self._slot_blocks[s] = []
                self._done_slots.add(s)

    def admit_wave(self, reqs: List[UniTokRequest], rng,
                   displace: bool = False) -> List[int]:
        """Admit a same-signature wave into free slots; returns uids.

        With ``displace=True`` (the run() fast path), slots whose request
        finished — tracked host-side, no device sync — are reused directly;
        the insert program stashes their outputs in-graph for a later
        batched fetch."""
        if not reqs:
            return []
        if not isinstance(rng, np.random.Generator):
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(rng), np.uint32))
        # validate the whole wave BEFORE any slot/block mutation: a raise
        # mid-loop (including from _signature's bucket lookup) would leave
        # earlier requests' slots marked occupied with no device state
        for r in reqs:
            self.validate(r)
        sig = self._signature(reqs[0])
        if displace:
            self._reap_host()
            slots = [s for s in range(self.num_slots)
                     if self._uids[s] is None or s in self._done_slots]
        else:
            slots = self._free_slots()
        take = []
        for r in reqs:
            if not slots:
                break
            if self._signature(r) != sig:
                continue
            steps = r.num_frames + self.K - 1
            # prompt length = 1 task + (sep + bucket per segment) + final sep
            plen = 1 + sum(1 + b for b in sig if b is not None) + 1
            need = math.ceil((plen + steps + 1) / self.block_size)
            if self.allocator.block_cost(need) > len(self.allocator.free):
                break
            blocks = self.allocator.alloc(need)
            s = slots.pop(0)
            take.append((s, r, blocks, self._uids[s]
                         if s in self._done_slots else None))
            self._done_slots.discard(s)
            self._slot_blocks[s] = blocks
            self._uids[s] = r.uid
            self._remaining[s] = steps
        if not take:
            return []

        cap_b, ref_b, inp_b = sig
        # FIXED wave batch size: pad every wave to num_slots so the prefill
        # program is compiled once per signature, not once per free-slot
        # count (a new wave shape = a multi-second remote recompile
        # mid-serving — CLAUDE.md decode-latency lesson #4). Padded rows get
        # slot id num_slots (dropped by the mode="drop" scatters) and
        # all-trash tables (scatter_prefill writes their KV into the trash
        # block, which visibility masking never reads).
        b_pad = self.num_slots

        def stackseg(get, bukt, dim):
            if bukt is None:
                return (jnp.zeros((b_pad, 1, dim), np.float32),
                        jnp.zeros((b_pad,), jnp.int32))
            arrs = np.zeros((b_pad, bukt, dim), np.float32)
            lens = np.zeros((b_pad,), np.int32)
            for i, (_, r, _, _) in enumerate(take):
                x = get(r)
                arrs[i, : len(x)] = x
                lens[i] = len(x)
            return jnp.asarray(arrs), jnp.asarray(lens)

        cap, cap_len = stackseg(lambda r: r.caption_feats, cap_b,
                                self.cfg.text_dim)
        ref, ref_len = stackseg(lambda r: r.ref_feats, ref_b,
                                self.cfg.audio_dim)
        inp, inp_len = stackseg(lambda r: r.input_feats, inp_b,
                                self.cfg.audio_dim)
        tables = np.full((b_pad, self.max_blocks), TRASH_BLOCK, np.int32)
        for i, (_, _, blocks, _) in enumerate(take):
            tables[i, : len(blocks)] = blocks

        def pad1(vals, fill, dt):
            out = np.full((b_pad,), fill, dt)
            out[: len(vals)] = vals
            return jnp.asarray(out)

        rngs = np.zeros((b_pad, 2), np.uint32)
        for i in range(len(take)):
            rngs[i] = rng.integers(0, 2**32, size=2, dtype=np.uint32)
        replaced: List[Optional[int]] = [None] * b_pad
        for i, (_, _, _, old_uid) in enumerate(take):
            replaced[i] = old_uid
        self.pool, self.state, stash = self._prefill_insert(
            self.params, self.pool, self.state,
            pad1([s for s, _, _, _ in take], self.num_slots, np.int32),
            jnp.asarray(tables),
            pad1([r.task_id for _, r, _, _ in take], 0, np.int32),
            cap, cap_len, ref, ref_len, inp, inp_len,
            pad1([r.num_frames for _, r, _, _ in take], 0, np.int32),
            jnp.asarray(rngs),
            pad1([r.do_sample for _, r, _, _ in take], False, bool),
            pad1([r.temperature for _, r, _, _ in take], 1.0, np.float32),
            pad1([r.top_k for _, r, _, _ in take], 1, np.int32),
            pad1([r.top_p for _, r, _, _ in take], 1.0, np.float32),
            has_cap=cap_b is not None, has_ref=ref_b is not None,
            has_inp=inp_b is not None,
        )
        if any(u is not None for u in replaced):
            self._pending_stashes.append((replaced, stash))
        self._stats["prefill_waves"] += 1
        return [r.uid for _, r, _, _ in take]

    def _block_bound(self) -> int:
        """Static decode-read prefix bound; with a SHARED allocator the
        bound covers both engines' blocks (BlockAllocator.bounded_high_water
        keeps the bucket granularity consistent across engines). Owner mode
        ignores the bound — a constant keeps one compiled program per n."""
        if self.use_flash_kernel == "owner":
            return self.num_blocks
        return self.allocator.bounded_high_water()

    def step(self, n: int = 1) -> None:
        self._stats["step_dispatches"] += 1
        self.pool, self.state = self._step_n(
            self.params["params"]["backbone"], self._emb, self._heads,
            self.pool, self.state, n=n, nb=self._block_bound())
        for s in range(self.num_slots):
            if self._uids[s] is not None and self._remaining[s] > 0:
                self._remaining[s] = max(0, self._remaining[s] - n)

    def _undelay(self, uid: int, delayed: np.ndarray,
                 nframes: int) -> UniTokResult:
        """Host-side delay undo on a fetched (max_steps, K) buffer: the
        per-codebook shift (delay.undo_delay is the in-graph counterpart
        used at training time)."""
        t = nframes
        codes = np.stack(
            [delayed[k : k + t, k] for k in range(self.K)], axis=-1)
        return UniTokResult(
            uid, np.clip(codes, 0, self.cfg.codebook_size - 1))

    def drain_stashes(self) -> List[UniTokResult]:
        """Fetch every pending displaced-slot stash in ONE batched
        device_get (each fetch is a full tunnel round trip)."""
        if not self._pending_stashes:
            return []
        fetched = jax.device_get([st for _, st in self._pending_stashes])
        self._stats["stash_fetches"] += 1
        results = []
        for (replaced, _), (outs, nf) in zip(self._pending_stashes, fetched):
            for i, uid in enumerate(replaced):
                if uid is not None:
                    results.append(self._undelay(uid, outs[i], int(nf[i])))
        self._pending_stashes = []
        return results

    def stats(self) -> Dict[str, float]:
        return dict(self._stats)

    def harvest(self) -> List[UniTokResult]:
        done = [s for s in range(self.num_slots)
                if self._uids[s] is not None and self._remaining[s] == 0]
        if not done:
            return []
        # ONE wholesale fetch of the fixed-shape state arrays, sliced on
        # host. Fetching "only the finished rows" via state["out"][rows]
        # was a shape-varying EAGER gather: one fresh compile per distinct
        # done-count, too small for the persistent cache (<1 s), so every
        # process re-paid it INSIDE the timed run at relay-dependent
        # latency (measured 2.7 s of a 6.2 s 16-slot bench wall;
        # JAX_LOG_COMPILES showed gather/broadcast_in_dim compiles up to
        # process exit). The whole (slots, max_steps, K) int32 stash is
        # ~67 KB at 16 slots — ~1 ms on the wire, zero compiles.
        outs_all, nf_all = jax.device_get((self.state["out"],
                                           self.state["num_frames"]))
        results = []
        for s in done:
            results.append(self._undelay(self._uids[s], outs_all[s],
                                         int(nf_all[s])))
            if self._slot_blocks[s]:  # not already released by _reap_host
                self.allocator.release(self._slot_blocks[s])
                self._slot_blocks[s] = []
            self._done_slots.discard(s)
            self._uids[s] = None
        return results

    def run(self, requests: List[UniTokRequest], rng,
            poll_interval: int = 256) -> Dict[int, UniTokResult]:
        """Drive until all requests complete: displacing admissions (no
        device sync between waves — finished slots are reused directly and
        their outputs stashed in-graph), power-of-two step decomposition to
        each completion point, one batched stash drain at the end (per wave
        with ``eager_drain=True``)."""
        if not isinstance(rng, np.random.Generator):
            rng = np.random.default_rng(
                np.asarray(jax.random.key_data(rng), np.uint32))
        poll_interval = 1 << (max(int(poll_interval), 1).bit_length() - 1)
        pending = list(requests)
        results: Dict[int, UniTokResult] = {}
        guard = 0
        while True:
            if pending:
                # group by signature; admit the largest same-signature run
                sig = self._signature(pending[0])
                wave = [r for r in pending if self._signature(r) == sig]
                admitted = set(self.admit_wave(wave, rng, displace=True))
                pending = [r for r in pending if r.uid not in admitted]
            active = [self._remaining[s] for s in range(self.num_slots)
                      if self._uids[s] is not None and self._remaining[s] > 0]
            if not active:
                if pending:
                    raise RuntimeError("pool too small for pending requests")
                break
            remaining = min(active)
            first = True
            # dispatch-minimizing pow2 decomposition (shared with the
            # UniSE engine, serve/engine.py segment_chunks): overshot
            # steps are exact in-graph no-ops here — inactive rows are
            # masked out of every state write, `index` never advances,
            # and rng chains split once per device step for every
            # occupied row regardless of activity, so a slot's sampling
            # chain position stays equal to its token index
            for c in segment_chunks(remaining, max(active), poll_interval,
                                    self.dispatch_overshoot):
                self.step(n=c)
                if first and self.eager_drain:
                    # overlap: fetch previous waves' stashes while these
                    # decode chunks execute on device
                    for r in self.drain_stashes():
                        results[r.uid] = r
                    first = False
            guard += 1
            if guard > 100000:
                raise RuntimeError("engine did not converge")
        for r in self.drain_stashes():
            results[r.uid] = r
        for r in self.harvest():
            results[r.uid] = r
        return results
