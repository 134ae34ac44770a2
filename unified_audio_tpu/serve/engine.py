"""Continuous-batched AR decode engine for UniSE serving.

The BASELINE north star: "decoder-only AR-LM ... runs continuous-batched TPU
decode with a paged KV cache; mixed-task requests saturate the MXU instead of
running per-task Python loops."

Design: a fixed pool of S slots, each owning a static-shape KV cache lane.
``admit()`` prefills a request's prompt into a free slot (one jitted program
per prompt length); ``step()`` advances ALL active slots one token in a single
jitted program — per-slot decode phase (global vs semantic vocab range),
per-slot cache positions, per-slot RNG. Finished slots are harvested and
refilled without stopping the pool. Task identity is just an embedding row
(llm_sft.py:29,60), so SE / TSE / rTSE requests mix freely in one batch.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.lm.llama import LlamaConfig, init_cache, range_mask, sample_logits
from ..models.lm.sft import LLMSFT

PHASE_GLOBAL, PHASE_SEMANTIC, PHASE_DONE = 0, 1, 2


@dataclass
class Request:
    task_id: int
    mix_feats: np.ndarray  # (T, D)
    enroll_feats: Optional[np.ndarray] = None  # (T, D) or None
    global_length: int = 32
    semantic_length: int = 250
    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.95
    do_sample: bool = True
    uid: int = 0


@dataclass
class Result:
    uid: int
    global_ids: np.ndarray
    semantic_ids: np.ndarray


class ContinuousBatchingEngine:
    def __init__(
        self,
        sft: LLMSFT,
        params,
        num_slots: int = 8,
        max_cache_len: int = 1024,
        max_global: int = 32,
        max_semantic: int = 256,
    ):
        self.sft = sft
        self.cfg = sft.cfg
        self.params = params
        self.num_slots = num_slots
        self.max_cache_len = max_cache_len
        self.max_global = max_global
        self.max_semantic = max_semantic

        cfg = self.cfg
        # ONE batched cache over the slot axis with per-slot positions:
        # (L, S, max_len, H, hd) + index (S,). Decoding the pool is a single
        # real batch (decode_ids_multi), not a vmap of batch-1 programs.
        base = init_cache(cfg, num_slots, max_cache_len)
        self.cache = {"k": base["k"], "v": base["v"],
                      "index": jnp.zeros((num_slots,), jnp.int32)}
        self.state = {
            "phase": jnp.full((num_slots,), PHASE_DONE, jnp.int32),
            "steps_in_phase": jnp.zeros((num_slots,), jnp.int32),
            "global_len": jnp.zeros((num_slots,), jnp.int32),
            "semantic_len": jnp.zeros((num_slots,), jnp.int32),
            "last_ids": jnp.zeros((num_slots,), jnp.int32),
            "rng": jnp.zeros((num_slots, 2), jnp.uint32),
            "do_sample": jnp.zeros((num_slots,), jnp.bool_),
            "out_global": jnp.zeros((num_slots, max_global), jnp.int32),
            "out_semantic": jnp.zeros((num_slots, max_semantic), jnp.int32),
        }
        self._uids: List[Optional[int]] = [None] * num_slots

        gmask = range_mask(cfg, cfg.global_offset, cfg.global_size)
        smask = range_mask(cfg, cfg.semantic_offset, cfg.semantic_size)

        @partial(jax.jit, static_argnames=("task_static", "with_enroll"))
        def _prefill(params, task_static, with_enroll, mix_feats, enroll_feats):
            """-> fresh single-slot cache after prompt prefill."""
            cache = init_cache(cfg, 1, max_cache_len)
            prompt = self.sft.apply(
                params, task_static,
                enroll_feats[None] if with_enroll else None,
                mix_feats[None], method="_prompt",
            )
            _, cache = self.sft.apply(
                params, prompt, cache,
                method=lambda m, p, c: m.lm.prefill(p, c),
            )
            return cache

        @jax.jit
        def _insert(cache_all, state, slot, new_cache, global_len,
                    semantic_len, rng, do_sample):
            cache_all = dict(cache_all)
            # new_cache is a batch-1 prefilled cache: write its lane into slot
            cache_all["k"] = cache_all["k"].at[:, slot].set(new_cache["k"][:, 0])
            cache_all["v"] = cache_all["v"].at[:, slot].set(new_cache["v"][:, 0])
            cache_all["index"] = cache_all["index"].at[slot].set(
                new_cache["index"]
            )
            state = dict(state)
            state["phase"] = state["phase"].at[slot].set(PHASE_GLOBAL)
            state["steps_in_phase"] = state["steps_in_phase"].at[slot].set(0)
            state["global_len"] = state["global_len"].at[slot].set(global_len)
            state["semantic_len"] = state["semantic_len"].at[slot].set(semantic_len)
            state["last_ids"] = state["last_ids"].at[slot].set(cfg.global_sos)
            state["rng"] = state["rng"].at[slot].set(rng)
            state["do_sample"] = state["do_sample"].at[slot].set(do_sample)
            state["out_global"] = state["out_global"].at[slot].set(0)
            state["out_semantic"] = state["out_semantic"].at[slot].set(0)
            return cache_all, state

        def _step_body(params, cache_all, state):
            phase = state["phase"]
            active = phase != PHASE_DONE

            # one REAL batched decode step for the whole pool (per-slot
            # cache positions via decode_ids_multi)
            logits, new_cache = self.sft.apply(
                params, state["last_ids"], cache_all,
                method=lambda m, i, c: m.lm.decode_ids_multi(i, c),
            )  # (S, V)

            mask = jnp.where(
                (phase == PHASE_GLOBAL)[:, None], gmask[None], smask[None]
            )
            rngs = jax.vmap(jax.random.split, in_axes=(0, None))(
                state["rng"], 2
            )  # (S, 2, 2)
            step_keys, next_rngs = rngs[:, 0], rngs[:, 1]
            sampled = jax.vmap(
                lambda k, l: sample_logits(k, l[None], temperature=0.8,
                                           top_k=50, top_p=0.95)[0]
            )(step_keys, logits + mask)
            greedy = jnp.argmax(logits + mask, axis=-1).astype(jnp.int32)
            tokens = jnp.where(state["do_sample"], sampled, greedy)

            steps = state["steps_in_phase"]
            in_global = phase == PHASE_GLOBAL
            in_semantic = phase == PHASE_SEMANTIC

            # write outputs. Phase-1 emits global_len+1 tokens; the final one
            # is discarded-but-cached (llm_sft.py:139-164 quirk), so only
            # steps < global_len are stored.
            write_g = in_global & (steps < state["global_len"]) & active
            out_global = state["out_global"].at[
                jnp.arange(self.num_slots), jnp.minimum(steps, max_global - 1)
            ].set(
                jnp.where(write_g,
                          tokens - cfg.global_offset,
                          state["out_global"][jnp.arange(self.num_slots),
                                              jnp.minimum(steps, max_global - 1)])
            )
            write_s = in_semantic & active
            sem_idx = jnp.minimum(steps, max_semantic - 1)
            out_semantic = state["out_semantic"].at[
                jnp.arange(self.num_slots), sem_idx
            ].set(
                jnp.where(write_s, tokens - cfg.semantic_offset,
                          state["out_semantic"][jnp.arange(self.num_slots),
                                                sem_idx])
            )

            steps_next = steps + 1
            # phase transitions
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
            new_state["out_global"] = out_global
            new_state["out_semantic"] = out_semantic

            # inactive slots must not corrupt their caches: restore the old
            # cache content for them (slot axis is axis 1 of the k/v buffers)
            act_kv = active[None, :, None, None, None]
            cache_out = {
                "k": jnp.where(act_kv, new_cache["k"], cache_all["k"]),
                "v": jnp.where(act_kv, new_cache["v"], cache_all["v"]),
                "index": jnp.where(active, new_cache["index"],
                                   cache_all["index"]),
            }
            return cache_out, new_state

        @partial(jax.jit, static_argnames=("n",), donate_argnums=(1, 2))
        def _step_n(params, cache_all, state, n=1):
            """n decode steps for the whole pool as ONE dispatched lax.scan —
            per-step host round trips dominate on remote-attached chips."""
            def body(carry, _):
                cache_all, state = carry
                return _step_body(params, cache_all, state), None

            (cache_all, state), _ = jax.lax.scan(
                body, (cache_all, state), None, length=n
            )
            return cache_all, state

        self._prefill = _prefill
        self._insert = _insert
        self._step_n = _step_n

    # --- host-side API ---

    def free_slots(self) -> List[int]:
        phase = np.asarray(self.state["phase"])
        return [i for i in range(self.num_slots) if phase[i] == PHASE_DONE]

    def admit(self, req: Request, rng) -> int:
        slots = self.free_slots()
        if not slots:
            raise RuntimeError("no free slot")
        slot = slots[0]
        # harvest anything still recorded in that slot first
        new_cache = self._prefill(
            self.params, req.task_id, req.enroll_feats is not None,
            jnp.asarray(req.mix_feats),
            jnp.asarray(req.enroll_feats)
            if req.enroll_feats is not None
            else jnp.zeros((1, req.mix_feats.shape[-1]), jnp.float32),
        )
        self.cache, self.state = self._insert(
            self.cache, self.state, slot, new_cache,
            req.global_length, req.semantic_length,
            jax.random.key_data(rng) if hasattr(jax.random, "key_data") else rng,
            req.do_sample,
        )
        self._uids[slot] = req.uid
        return slot

    def step(self, n: int = 1):
        self.cache, self.state = self._step_n(self.params, self.cache,
                                              self.state, n=n)

    def harvest(self) -> List[Result]:
        phase = np.asarray(self.state["phase"])
        out = []
        for i in range(self.num_slots):
            if phase[i] == PHASE_DONE and self._uids[i] is not None:
                g = np.asarray(self.state["out_global"][i])
                s = np.asarray(self.state["out_semantic"][i])
                glen = int(self.state["global_len"][i])
                slen = int(self.state["semantic_len"][i])
                out.append(Result(self._uids[i], g[:glen], s[:slen]))
                self._uids[i] = None
        return out

    def run(self, requests: List[Request], rng,
            poll_interval: int = 16) -> Dict[int, Result]:
        """Drive the pool until all requests complete (simple scheduler).

        ``poll_interval`` batches device steps between host-side harvest
        polls: each poll costs a device->host sync, which dominates on
        remote-attached chips (stepping an all-done pool is a no-op, so
        over-stepping by up to poll_interval is harmless)."""
        pending = list(requests)
        results: Dict[int, Result] = {}
        i = 0
        while pending or any(u is not None for u in self._uids):
            while pending and self.free_slots():
                rng, sub = jax.random.split(rng)
                self.admit(pending.pop(0), sub)
            self.step(n=poll_interval)
            for r in self.harvest():
                results[r.uid] = r
            i += poll_interval
            if i > 100000:
                raise RuntimeError("engine did not converge")
        return results
