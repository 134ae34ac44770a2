"""Mixed UniSE + UniTok serving from ONE physical KV block pool, on chip.

Both engines (full UniSE SFT stack and full UniTok delay-pattern LM — same
512/12L backbone geometry, so their KV blocks are pool-compatible) share a
PoolRef + BlockAllocator. Traffic alternates in batches (UniSE wave,
UniTok wave, ...), so physical blocks recycle ACROSS engines between
batches — the on-chip version of tests/test_unitok_engine.py
TestSharedPool. Reports aggregate audio-seconds per wall-second and the
per-engine rates. Fetch-barriered wall timing (CLAUDE.md).
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import os
import threading
import time

import numpy as np


def log(**kw):
    print(json.dumps(kw), flush=True)


def main(num_slots: int = 16):
    try:
        os.nice(-10)
    except OSError:
        pass
    import jax
    import jax.numpy as jnp  # noqa: F401

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    box = {}
    th = threading.Thread(target=lambda: box.setdefault("d", jax.devices()),
                          daemon=True)
    th.start()
    th.join(timeout=600)
    if "d" not in box:
        log(error="device touch hung")
        os._exit(2)
    log(stage="device", platform=box["d"][0].platform)

    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.lm.sft import LLMSFT
    from unified_audio_tpu.models.unitok.model import UniTokConfig, UniTokLM
    from unified_audio_tpu.serve.engine import (ContinuousBatchingEngine,
                                                Request)
    from unified_audio_tpu.serve.paged import (PoolRef, RegionAllocator,
                                               init_pool)
    from unified_audio_tpu.serve.unitok_engine import (UniTokEngine,
                                                       UniTokRequest)
    from unified_audio_tpu.utils.initialization import init_on_cpu
    from unified_audio_tpu.utils.precision import bf16_params

    lcfg = LlamaConfig()
    sft = LLMSFT(lcfg, num_tasks=3, feats_dim=768)
    sft_params = bf16_params(init_on_cpu(lambda: sft.init(
        jax.random.PRNGKey(0), 0, None,
        np.zeros((1, 250, 768), np.float32),
        np.zeros((1, 32), np.int32), np.zeros((1, 250), np.int32))))

    ucfg = UniTokConfig()
    assert (ucfg.llama_config.num_layers == lcfg.num_layers
            and ucfg.llama_config.num_heads == lcfg.num_heads
            and ucfg.llama_config.head_dim == lcfg.head_dim), \
        "shared pool needs identical backbone geometry"
    utok = UniTokLM(ucfg)
    utok_params = bf16_params(init_on_cpu(lambda: utok.init(
        jax.random.PRNGKey(1), 0,
        np.zeros((1, 4, ucfg.text_dim), np.float32),
        np.zeros((1, 8, ucfg.audio_dim), np.float32),
        np.zeros((1, 8, ucfg.audio_dim), np.float32),
        np.zeros((1, 6, ucfg.num_codebooks), np.int32))))

    bs = 64
    # pool sized for the LARGER per-slot footprint of the two engines, in
    # 14-block regions (both engines default to the owner kernel on TPU,
    # c14 chunks since round 5 — exact fit for the 13-block cap):
    # UniSE 16 slots + UniTok 8 slots + trash region + spare
    num_blocks = (num_slots + 8 + 2) * 14 + 28
    pool_ref = PoolRef(init_pool(lcfg, num_blocks, bs, dtype=jnp.bfloat16))
    alloc = RegionAllocator(num_blocks, 14)

    eng_u = ContinuousBatchingEngine(
        sft, sft_params, num_slots=num_slots, block_size=bs,
        max_global=32, max_semantic=256, mix_buckets=(256,),
        pool_ref=pool_ref, allocator=alloc, eager_drain=False)
    eng_t = UniTokEngine(
        utok, utok_params, num_slots=8, block_size=bs, max_frames=128,
        feat_buckets=(128,), pool_ref=pool_ref, allocator=alloc)

    rng = np.random.default_rng(0)
    frames, seg_s = 125, 5.0

    def u_req(uid):
        task = uid % 3
        return Request(
            task_id=task,
            mix_feats=rng.standard_normal((250, 768)).astype(np.float32),
            enroll_feats=(rng.standard_normal((250, 768)).astype(np.float32)
                          if task else None),
            global_length=32, semantic_length=250, uid=uid)

    def t_req(uid):
        return UniTokRequest(
            task_id=uid % 7, num_frames=frames,
            input_feats=rng.standard_normal(
                (frames, ucfg.audio_dim)).astype(np.float32), uid=uid)

    log(stage="warmup")
    eng_u.run([u_req(90_000 + i) for i in range(num_slots)],
              jax.random.PRNGKey(1))
    eng_t.run([t_req(91_000 + i) for i in range(8)], jax.random.PRNGKey(2))

    # alternate engine batches over the shared pool: blocks released by one
    # engine's completions are allocated by the other's next wave
    NU, NT, ROUNDS = 32, 16, 2
    t0 = time.perf_counter()
    done_u = done_t = 0
    for r in range(ROUNDS):
        out = eng_u.run([u_req(1000 * r + i) for i in range(NU)],
                        jax.random.PRNGKey(10 + r))
        done_u += len(out)
        out = eng_t.run([t_req(5000 * r + i) for i in range(NT)],
                        jax.random.PRNGKey(20 + r))
        done_t += len(out)
    wall = time.perf_counter() - t0
    u_tokens = done_u * (33 + 250)
    t_codes = done_t * frames * ucfg.num_codebooks
    audio_s = done_u * seg_s + done_t * seg_s
    log(stage="mixed_shared_pool", num_slots_unise=num_slots,
        num_slots_unitok=8, unise_requests=done_u, unitok_requests=done_t,
        wall_s=round(wall, 3),
        unise_tokens_per_sec=round(u_tokens / wall, 1),
        unitok_codes_per_sec=round(t_codes / wall, 1),
        audio_sec_per_sec=round(audio_s / wall, 1),
        pool_blocks=num_blocks)
    try:
        log(stage="done", load1=round(os.getloadavg()[0], 2))
    except OSError:
        log(stage="done")


if __name__ == "__main__":
    main(*map(int, _sys.argv[1:2]))
