"""Round-4 lever measurements (one process, one chip claim):

  1. UniSE feats engine @16/@32 slots with the int8 feature wire
     (vs the round-4 bf16 deferred baseline: 12.6k / 11.4k tok/s)
  2. UniTok displacing engine @8/@16 slots (first on-chip numbers)

All timings fetch-barriered (np.asarray / blocking device_get) —
block_until_ready returns early on the axon backend (CLAUDE.md).
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


def main():
    try:
        os.nice(-10)
    except OSError:
        pass
    import jax
    import jax.numpy as jnp

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
    from unified_audio_tpu.serve.engine import (ContinuousBatchingEngine,
                                                Request)
    from unified_audio_tpu.utils.initialization import init_on_cpu
    from unified_audio_tpu.utils.precision import bf16_params

    cfg = LlamaConfig()
    sft = LLMSFT(cfg, num_tasks=3, feats_dim=768)
    params = bf16_params(init_on_cpu(lambda: sft.init(
        jax.random.PRNGKey(0), 0, None,
        np.zeros((1, 250, 768), np.float32),
        np.zeros((1, 32), np.int32), np.zeros((1, 250), np.int32),
    )))
    rng = np.random.default_rng(0)

    def make_request(uid):
        task = uid % 3
        return Request(
            task_id=task, global_length=32, semantic_length=250, uid=uid,
            mix_feats=rng.standard_normal((250, 768)).astype(np.float32),
            enroll_feats=(rng.standard_normal((250, 768)).astype(np.float32)
                          if task != 0 else None))

    NREQ = 128
    n_tokens = NREQ * 283

    def passes(eng, tag, n_pass=2, uid0=0):
        for p in range(n_pass):
            before = {k: v for k, v in eng.stats().items()
                      if k.startswith("t_")}
            reqs = [make_request(uid0 + 1000 * p + i) for i in range(NREQ)]
            t0 = time.perf_counter()
            out = eng.run(reqs, jax.random.PRNGKey(7 + p))
            dt = time.perf_counter() - t0
            assert len(out) == NREQ
            budget = {k: round(v - before.get(k, 0.0), 3)
                      for k, v in eng.stats().items() if k.startswith("t_")}
            log(stage=tag, npass=p, tok_s=round(n_tokens / dt, 1),
                wall_s=round(dt, 3), budget=budget)

    for slots in (16, 32):
        eng = ContinuousBatchingEngine(
            sft, params, num_slots=slots, block_size=64,
            max_global=32, max_semantic=256, mix_buckets=(256,),
            feats_wire="int8")
        log(stage=f"warmup{slots}_int8")
        eng.run([make_request(90_000 + slots + i) for i in range(slots)],
                jax.random.PRNGKey(1))
        passes(eng, f"feats{slots}_int8", n_pass=2, uid0=slots * 2000)
        del eng

    # ---- UniTok displacing engine ------------------------------------------
    from unified_audio_tpu.models.unitok.model import UniTokConfig, UniTokLM
    from unified_audio_tpu.serve.unitok_engine import (UniTokEngine,
                                                       UniTokRequest)

    ucfg = UniTokConfig()
    ulm = UniTokLM(ucfg)
    uparams = init_on_cpu(lambda: ulm.init(
        jax.random.PRNGKey(0), 0,
        np.zeros((1, 4, ucfg.text_dim), np.float32),
        np.zeros((1, 4, ucfg.audio_dim), np.float32),
        np.zeros((1, 4, ucfg.audio_dim), np.float32),
        np.zeros((1, 6, ucfg.num_codebooks), np.int32),
    ))
    frames = 125  # 5 s at 25 Hz

    def make_ureq(uid):
        task = uid % 7
        ref = (rng.standard_normal((frames, ucfg.audio_dim)).astype(
            np.float32) if task in (1, 3, 4) else None)
        return UniTokRequest(
            task_id=task, num_frames=frames,
            input_feats=rng.standard_normal(
                (frames, ucfg.audio_dim)).astype(np.float32),
            ref_feats=ref, do_sample=True, uid=uid)

    for slots in (8, 16):
        ueng = UniTokEngine(
            ulm, uparams, num_slots=slots, block_size=64,
            max_frames=frames, feat_buckets=(128,), dtype=jnp.bfloat16)
        log(stage=f"unitok_warmup{slots}")
        ueng.run([make_ureq(80_000 + slots + i) for i in range(slots)],
                 jax.random.PRNGKey(1))
        nreq = 64
        for p in range(2):
            reqs = [make_ureq(slots * 3000 + 1000 * p + i)
                    for i in range(nreq)]
            t0 = time.perf_counter()
            out = ueng.run(reqs, jax.random.PRNGKey(5 + p))
            dt = time.perf_counter() - t0
            assert len(out) == nreq
            log(stage=f"unitok{slots}", npass=p,
                codes_per_sec=round(nreq * frames * ucfg.num_codebooks / dt, 1),
                steps_per_sec=round(
                    nreq * (frames + ucfg.num_codebooks - 1) / dt, 1),
                audio_sec_per_sec=round(nreq * 5.0 / dt, 2),
                wall_s=round(dt, 2),
                stash_fetches=ueng.stats()["stash_fetches"])
        del ueng

    try:
        log(stage="done", load1=round(os.getloadavg()[0], 2))
    except OSError:
        log(stage="done")


if __name__ == "__main__":
    main()
