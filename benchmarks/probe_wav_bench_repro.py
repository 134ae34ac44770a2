"""Reproduce bench_engine wav mode (16-slot warmup then 128 requests) with
per-phase wall timing monkeypatched into the engine."""
import sys as _sys
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.lm.sft import LLMSFT
    from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
    from unified_audio_tpu.serve.engine import (ContinuousBatchingEngine,
                                                Request)
    from unified_audio_tpu.utils.initialization import init_on_cpu

    cfg = LlamaConfig()
    sft = LLMSFT(cfg, num_tasks=3, feats_dim=768)
    params = init_on_cpu(lambda: sft.init(
        jax.random.PRNGKey(0), 0, None,
        np.zeros((1, 250, 768), np.float32),
        np.zeros((1, 32), np.int32), np.zeros((1, 250), np.int32),
    ))

    seg = 80000
    ssl = ssl_mod.Wav2Vec2Model(ssl_mod.wavlm_base_plus_config())
    ssl_vars = init_on_cpu(lambda: ssl.init(
        jax.random.PRNGKey(1), np.zeros((1, seg + 320), np.float32)))

    def feature_fn(variables, wav):
        padded = jnp.pad(wav, [(0, 0), (160, 160)])
        return ssl_mod.wavlm_features(ssl.apply(variables, padded))

    rng = np.random.default_rng(0)

    def make_request(uid):
        task = uid % 3
        return Request(
            task_id=task,
            mix_wav=rng.standard_normal(seg).astype(np.float32) * 0.1,
            enroll_wav=(rng.standard_normal(seg).astype(np.float32) * 0.1
                        if task != 0 else None),
            global_length=32, semantic_length=250, uid=uid)

    eng = ContinuousBatchingEngine(
        sft, params, num_slots=16, block_size=64,
        max_global=32, max_semantic=256, mix_buckets=(256,),
        dtype=jnp.bfloat16,
        feature_fn=feature_fn, feature_params=ssl_vars, wav_buckets=(seg,),
    )

    # per-phase timing wrappers
    acc = {}

    def wrap(name, fn):
        def inner(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
            acc[name + "_n"] = acc.get(name + "_n", 0) + 1
            return out
        return inner

    eng.admit_many = wrap("admit", eng.admit_many)
    eng.prestage = wrap("prestage", eng.prestage)
    eng.drain_stashes = wrap("drain", eng.drain_stashes)
    eng.step = wrap("step", eng.step)
    eng.harvest = wrap("harvest", eng.harvest)

    print(json.dumps({"stage": "warmup"}), flush=True)
    t0 = time.perf_counter()
    eng.run([make_request(10_000 + i) for i in range(16)],
            jax.random.PRNGKey(1))
    print(json.dumps({"warmup_s": round(time.perf_counter() - t0, 2),
                      "phases": {k: round(v, 3) if isinstance(v, float)
                                 else v for k, v in acc.items()}}),
          flush=True)

    acc.clear()
    reqs = [make_request(i) for i in range(128)]
    t0 = time.perf_counter()
    results = eng.run(reqs, jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    assert len(results) == 128
    print(json.dumps({
        "wall_s": round(dt, 2),
        "tokens_per_sec": round(128 * 283 / dt, 1),
        "phases": {k: round(v, 3) if isinstance(v, float) else v
                   for k, v in acc.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
