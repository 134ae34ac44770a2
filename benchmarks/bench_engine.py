"""Continuous-batching paged-KV engine throughput on the real chip: a stream
of mixed-task SE/TSE requests flows through the slot pool; measures sustained
tokens/sec and request latency at full LM size (the north-star serving mode).

Round-2 engine: paged block-pool KV, batched bucket-padded admissions
(one prefill dispatch per wave), per-request sampling params, bf16 params."""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def main(num_slots: int = 8, num_requests: int = 24, dtype: str = "bfloat16",
         poll_interval: int = 256, wav_input: bool = False,
         eager_drain: bool = True, kv_quant: str = ""):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.lm.sft import LLMSFT
    from unified_audio_tpu.serve.engine import ContinuousBatchingEngine, Request
    from unified_audio_tpu.utils.initialization import init_on_cpu

    # device-touch watchdog (as in bench.py): a wedged relay hangs the first
    # device touch forever at 0% CPU — fail loudly instead
    import os
    import threading
    box = {}
    th = threading.Thread(target=lambda: box.setdefault("d", jax.devices()),
                          daemon=True)
    th.start()
    th.join(timeout=600)
    if "d" not in box:
        print(json.dumps({"error": "device touch hung (wedged relay?)"}),
              flush=True)
        os._exit(2)

    cfg = LlamaConfig()
    sft = LLMSFT(cfg, num_tasks=3, feats_dim=768)
    params = init_on_cpu(lambda: sft.init(
        jax.random.PRNGKey(0), 0, None,
        np.zeros((1, 250, 768), np.float32),
        np.zeros((1, 32), np.int32), np.zeros((1, 250), np.int32),
    ))

    rng = np.random.default_rng(0)
    seg = 80000  # 5 s @ 16 kHz — the serve-CLI segment

    extra = {}
    if wav_input:
        # waveform admission (the serve-CLI production path): mix rides the
        # link as int16 samples; the REAL WavLM-base frontend runs inside
        # the prefill program. Enroll stays precomputed features (hybrid).
        from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod

        ssl = ssl_mod.Wav2Vec2Model(ssl_mod.wavlm_base_plus_config())
        ssl_vars = init_on_cpu(lambda: ssl.init(
            jax.random.PRNGKey(1), np.zeros((1, seg + 320), np.float32)))

        def feature_fn(variables, wav):
            padded = jnp.pad(wav, [(0, 0), (160, 160)])
            return ssl_mod.wavlm_features(ssl.apply(variables, padded))

        extra = dict(feature_fn=feature_fn, feature_params=ssl_vars,
                     wav_buckets=(seg,))

    def make_request(uid):
        task = uid % 3  # mixed se/tse/rtse traffic
        if wav_input:
            # full-segment enrolls ride the sample wire too (exact bucket,
            # identical features — the serve-CLI fast path)
            inputs = dict(
                mix_wav=rng.standard_normal(seg).astype(np.float32) * 0.1,
                enroll_wav=(rng.standard_normal(seg).astype(np.float32)
                            * 0.1 if task != 0 else None))
        else:
            inputs = dict(
                mix_feats=rng.standard_normal((250, 768)).astype(
                    np.float32),
                enroll_feats=(rng.standard_normal((250, 768)).astype(
                    np.float32) if task != 0 else None))
        return Request(
            task_id=task, global_length=32, semantic_length=250, uid=uid,
            **inputs,
        )

    eng = ContinuousBatchingEngine(
        sft, params, num_slots=num_slots, block_size=64,
        max_global=32, max_semantic=256, mix_buckets=(256,),
        dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
        eager_drain=eager_drain,
        kv_quant=kv_quant or None,
        **extra,
    )
    # warmup: OVERSUBSCRIBE the pool (num_slots + a wave) so the displacing
    #-insert and stash-drain programs compile here, not in the timed run —
    # a 32-slot int8 config measured 6.2 s of its 8.2 s wall inside admit
    # before this covered them (remote compiles are ~6-8 s each)
    print(json.dumps({"stage": "warmup"}), flush=True)
    eng.run([make_request(10_000 + i) for i in range(num_slots + 4)],
            jax.random.PRNGKey(1), poll_interval=poll_interval)

    reqs = [make_request(i) for i in range(num_requests)]
    before = {k: v for k, v in eng.stats().items() if k.startswith("t_")}
    t0 = time.perf_counter()
    results = eng.run(reqs, jax.random.PRNGKey(2), poll_interval=poll_interval)
    dt = time.perf_counter() - t0
    assert len(results) == num_requests
    tokens = num_requests * (33 + 250)
    print(json.dumps({
        "metric": "engine_mixed_task_throughput",
        "num_slots": num_slots,
        "num_requests": num_requests,
        "dtype": dtype,
        "kv": "paged int8" if kv_quant else "paged",
        "kernel": eng.use_flash_kernel or "xla",
        "input": "wav" if wav_input else "feats",
        "drain": "eager" if eager_drain else "deferred",
        "poll_interval": poll_interval,
        "tokens_per_sec": round(tokens / dt, 1),
        "requests_per_sec": round(num_requests / dt, 2),
        "audio_sec_per_sec": round(num_requests * 5.0 / dt, 2),
        "wall_s": round(dt, 2),
        "host_budget": {k: round(v - before.get(k, 0.0), 3)
                        for k, v in eng.stats().items()
                        if k.startswith("t_")},
    }), flush=True)


if __name__ == "__main__":
    import sys

    kw = {}
    if len(sys.argv) > 1:
        kw["num_slots"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["num_requests"] = int(sys.argv[2])
    if len(sys.argv) > 3:
        kw["dtype"] = sys.argv[3]
    if len(sys.argv) > 4:
        kw["poll_interval"] = int(sys.argv[4])
    if len(sys.argv) > 5:
        kw["wav_input"] = bool(int(sys.argv[5]))
    if len(sys.argv) > 6:
        kw["eager_drain"] = bool(int(sys.argv[6]))
    if len(sys.argv) > 7:
        kw["kv_quant"] = sys.argv[7]
    main(**kw)
