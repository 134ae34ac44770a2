"""Diagnose the wav-admission prefill cost: time each engine phase for a
single 16-request wave (feats vs wav), log any recompiles, and time the
bare WavLM feature program at wave batch on its own."""
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
        jax.config.update("jax_log_compiles", True)
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

    # --- bare feature program at wave batch -----------------------------
    ffj = jax.jit(feature_fn)
    w16 = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((16, seg)).astype(np.float32) * 0.1)
    t0 = time.perf_counter()
    np.asarray(ffj(ssl_vars, w16))
    print(json.dumps({"bare_wavlm_16x5s_cold_s":
                      round(time.perf_counter() - t0, 2)}), flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(ffj(ssl_vars, w16))
    print(json.dumps({"bare_wavlm_16x5s_warm_s":
                      round(time.perf_counter() - t0, 3)}), flush=True)

    # --- engine wave timing ---------------------------------------------
    rng = np.random.default_rng(0)

    def req(uid, wav_input):
        task = uid % 3
        if wav_input:
            return Request(
                task_id=task,
                mix_wav=rng.standard_normal(seg).astype(np.float32) * 0.1,
                enroll_wav=(rng.standard_normal(seg).astype(np.float32) * 0.1
                            if task != 0 else None),
                global_length=32, semantic_length=250, uid=uid)
        return Request(
            task_id=task,
            mix_feats=rng.standard_normal((250, 768)).astype(np.float32),
            enroll_feats=(rng.standard_normal((250, 768)).astype(np.float32)
                          if task != 0 else None),
            global_length=32, semantic_length=250, uid=uid)

    eng = ContinuousBatchingEngine(
        sft, params, num_slots=16, block_size=64,
        max_global=32, max_semantic=256, mix_buckets=(256,),
        dtype=jnp.bfloat16,
        feature_fn=feature_fn, feature_params=ssl_vars,
        wav_buckets=(seg,),
    )

    for wav_input in (False, True):
        tag = "wav" if wav_input else "feats"
        # warmup wave (compiles)
        t0 = time.perf_counter()
        out = eng.run([req(10_000 + i, wav_input) for i in range(16)],
                      jax.random.PRNGKey(1))
        assert len(out) == 16
        warm = time.perf_counter() - t0
        # measured single wave
        t0 = time.perf_counter()
        out = eng.run([req(i, wav_input) for i in range(16)],
                      jax.random.PRNGKey(2))
        one = time.perf_counter() - t0
        # three waves (48 requests)
        t0 = time.perf_counter()
        out = eng.run([req(100 + i, wav_input) for i in range(48)],
                      jax.random.PRNGKey(3))
        three = time.perf_counter() - t0
        print(json.dumps({
            "mode": tag,
            "warmup_wave_s": round(warm, 2),
            "one_wave_s": round(one, 3),
            "three_waves_s": round(three, 3),
            "per_extra_wave_s": round((three - one) / 2, 3),
            "stats": {k: v for k, v in eng.stats().items()
                      if k in ("prefill_waves", "step_dispatches",
                               "decode_steps")},
        }), flush=True)


if __name__ == "__main__":
    main()
