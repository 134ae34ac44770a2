"""Reference-style vs TPU-native AR decode on the SAME chip.

The reference decodes token-by-token in a host Python loop over an HF
DynamicCache (QuarkAudio-UniSE/model/llm/llm_sft.py:137-193: one 5 s segment
at a time, one device dispatch + host sync per token). This benchmark runs
that exact execution pattern against this framework's weights (per-token
jitted decode_ids dispatch, batch 1, host-synced every step) and compares it
with the TPU-native design (whole two-phase decode as one lax.scan program,
batched segments) — an apples-to-apples measurement of the architectural
speedup on identical hardware, since the reference publishes no throughput
numbers (SURVEY §6).

Prints JSON lines: reference_style_tokens_per_sec, native tokens_per_sec
at batch 1 and 16, and the speedup ratios.
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def main(semantic_length: int = 250):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from functools import partial

    from unified_audio_tpu.models.lm.llama import (
        LlamaConfig, init_cache, range_mask, sample_logits,
    )
    from unified_audio_tpu.models.lm.sft import LLMSFT
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
    feats1 = jnp.asarray(rng.standard_normal((1, 250, 768)), jnp.bfloat16)

    # --- reference execution pattern: prefill once, then ONE dispatch and
    # ONE host sync per token (the HF DynamicCache Python loop) ---
    gmask = range_mask(cfg, cfg.global_offset, cfg.global_size)
    smask = range_mask(cfg, cfg.semantic_offset, cfg.semantic_size)

    @jax.jit
    def prefill(params, feats):
        prompt = sft.apply(params, 0, None, feats, method="_prompt")
        cache = init_cache(cfg, 1, prompt.shape[1] + 33 + semantic_length + 1,
                           dtype=prompt.dtype)
        _, cache = sft.apply(params, prompt, cache,
                             method=lambda m, p, c: m.lm.prefill(p, c))
        return cache

    @partial(jax.jit, donate_argnums=(2,))
    def one_token(params, ids, cache, mask, key):
        logits, cache = sft.apply(params, ids, cache,
                                  method=lambda m, i, c: m.lm.decode_ids(i, c))
        nxt = sample_logits(key, logits + mask[None], temperature=0.8,
                            top_k=50, top_p=0.95)
        return nxt, cache

    def reference_style():
        cache = prefill(params, feats1)
        key = jax.random.PRNGKey(0)
        ids = jnp.full((1,), cfg.global_sos, jnp.int32)
        toks = 0
        for phase_mask, n in ((gmask, 33), (smask, semantic_length)):
            if toks:
                ids = jnp.full((1,), cfg.semantic_sos, jnp.int32)
            for _ in range(n):
                key, sub = jax.random.split(key)
                ids, cache = one_token(params, ids, cache, phase_mask, sub)
                _ = np.asarray(ids)  # per-token host sync: the reference's
                # `while` loop reads each sampled token into Python
                toks += 1
        return toks

    n_tokens = reference_style()  # warmup/compile
    t0 = time.perf_counter()
    n_tokens = reference_style()
    ref_dt = time.perf_counter() - t0
    ref_rate = n_tokens / ref_dt
    print(json.dumps({"metric": "reference_style_decode",
                      "tokens_per_sec": round(ref_rate, 1),
                      "pattern": "per-token dispatch + host sync, batch 1"}),
          flush=True)

    # --- TPU-native: whole decode as one program ---
    @jax.jit
    def native(params, feats, key):
        return sft.apply(params, 0, None, feats, key, method="generate",
                         semantic_length=semantic_length)

    for b in (1, 16):
        feats = jnp.asarray(rng.standard_normal((b, 250, 768)), jnp.bfloat16)
        _ = np.asarray(native(params, feats, jax.random.PRNGKey(0))[1])
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(native(params, feats, jax.random.PRNGKey(i))[1])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        rate = b * (33 + semantic_length) / dt
        print(json.dumps({"metric": "native_decode",
                          "batch": b,
                          "tokens_per_sec": round(rate, 1),
                          "speedup_vs_reference_style": round(rate / ref_rate, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
