"""UniSE AR generation throughput: tokens/sec of the scan-based two-phase
decode at reference LM size (512 hidden / 12 layers / vocab 12291).

The reference decodes one 5 s segment at a time through a Python token loop
(llm_sft.py:139-193); here segments decode as a parallel batch inside one
compiled program. Reports tokens/sec and segment p50 latency per batch size.
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import sys
import time

import numpy as np


def main(batch_sizes=(1, 4, 8, 16)):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.lm.sft import LLMSFT
    from unified_audio_tpu.utils.initialization import init_on_cpu
    from unified_audio_tpu.utils.precision import bf16_params

    cfg = LlamaConfig()
    model = LLMSFT(cfg, num_tasks=3, feats_dim=768)
    t_feats, t_sem = 250, 250

    params = init_on_cpu(lambda: model.init(
        jax.random.PRNGKey(0), 0, None,
        np.zeros((1, t_feats, 768), np.float32),
        np.zeros((1, 32), np.int32), np.zeros((1, t_sem), np.int32),
    ))
    params = bf16_params(params)  # TPU-native compute dtype

    from functools import partial

    @partial(jax.jit, static_argnames=("do_sample",))
    def generate(params, mix_feats, rng, do_sample=True):
        return model.apply(
            params, 0, None, mix_feats, rng, method="generate",
            semantic_length=t_sem, do_sample=do_sample,
        )

    results = []
    for b in batch_sizes:
        feats = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, t_feats, 768)),
            dtype=jnp.bfloat16,
        )
        # force host materialization: on the experimental axon backend
        # block_until_ready returns early, so a fetch is the honest barrier
        _ = np.asarray(generate(params, feats, jax.random.PRNGKey(0))[1])
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(generate(params, feats, jax.random.PRNGKey(i))[1])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        tokens = b * (33 + t_sem)
        results.append({
            "batch": b,
            "tokens_per_sec": round(tokens / dt, 1),
            "segment_latency_s": round(dt, 4),
            "audio_sec_per_sec": round(b * 5.0 / dt, 2),
        })
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
