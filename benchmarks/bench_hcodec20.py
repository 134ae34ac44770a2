"""HCodec-2.0 batched encode/decode throughput (BASELINE config 2: batched
RVQ codec, batch=32): 48 kHz, 3 s utterances, full large_12.5hz model
(1536-dim, 24+32 ConvNeXt stacks, RVQ 16x1024 per stream)."""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def main(batch: int = 32, seconds: float = 3.0):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.hcodec.codec import HCodec, hcodec20_config
    from unified_audio_tpu.utils.initialization import init_on_cpu

    cfg = hcodec20_config()
    codec = HCodec(cfg)
    sr = cfg.sample_rate
    t = int(seconds * sr) // cfg.hop_length * cfg.hop_length
    t16 = t // 3  # HuBERT features computed on the 16 kHz resample
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, t, 1)), jnp.float32
    )
    feat = jnp.asarray(
        np.random.default_rng(1).standard_normal((batch, t16 // 320, cfg.feat_dim)),
        jnp.float32,
    )
    print(json.dumps({"stage": "init"}), flush=True)
    variables = init_on_cpu(lambda: codec.init(
        {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)},
        np.zeros((1, t, 1), np.float32),
        np.zeros((1, t16 // 320, cfg.feat_dim), np.float32), train=False,
    ))

    @jax.jit
    def roundtrip(variables, wav, feat):
        ac, sem = codec.apply(variables, wav, feat, method="encode")
        return codec.apply(variables, ac, sem, method="decode")

    print(json.dumps({"stage": "warmup"}), flush=True)
    _ = np.asarray(roundtrip(variables, wav, feat))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(roundtrip(variables, wav, feat))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "hcodec20_batch_rtfx",
        "batch": batch,
        "value": round(batch * seconds / dt, 2),
        "unit": "x_realtime_per_chip",
        "p50_s": round(dt, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
