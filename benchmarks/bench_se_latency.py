"""End-to-end UniSE SE latency: 10 s noisy wav -> WavLM features -> AR-LM
two-phase decode -> BiCodec detokenize -> enhanced wav (BASELINE metric 3,
"SE p50 latency"). Full-size stack: wav2vec2-large-XLSR BiCodec frontend,
WavLM-base-plus conditioner, 512/12L LM. Random weights (latency is
weight-independent)."""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.bicodec.tokenizer import BiCodecTokenizer
    from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
    from unified_audio_tpu.models.unise.model import UniSE, UniSEConfig
    from unified_audio_tpu.utils.initialization import init_on_cpu

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    print(json.dumps({"stage": "init"}), flush=True)
    tok = BiCodecTokenizer.from_random(k1)
    wavlm_cfg = ssl_mod.wavlm_base_plus_config()
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_cfg)
    wavlm_vars = init_on_cpu(
        lambda: wavlm.init(k2, np.zeros((1, 16320), np.float32))
    )
    unise = UniSE(UniSEConfig(), tok, wavlm_cfg, wavlm_vars,
                  rng={"params": k3})

    wav = (np.random.default_rng(0).standard_normal((1, 160000)) * 0.1).astype(
        np.float32
    )
    print(json.dumps({"stage": "warmup"}), flush=True)
    est = unise.enhance_se(wav)  # compiles all programs
    assert np.isfinite(est).all()

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        est = unise.enhance_se(wav, rng=jax.random.PRNGKey(i))
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "unise_se_latency_10s_p50",
        "value": round(p50, 3),
        "unit": "seconds",
        "rtfx": round(10.0 / p50, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
