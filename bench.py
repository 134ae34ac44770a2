"""Headline benchmark: HCodec-1.0 encode+decode real-time factor per chip.

Runs the full tokenize -> detokenize pipeline (HuBERT-base feature frontend,
SEANet encoder, dual RVQ, ConvNeXt/ISTFT decoder) at reference model sizes on a
10 s 16 kHz mono wav (BASELINE config 1) and reports audio-seconds processed
per wall-second. North-star target is >=50x real time per chip
(BASELINE.json), so vs_baseline = RTFx / 50.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def main():
    import jax

    # persistent compilation cache: warmed executables survive across
    # processes, so repeated bench runs skip the (remote) compile entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from unified_audio_tpu.models.hcodec.codec import hcodec10_config
    from unified_audio_tpu.models.hcodec.tokenizer import HCodecTokenizer
    from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod

    # full-size models, random weights (throughput is weight-independent);
    # kmeans_init off so codebooks are non-degenerate at init
    codec_cfg = hcodec10_config(quantize_dropout=False)
    tok = HCodecTokenizer.from_random(
        jax.random.PRNGKey(0), codec_cfg, ssl_mod.hubert_base_config()
    )

    seconds = 10.0
    sr = codec_cfg.sample_rate
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, int(seconds * sr))),
        dtype=jnp.float32,
    )

    # ONE fused program for the whole round trip (features + encode + RVQ +
    # decode): a single dispatch instead of three, letting XLA overlap and
    # fuse across stage boundaries
    @jax.jit
    def _fused(ssl_vars, codec_vars, w):
        padded = jnp.pad(w, [(0, 0), (160, 160)])
        from unified_audio_tpu.models.ssl.wav2vec2 import hubert_features

        feats = hubert_features(tok.ssl.apply(ssl_vars, padded))
        ac, sem = tok.codec.apply(codec_vars, w[..., None], feats,
                                  method="encode")
        return tok.codec.apply(codec_vars, ac, sem, method="decode")

    def roundtrip(w):
        return _fused(tok.ssl_variables, tok.codec_variables, w)

    # warmup / compile; force full host materialization — on the experimental
    # axon backend block_until_ready returns before execution finishes, so a
    # device->host fetch is the only honest completion barrier
    out = np.asarray(roundtrip(wav))

    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = np.asarray(roundtrip(wav))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]

    rtfx = seconds / dt
    print(json.dumps({
        "metric": "hcodec10_encode_decode_rtfx",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
