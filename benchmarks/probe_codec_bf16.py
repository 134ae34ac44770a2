"""Phase-level device times for the HCodec-1.0 round trip, fp32 vs bf16.

Slope-method (CLAUDE.md): each phase runs inside a lax.scan whose input
depends on the carry (so XLA cannot hoist it), at two iteration counts;
the difference cancels dispatch RTT and the final fetch. Measures:

  features  HuBERT-base all-layer mean on 10 s (the SSL frontend)
  encode    SEANet + semantic encoder + dual RVQ (fp32 VQ distance islands)
  decode    RVQ lookup + ConvNeXt decoder + ISTFT head
  fused     the whole round trip as ONE program (what bench.py times)

plus the host wall-clock of the bench-style single dispatch at both dtypes
and with an int16 output wire (the waveform fetch at fp32 is ~640 KB on a
~70 MB/s link — a visible slice of single-request latency).
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

    from unified_audio_tpu.models.hcodec.codec import hcodec10_config
    from unified_audio_tpu.models.hcodec.tokenizer import HCodecTokenizer
    from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
    from unified_audio_tpu.models.ssl.wav2vec2 import hubert_features
    from unified_audio_tpu.utils.precision import bf16_params

    codec_cfg = hcodec10_config(quantize_dropout=False)
    tok = HCodecTokenizer.from_random(
        jax.random.PRNGKey(0), codec_cfg, ssl_mod.hubert_base_config())
    sr = codec_cfg.sample_rate
    seconds = 10.0
    n = int(seconds * sr)
    wav_f32 = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, n)), jnp.float32)

    ssl_v = {"f32": tok.ssl_variables, "bf16": bf16_params(tok.ssl_variables)}
    cod_v = {"f32": tok.codec_variables,
             "bf16": bf16_params(tok.codec_variables)}
    wav = {"f32": wav_f32, "bf16": wav_f32.astype(jnp.bfloat16)}

    def feats_fn(sv, w):
        return hubert_features(tok.ssl.apply(
            sv, jnp.pad(w, [(0, 0), (160, 160)])))

    def encode_fn(cv, w, f):
        return tok.codec.apply(cv, w[..., None], f, method="encode")

    def decode_fn(cv, ac, sem):
        return tok.codec.apply(cv, ac, sem, method="decode")

    # representative codes for the decode phase
    ac0, sem0 = jax.jit(encode_fn)(cod_v["f32"], wav["f32"],
                                   jax.jit(feats_fn)(ssl_v["f32"],
                                                     wav["f32"]))

    def slope(jitted, args, perturb, n1=2, n2=8):
        """Device ms/iter of jitted(*args) via carry-dependent scan."""
        import jax

        def loop(k):
            @jax.jit
            def run(*a):
                def body(c, _):
                    out = jitted(*perturb(a, c))
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return leaf.ravel()[0].astype(jnp.float32), None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
                return c
            return run
        r1, r2 = loop(n1), loop(n2)
        np.asarray(r1(*args)), np.asarray(r2(*args))  # compile both
        ts = []
        for r, k in ((r1, n1), (r2, n2)):
            t0 = time.perf_counter()
            np.asarray(r(*args))
            ts.append(time.perf_counter() - t0)
        return (ts[1] - ts[0]) / (n2 - n1) * 1e3

    for d in ("f32", "bf16"):
        def p_wav(a, c):
            return (a[0], a[1] + c.astype(a[1].dtype) * 1e-9) + a[2:]

        t_feat = slope(feats_fn, (ssl_v[d], wav[d]), p_wav)
        log(phase="features", dtype=d, ms=round(t_feat, 3))
        f = jax.jit(feats_fn)(ssl_v[d], wav[d])
        t_enc = slope(encode_fn, (cod_v[d], wav[d], f), p_wav)
        log(phase="encode", dtype=d, ms=round(t_enc, 3))

        def p_codes(a, c):
            # runtime-zero but compile-time-opaque carry dependence (c*0
            # would constant-fold and let XLA hoist the body)
            dep = jnp.minimum(jnp.abs(c), 0.0).astype(jnp.int32)
            return (a[0], a[1] + dep, a[2])

        t_dec = slope(decode_fn, (cod_v[d], ac0, sem0), p_codes)
        log(phase="decode", dtype=d, ms=round(t_dec, 3))

        def fused(sv, cv, w):
            f = feats_fn(sv, w)
            ac, sem = encode_fn(cv, w, f)
            return decode_fn(cv, ac, sem)

        def p_wav3(a, c):
            return (a[0], a[1], a[2] + c.astype(a[2].dtype) * 1e-9)

        t_fused = slope(fused, (ssl_v[d], cod_v[d], wav[d]), p_wav3)
        log(phase="fused", dtype=d, ms=round(t_fused, 3),
            sum_ms=round(t_feat + t_enc + t_dec, 3))

        # bench-style single dispatch wall clock (includes RTT + fetch)
        for wire in ("f32", "i16"):
            @jax.jit
            def single(sv, cv, w):
                out = fused(sv, cv, w)
                if wire == "i16":
                    out = jnp.clip(jnp.rint(out.astype(jnp.float32)
                                            * 32768.0), -32768, 32767
                                   ).astype(jnp.int16)
                return out
            np.asarray(single(ssl_v[d], cod_v[d], wav[d]))
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                np.asarray(single(ssl_v[d], cod_v[d], wav[d]))
                ts.append(time.perf_counter() - t0)
            ms = sorted(ts)[len(ts) // 2] * 1e3
            log(phase="single_dispatch", dtype=d, wire=wire,
                ms=round(ms, 2), rtfx=round(seconds * 1e3 / ms, 1))


if __name__ == "__main__":
    main()
