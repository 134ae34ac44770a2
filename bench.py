"""Headline benchmark: HCodec-1.0 encode+decode real-time factor per chip.

Runs the full tokenize -> detokenize pipeline (HuBERT-base feature frontend,
SEANet encoder, dual RVQ, ConvNeXt/ISTFT decoder) at reference model sizes on a
10 s 16 kHz mono wav (BASELINE config 1) and reports audio-seconds processed
per wall-second. North-star target is >=50x real time per chip
(BASELINE.json), so vs_baseline = RTFx / 50.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np

# serving sweet spot, measured (benchmarks/RESULTS.json engine_mixed_task):
# with the owner c14 kernel + int8 KV + int8 feature wire, 32 slots beats 16
# end-to-end on a healthy link (17,519 vs 15,636 median tok/s, round-5
# session-2 same-box captures) and ties it on a degraded one (8.6k vs 8.8k).
# Env-overridable for slot-sweep experiments.
ENGINE_SLOTS = int(os.environ.get("ENGINE_SLOTS", "32"))


def main():
    import jax

    # persistent compilation cache: warmed executables survive across
    # processes, so repeated bench runs skip the (remote) compile entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Watchdog on first device touch: a wedged relay hangs jax.devices()
    # forever at ~0% CPU (observed outages of 3+ hours — the driver's
    # bench run must FAIL, not stall the round). The touch runs in a
    # daemon thread; on timeout we report and hard-exit (the wedged
    # runtime cannot be interrupted from Python).
    import threading

    box: dict = {}

    def _touch():
        box["devices"] = jax.devices()

    th = threading.Thread(target=_touch, daemon=True)
    th.start()
    th.join(timeout=600.0)
    if "devices" not in box:
        print(json.dumps({
            "metric": "hcodec10_encode_decode_rtfx", "value": 0.0,
            "unit": "x_realtime_per_chip", "vs_baseline": 0.0,
            "platform": "unreachable",
            "error": "device touch hung >600 s (TPU relay wedged)",
        }), flush=True)
        os._exit(2)

    # fail LOUDLY on CPU fallback: a silently-CPU bench records a number
    # that proves nothing about the chip
    platform = jax.devices()[0].platform
    if platform == "cpu":
        raise SystemExit(
            "bench.py requires the TPU device; jax.devices() gave CPU "
            f"({jax.devices()}) — refusing to record a host-CPU number"
        )

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

    # STREAMED serving throughput: K single-wav round trips in flight with
    # an int16 PCM wire both ways. The synchronous headline above is
    # latency-shaped — at ~8.5 ms device time per 10 s wav it is dominated
    # by the ~25 ms tunnel RTT plus the 640 KB fp32 waveform fetch
    # (measured: benchmarks/probe_codec_bf16.py). A deployment streams
    # requests, so dispatches overlap and the RTT amortizes; int16 is
    # exact for 16-bit PCM sources and quarters the bytes. The timed
    # window includes the INPUT transfers too (bytes in + compute + bytes
    # out) — nothing rides for free. Same fp32 numerics as the headline.
    @jax.jit
    def _fused_i16(ssl_vars, codec_vars, w16):
        w = w16.astype(jnp.float32) / 32768.0
        padded = jnp.pad(w, [(0, 0), (160, 160)])
        from unified_audio_tpu.models.ssl.wav2vec2 import hubert_features

        feats = hubert_features(tok.ssl.apply(ssl_vars, padded))
        ac, sem = tok.codec.apply(codec_vars, w[..., None], feats,
                                  method="encode")
        out = tok.codec.apply(codec_vars, ac, sem, method="decode")
        return jnp.clip(jnp.rint(out * 32768.0), -32768, 32767
                        ).astype(jnp.int16)

    k_stream = 8
    host_rng = np.random.default_rng(1)
    wavs_i16 = [
        np.clip(host_rng.standard_normal((1, int(seconds * sr))) * 8192,
                -32768, 32767).astype(np.int16)
        for _ in range(k_stream)
    ]
    _ = np.asarray(_fused_i16(tok.ssl_variables, tok.codec_variables,
                              jnp.asarray(wavs_i16[0])))  # compile
    stream_times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [_fused_i16(tok.ssl_variables, tok.codec_variables,
                           jnp.asarray(w)) for w in wavs_i16]
        jax.device_get(outs)  # one batched fetch barrier for the window
        stream_times.append(time.perf_counter() - t0)
    rtfx_streamed = k_stream * seconds / sorted(stream_times)[1]

    # secondary headline: UniSE AR generation tokens/sec (bf16, batch 16) —
    # the BASELINE north star's second number (>=5x reference tokens/s)
    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.lm.sft import LLMSFT
    from unified_audio_tpu.utils.initialization import init_on_cpu
    from unified_audio_tpu.utils.precision import bf16_params

    lm_cfg = LlamaConfig()
    sft = LLMSFT(lm_cfg, num_tasks=3, feats_dim=768)
    sft_params = bf16_params(init_on_cpu(lambda: sft.init(
        jax.random.PRNGKey(0), 0, None,
        np.zeros((1, 250, 768), np.float32),
        np.zeros((1, 32), np.int32), np.zeros((1, 250), np.int32),
    )))

    @jax.jit
    def generate(params, mix_feats, rng):
        return sft.apply(params, 0, None, mix_feats, rng, method="generate",
                         semantic_length=250)

    b = 16
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 250, 768)),
        dtype=jnp.bfloat16,
    )
    _ = np.asarray(generate(sft_params, feats, jax.random.PRNGKey(0))[1])
    lm_times = []
    for i in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(generate(sft_params, feats, jax.random.PRNGKey(i))[1])
        lm_times.append(time.perf_counter() - t0)
    lm_dt = sorted(lm_times)[len(lm_times) // 2]
    unise_tok_s = b * (33 + 250) / lm_dt

    # serving headline: sustained mixed-task tokens/s through the paged
    # continuous-batching engine. Config = the fastest parity-pinned one:
    # the engine's TPU-default ownership-aware kernel (owner c14, block-
    # diagonal heads — DMA-bound, benchmarks/RESULTS.json paged_step_owner_r5)
    # over an int8 KV pool (halves streamed KV bytes: 0.533 vs 0.768 ms
    # attention at 16 slots full; greedy parity vs the XLA int8 path is
    # pinned by tests/test_engine.py::test_owner_int8_pool_engine_equals_xla).
    # 128 mixed SE/TSE/rTSE requests.
    from unified_audio_tpu.serve.engine import (ContinuousBatchingEngine,
                                                Request)

    num_slots, num_requests = ENGINE_SLOTS, 128
    bench_kv = os.environ.get("BENCH_KV", "int8")  # "bf16" = A/B control
    # int8 feature wire (fused dequant, ~41 dB feature SNR, pinned by
    # tests/test_engine.py::TestInt8FeatsWire): halves the per-wave staging
    # transfer (6.1 -> 3 MB at 16 slots) — the transfer the relay's
    # delivery-serialization failure mode exposes when the first decode
    # chunk can no longer hide it (measured 8.2k vs 15.6k tok/s same-day
    # at identical dispatch RTT).
    bench_wire = os.environ.get("BENCH_WIRE", "int8")  # "bf16" = control
    eng = ContinuousBatchingEngine(
        sft, sft_params, num_slots=num_slots, block_size=64,
        max_global=32, max_semantic=256, mix_buckets=(256,),
        kv_quant="int8" if (platform == "tpu" and bench_kv == "int8")
        else None,
        feats_wire=("int8" if (platform == "tpu" and bench_wire == "int8")
                    else "bf16"),
    )
    erng = np.random.default_rng(0)

    def make_request(uid):
        task = uid % 3
        return Request(
            task_id=task,
            mix_feats=erng.standard_normal((250, 768)).astype(np.float32),
            enroll_feats=(erng.standard_normal((250, 768)).astype(np.float32)
                          if task != 0 else None),
            global_length=32, semantic_length=250, uid=uid,
        )

    # the engine phase is HOST-time-sensitive (CLAUDE.md: 12.2k -> 3.9k
    # tok/s measured under pytest contention); bid for scheduler priority
    try:
        os.nice(-10)
    except OSError:
        pass

    # host-contention self-diagnostic: a fixed numpy workload shaped like
    # the engine's per-wave staging work (bf16 cast of a wave buffer).
    # Idle-box calibration on this machine: ~45-75 ms. A multiple of that
    # means the captured engine number ran on a contended host and
    # understates the engine (docs/PERFORMANCE.md, run-to-run variance).
    def host_spin_ms():
        src = np.random.default_rng(0).standard_normal(
            (128, 250, 768)).astype(np.float32)
        t0 = time.perf_counter()
        _sink = src.astype(jnp.bfloat16)  # ml_dtypes-backed numpy cast
        _sink = _sink.copy()
        return (time.perf_counter() - t0) * 1e3

    spin_before = host_spin_ms()

    # link-health diagnostic: median round trip of a tiny dispatch+fetch.
    # ~25-30 ms on a healthy relay; an inflated value (with low host spin
    # and a normal device ceiling) marks a DEGRADED LINK capture — the
    # engine's decode chunks then serialize on dispatch delivery and
    # sustained throughput collapses with no host or device cause
    # (observed: 12.7k -> 4.0k tok/s between two idle-box runs an hour
    # apart; slope-measured device step identical in both).
    tiny = jnp.zeros((8,), jnp.float32)
    tick = jax.jit(lambda x: x + 1.0)
    np.asarray(tick(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(tick(tiny))
        rtts.append((time.perf_counter() - t0) * 1e3)
    dispatch_rtt_ms = sorted(rtts)[2]

    # warmup: 2 waves + a straggler so the displacing-insert and batched
    # stash-drain programs compile here, not inside measured pass 1
    eng.run([make_request(100_000 + i) for i in range(2 * num_slots + 1)],
            jax.random.PRNGKey(1))

    # 3 measured passes, report best AND median: a single-pass capture on a
    # contended driver box recorded 2,694 tok/s for a 12.2k engine in round
    # 3 (BENCH_r03) — best-of-3 with the spin diagnostic makes a contended
    # capture self-diagnosing instead of silently wrong.
    pass_tok_s = []
    for p in range(3):
        reqs = [make_request(1000 * (p + 1) + i) for i in range(num_requests)]
        t0 = time.perf_counter()
        results = eng.run(reqs, jax.random.PRNGKey(2 + p))
        eng_dt = time.perf_counter() - t0
        assert len(results) == num_requests
        pass_tok_s.append(num_requests * (33 + 250) / eng_dt)
    engine_tok_s = max(pass_tok_s)
    engine_tok_s_median = sorted(pass_tok_s)[1]
    spin_after = host_spin_ms()

    # device-step ceiling via the slope method (CLAUDE.md measuring notes):
    # the n=256 / n=16 step programs are already compiled from the run's
    # pow2 decomposition; the difference cancels the dispatch+fetch RTT.
    run_nb = eng.stats()["last_nb"]  # the bound the run's programs compiled
    # at — after the final release the allocator high water DROPS and a
    # fresh (n, nb) pairing would remote-compile inside the timing

    def timed_step(n):
        t0 = time.perf_counter()
        eng.step(n=n, nb=run_nb)
        np.asarray(eng.state["global_len"])  # fetch barrier (tiny)
        return time.perf_counter() - t0

    timed_step(16)  # absorb any straggling async work
    step_ms = max((timed_step(256) - timed_step(16)) / 240.0 * 1e3, 1e-6)
    ceiling_tok_s = num_slots * 1e3 / step_ms

    print(json.dumps({
        "metric": "hcodec10_encode_decode_rtfx",
        "value": round(rtfx, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtfx / 50.0, 3),
        "platform": platform,
        "extra": {
            "hcodec10_rtfx_streamed_i16": round(rtfx_streamed, 2),
            "unise_ar_tokens_per_sec_b16_bf16": round(unise_tok_s, 1),
            "engine_sustained_tokens_per_sec": round(engine_tok_s, 1),
            "engine_sustained_median": round(engine_tok_s_median, 1),
            "engine_passes": [round(x, 1) for x in pass_tok_s],
            "engine_device_ceiling_tok_s": round(ceiling_tok_s, 1),
            "engine_pct_of_ceiling": round(
                100.0 * engine_tok_s / ceiling_tok_s, 1),
            "host_spin_ms": [round(spin_before, 1), round(spin_after, 1)],
            "dispatch_rtt_ms": round(dispatch_rtt_ms, 1),
            "engine_slots": num_slots,
            "engine_requests": num_requests,
            "engine_kv": eng.kv_quant or "bf16",
            "engine_feats_wire": eng.feats_wire,
        },
    }))


if __name__ == "__main__":
    main()
