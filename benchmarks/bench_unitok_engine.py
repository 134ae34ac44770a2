"""UniTok delay-pattern engine throughput on the real chip: mixed-task
requests (SR/TSE/.../CODEC/AE differ only in the task-embedding row) decode
K codebook streams per step through the shared paged block pool.

Full UniTok size (UniTokConfig defaults: 512 hidden / 12 layers / K=8
codebooks = 2 streams x 4 RVQ layers). 5 s of audio at the 25 Hz H-Codec
frame rate = 125 decode steps emitting 125*K codes.
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def main(num_slots: int = 8, num_requests: int = 24, dtype: str = "bfloat16",
         poll_interval: int = 256, kv_quant: str = "", kernel: str = ""):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

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

    from unified_audio_tpu.models.unitok.model import UniTokConfig, UniTokLM
    from unified_audio_tpu.serve.unitok_engine import (UniTokEngine,
                                                       UniTokRequest)
    from unified_audio_tpu.utils.initialization import init_on_cpu

    cfg = UniTokConfig()
    lm = UniTokLM(cfg)
    params = init_on_cpu(lambda: lm.init(
        jax.random.PRNGKey(0), 0,
        np.zeros((1, 4, cfg.text_dim), np.float32),
        np.zeros((1, 4, cfg.audio_dim), np.float32),
        np.zeros((1, 4, cfg.audio_dim), np.float32),
        np.zeros((1, 6, cfg.num_codebooks), np.int32),
    ))

    # one process can sweep several slot counts (comma-separated argv[1]):
    # each config is its own engine over the same params — avoids paying
    # the one-TPU-process-at-a-time relay spacing per config (CLAUDE.md)
    slot_list = (num_slots if isinstance(num_slots, (list, tuple))
                 else [num_slots])
    for kern in (kernel.split(",") if kernel else [""]):
        for kv in (kv_quant.split(",") if kv_quant else [""]):
            for slots in slot_list:
                _run_config(jax, jnp, cfg, lm, params, int(slots),
                            num_requests, dtype, poll_interval, kv.strip(),
                            kern.strip())


def _run_config(jax, jnp, cfg, lm, params, num_slots, num_requests, dtype,
                poll_interval, kv_quant, kernel=""):
    from unified_audio_tpu.serve.unitok_engine import (UniTokEngine,
                                                       UniTokRequest)

    rng = np.random.default_rng(0)
    frames = 125  # 5 s at 25 Hz
    in_frames = 125

    def make_request(uid):
        # all tasks carry an input-audio segment; VC/LASS-style tasks add a
        # reference segment (same feature bucket -> same admission wave)
        task = uid % 7
        ref = (rng.standard_normal((in_frames, cfg.audio_dim)).astype(
            np.float32) if task in (1, 3, 4) else None)
        return UniTokRequest(
            task_id=task, num_frames=frames,
            input_feats=rng.standard_normal(
                (in_frames, cfg.audio_dim)).astype(np.float32),
            ref_feats=ref, do_sample=True, uid=uid,
        )

    eng = UniTokEngine(
        lm, params, num_slots=num_slots, block_size=64,
        max_frames=frames, feat_buckets=(128,),
        dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
        kv_quant=(kv_quant or None),
        use_flash_kernel=(kernel or None),
    )
    # warmup OVERSUBSCRIBES the pool (slots + a wave) so the displacing-
    # insert + stash-drain programs compile here, not in the timed run
    print(json.dumps({"stage": "warmup"}), flush=True)
    eng.run([make_request(10_000 + i) for i in range(num_slots + 4)],
            jax.random.PRNGKey(1), poll_interval=poll_interval)

    reqs = [make_request(i) for i in range(num_requests)]
    t0 = time.perf_counter()
    results = eng.run(reqs, jax.random.PRNGKey(2),
                      poll_interval=poll_interval)
    dt = time.perf_counter() - t0
    assert len(results) == num_requests
    codes = num_requests * frames * cfg.num_codebooks
    steps = num_requests * (frames + cfg.num_codebooks - 1)
    print(json.dumps({
        "metric": "unitok_engine_throughput",
        "num_slots": num_slots,
        "num_requests": num_requests,
        "num_codebooks": cfg.num_codebooks,
        "dtype": dtype,
        "kv": ("paged int8" if kv_quant else "paged bf16"),
        "kernel": eng.use_flash_kernel or "xla",
        "poll_interval": poll_interval,
        "codes_per_sec": round(codes / dt, 1),
        "steps_per_sec": round(steps / dt, 1),
        "requests_per_sec": round(num_requests / dt, 2),
        "audio_sec_per_sec": round(num_requests * 5.0 / dt, 2),
        "wall_s": round(dt, 2),
    }), flush=True)


if __name__ == "__main__":
    import sys

    kw = {}
    if len(sys.argv) > 1:
        kw["num_slots"] = [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 2:
        kw["num_requests"] = int(sys.argv[2])
    if len(sys.argv) > 3:
        kw["dtype"] = sys.argv[3]
    if len(sys.argv) > 4:
        kw["poll_interval"] = int(sys.argv[4])
    # "-" = empty placeholder (quoted "" does not survive nohup bash -c)
    if len(sys.argv) > 5 and sys.argv[5] != "-":
        kw["kv_quant"] = sys.argv[5]
    if len(sys.argv) > 6 and sys.argv[6] != "-":
        kw["kernel"] = sys.argv[6]
    main(**kw)
