"""Probe: is the engine's admission wave transfer-bound on the tunnel?

Measures (1) host->device put bandwidth at wave-staging sizes (slope
method over two sizes so fixed dispatch RTT cancels), (2) whether a
device_put overlaps with already-dispatched device compute (the run()
scheduler's prestage-during-decode assumption), (3) the same with the
put issued from a worker thread.

All completion barriers are fetch-based (np.asarray) — block_until_ready
returns early on this backend (CLAUDE.md).
"""
import sys as _sys
import threading
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
    except Exception:
        pass
    dev = jax.devices()[0]
    print(json.dumps({"platform": dev.platform}), flush=True)

    # --- 1. put bandwidth, slope method -------------------------------
    feats_dim = 768
    small = np.zeros((2, 256, feats_dim), np.float16)    # 0.75 MB
    big = np.zeros((64, 256, feats_dim), np.float16)     # 24 MB
    consume = jax.jit(lambda x: jnp.float32(x.ravel()[0] + x.ravel()[-1]))

    def timed_put(arr, n=4):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            ref = jax.device_put(arr, dev)
            np.asarray(consume(ref))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    timed_put(small, n=2)  # warm the consume compile
    t_small = timed_put(small)
    t_big = timed_put(big)
    d_bytes = big.nbytes - small.nbytes
    bw = d_bytes / (t_big - t_small) / 1e6
    print(json.dumps({
        "put_small_ms": round(t_small * 1e3, 1),
        "put_big_ms": round(t_big * 1e3, 1),
        "put_bw_mb_s": round(bw, 1),
    }), flush=True)

    # --- 2. does device_put overlap dispatched compute? ----------------
    # a carry-dependent matmul chain ~hundreds of ms of device time
    w = jax.device_put(
        np.random.default_rng(0).standard_normal((2048, 2048)).astype(
            np.float32) * 0.01, dev)

    import functools

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def burn(w, n_steps):
        def body(c, _):
            c = jnp.tanh(c @ w)
            return c, None
        c, _ = jax.lax.scan(body, w, None, length=n_steps)
        return c[0, 0]

    for n in (8, 72):
        np.asarray(burn(w, n))  # warm both program shapes

    def timed_burn(n, put_arr=None, threaded=False):
        t0 = time.perf_counter()
        out = burn(w, n)  # async dispatch
        tp = None
        if put_arr is not None:
            t1 = time.perf_counter()
            if threaded:
                box = {}

                def _p():
                    box["ref"] = jax.device_put(put_arr, dev)

                th = threading.Thread(target=_p)
                th.start()
                th.join()
                ref = box["ref"]
            else:
                ref = jax.device_put(put_arr, dev)
            tp = time.perf_counter() - t1
            np.asarray(consume(ref))
        np.asarray(out)
        return time.perf_counter() - t0, tp

    # slope: 8 vs 72 steps isolates device time from RTT
    t8, _ = min(timed_burn(8) for _ in range(3))
    t72, _ = min(timed_burn(72) for _ in range(3))
    dev_ms_per_step = (t72 - t8) / 64 * 1e3
    burn_n = max(8, int(0.35 / max(dev_ms_per_step, 1e-4) * 1e3))
    burn_n = min(burn_n, 512)
    np.asarray(burn(w, burn_n))  # warm this shape
    t_alone, _ = min(timed_burn(burn_n) for _ in range(3))
    t_with_put, put_inline = min(
        timed_burn(burn_n, put_arr=big) for _ in range(3))
    t_with_tput, put_thread = min(
        timed_burn(burn_n, put_arr=big, threaded=True) for _ in range(3))
    print(json.dumps({
        "burn_steps": burn_n,
        "burn_ms_per_step_device": round(dev_ms_per_step, 3),
        "burn_alone_ms": round(t_alone * 1e3, 1),
        "burn_plus_put_ms": round(t_with_put * 1e3, 1),
        "inline_put_call_ms": round(put_inline * 1e3, 1),
        "burn_plus_threaded_put_ms": round(t_with_tput * 1e3, 1),
        "threaded_put_call_ms": round(put_thread * 1e3, 1),
        "put_overlaps_compute": bool(
            t_with_put < t_alone + (t_big - t_small) * 0.5),
    }), flush=True)


if __name__ == "__main__":
    main()
