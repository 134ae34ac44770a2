"""Does the tunnel overlap host->device transfers with device compute?

The engine's profiled wave phases (decode-wait / staging / admission /
harvest) are additive at 16 slots (docs/PERFORMANCE.md) even though run()
issues the staging transfers right after dispatching decode chunks. This
probe isolates the question:

  A. compute alone   — a carry-dependent matmul lax.scan sized ~0.5 s of
                       device time, fetch-barriered (np.asarray).
  B. transfer alone  — device_put of a ~24 MB host buffer, barriered by
                       fetching one element back.
  C. both            — dispatch A, immediately issue B, barrier both.

If wall(C) ~= max(A, B): transfers ride a separate channel and the engine
should push staging harder during decode. If wall(C) ~= A + B: the link
serializes, and the only staging lever is fewer bytes (wav wire / int8
features) or fewer round trips.

Also probes D: the same transfer issued from a SECOND Python thread while
the main thread dispatches compute — some clients serialize per-thread.
"""
import sys as _sys
import threading
import time
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json

import numpy as np


def main(mb: int = 24, steps: int = 48):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    dev = jax.devices()[0]
    print(json.dumps({"stage": "devices", "platform": dev.platform}),
          flush=True)

    n = 2048

    @jax.jit
    def burn(x, w):
        def body(c, _):
            c = jnp.tanh(c @ w)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=steps)
        return c

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n, n), np.float32).astype(np.bfloat16))
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n, n), np.float32).astype(np.bfloat16))

    host = np.random.default_rng(2).standard_normal(
        (mb * 1024 * 1024 // 2,)).astype(np.float16)

    def barrier_transfer(arr):
        # force completion: fetch one element back
        return float(np.asarray(arr[-1]))

    # warmup / compile
    np.asarray(burn(x, w)[0, 0])
    barrier_transfer(jnp.asarray(host[:1024]))

    def t_compute():
        t0 = time.perf_counter()
        out = burn(x, w)
        np.asarray(out[0, 0])
        return time.perf_counter() - t0

    def t_transfer():
        t0 = time.perf_counter()
        a = jnp.asarray(host)
        barrier_transfer(a)
        return time.perf_counter() - t0

    a_times = [t_compute() for _ in range(3)]
    b_times = [t_transfer() for _ in range(3)]

    def t_both():
        t0 = time.perf_counter()
        out = burn(x, w)          # dispatched async
        a = jnp.asarray(host)     # issued while compute in flight
        barrier_transfer(a)
        t_xfer_done = time.perf_counter() - t0
        np.asarray(out[0, 0])
        return time.perf_counter() - t0, t_xfer_done

    c_times = [t_both() for _ in range(3)]

    def t_both_thread():
        res = {}

        def xfer():
            t0 = time.perf_counter()
            a = jnp.asarray(host)
            barrier_transfer(a)
            res["xfer"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = burn(x, w)
        th = threading.Thread(target=xfer)
        th.start()
        np.asarray(out[0, 0])
        t_main = time.perf_counter() - t0
        th.join()
        return max(t_main, res["xfer"]), res["xfer"]

    d_times = [t_both_thread() for _ in range(3)]

    rpt = {
        "compute_alone_s": round(min(a_times), 4),
        "transfer_alone_s": round(min(b_times), 4),
        "both_inline_s": round(min(t for t, _ in c_times), 4),
        "both_inline_xfer_done_s": round(min(tx for _, tx in c_times), 4),
        "both_thread_s": round(min(t for t, _ in d_times), 4),
        "both_thread_xfer_s": round(min(tx for _, tx in d_times), 4),
        "verdict_inline": None,
        "mb": mb,
    }
    tsum = rpt["compute_alone_s"] + rpt["transfer_alone_s"]
    tmax = max(rpt["compute_alone_s"], rpt["transfer_alone_s"])
    mid = (tsum + tmax) / 2
    rpt["verdict_inline"] = ("overlaps" if rpt["both_inline_s"] < mid
                             else "serializes")
    rpt["verdict_thread"] = ("overlaps" if rpt["both_thread_s"] < mid
                             else "serializes")
    print(json.dumps(rpt), flush=True)


if __name__ == "__main__":
    kw = {}
    if len(_sys.argv) > 1:
        kw["mb"] = int(_sys.argv[1])
    if len(_sys.argv) > 2:
        kw["steps"] = int(_sys.argv[2])
    main(**kw)
