"""Minimal relay-health probe: measures dispatch RTT and pipelining on the
tunnel-attached chip in ~1 min, so throughput re-captures can be scheduled
for healthy-link windows (CLAUDE.md: relay mood varies on ~hour timescales;
a degraded relay serializes deliveries at ~50 ms each vs healthy ~25).

Prints one JSON line: {"rtt_ms": per-dispatch round trip (tiny op + fetch),
"pipelined_ms": per-dispatch wall when 8 dispatches are enqueued before one
fetch (healthy link: << rtt_ms — enqueues overlap), "verdict": ...}.

Safe to run between benches (observes the >=2 min spacing rule like any
TPU process; the probe itself is one process).
"""
import json
import sys
import threading
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    box = {}
    th = threading.Thread(target=lambda: box.setdefault("d", jax.devices()),
                          daemon=True)
    th.start()
    th.join(timeout=300)
    if "d" not in box:
        print(json.dumps({"error": "device touch hung"}), flush=True)
        sys.exit(2)

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.float32)
    for _ in range(3):
        x = f(x)
    np.asarray(x)  # fetch barrier (block_until_ready lies on axon)

    # sequential dispatch+fetch: full round trip per step
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        np.asarray(x)
    rtt = (time.perf_counter() - t0) / n * 1e3

    # pipelined: 8 enqueues then one fetch — healthy relay overlaps these
    t0 = time.perf_counter()
    for _ in range(n):
        for _ in range(8):
            x = f(x)
        np.asarray(x)
    pipelined = (time.perf_counter() - t0) / (n * 8) * 1e3

    healthy = rtt < 35.0 and pipelined < 0.5 * rtt
    print(json.dumps({
        "rtt_ms": round(rtt, 1),
        "pipelined_ms": round(pipelined, 1),
        "verdict": "healthy" if healthy else "degraded",
    }), flush=True)


if __name__ == "__main__":
    main()
