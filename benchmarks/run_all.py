"""Run every benchmark and write benchmarks/RESULTS.json.

Usage: python benchmarks/run_all.py  (runs on whatever platform JAX selects;
the driver's bench.py remains the single-line headline metric.)

On the tunnel-attached chip, two TPU processes too close together wedge the
relay at first device touch (CLAUDE.md environment gotcha #1 — a process
starting ~1 min after the previous CLEAN exit has wedged) — hence the
mandatory quiet gap between benches.
"""
import json
import subprocess
import sys
import time
from pathlib import Path

GAP_S = 130  # quiet time between TPU processes (see module docstring)

BENCHES = [
    ("hcodec10_roundtrip", [sys.executable, "bench.py"]),
    ("unise_ar_decode", [sys.executable, "benchmarks/bench_unise.py"]),
    ("unise_se_latency", [sys.executable, "benchmarks/bench_se_latency.py"]),
    ("hcodec20_batched", [sys.executable, "benchmarks/bench_hcodec20.py"]),
    ("engine_mixed_task", [sys.executable, "benchmarks/bench_engine.py",
                           "16", "128"]),
    ("unitok_engine", [sys.executable,
                       "benchmarks/bench_unitok_engine.py", "8,16,32", "64"]),
    ("shared_pool", [sys.executable, "benchmarks/bench_shared_pool.py"]),
    ("paged_step_device", [sys.executable, "benchmarks/bench_paged_step.py"]),
    ("sft_train_step", [sys.executable, "benchmarks/bench_train_step.py"]),
    ("codec_gan_train_step",
     [sys.executable, "benchmarks/bench_codec_gan_step.py"]),
]


def main(only=None):
    """MERGES into RESULTS.json (a full overwrite would drop the curated
    analysis entries — paged_step_owner*, engine notes — that the scripted
    benches don't regenerate). `only`: optional iterable of bench names."""
    root = Path(__file__).resolve().parents[1]
    out = root / "benchmarks" / "RESULTS.json"
    results = json.loads(out.read_text()) if out.exists() else {}
    first = True
    for name, cmd in BENCHES:
        if only and name not in only:
            continue
        if not first:
            time.sleep(GAP_S)
        first = False
        print(f"== {name} ==", flush=True)
        proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                              timeout=3600)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        entries = [json.loads(l) for l in lines]
        print(proc.stdout, flush=True)
        if proc.returncode != 0:
            entries.append({"error": proc.stderr[-500:]})
        results[name] = entries
        out.write_text(json.dumps(results, indent=2))  # persist per bench
    print(f"wrote {out}")


if __name__ == "__main__":
    main(only=set(sys.argv[1:]) or None)
