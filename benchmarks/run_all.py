"""Run every benchmark and write benchmarks/RESULTS.json.

Usage: python benchmarks/run_all.py  (runs on whatever platform JAX selects;
the driver's bench.py remains the single-line headline metric.)
"""
import json
import subprocess
import sys
from pathlib import Path

BENCHES = [
    ("hcodec10_roundtrip", [sys.executable, "bench.py"]),
    ("unise_ar_decode", [sys.executable, "benchmarks/bench_unise.py"]),
    ("unise_se_latency", [sys.executable, "benchmarks/bench_se_latency.py"]),
    ("hcodec20_batched", [sys.executable, "benchmarks/bench_hcodec20.py"]),
    ("engine_mixed_task", [sys.executable, "benchmarks/bench_engine.py",
                           "16", "128"]),
    ("paged_step_device", [sys.executable, "benchmarks/bench_paged_step.py"]),
    ("sft_train_step", [sys.executable, "benchmarks/bench_train_step.py"]),
    ("codec_gan_train_step",
     [sys.executable, "benchmarks/bench_codec_gan_step.py"]),
]


def main():
    root = Path(__file__).resolve().parents[1]
    results = {}
    for name, cmd in BENCHES:
        print(f"== {name} ==", flush=True)
        proc = subprocess.run(cmd, cwd=root, capture_output=True, text=True,
                              timeout=3600)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        results[name] = [json.loads(l) for l in lines]
        print(proc.stdout, flush=True)
        if proc.returncode != 0:
            results[name].append({"error": proc.stderr[-500:]})
    out = root / "benchmarks" / "RESULTS.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
