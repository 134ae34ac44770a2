"""SFT training-step throughput on the real chip: the full UniSE step
(frozen BiCodec tokenize + XLSR + WavLM features, LM forward/backward,
AdamW) at reference sizes — the reference publishes no training throughput
(SURVEY §6), so this records ours.

Each train_step call syncs on the scalar loss (float()), so the wall clock
is honest per step; steady-state steps/s is reported after a warmup step
compiles the program.
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import sys
import time

import numpy as np


def main(batch: int = 8, steps: int = 8):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if jax.devices()[0].platform == "cpu":
        raise SystemExit("bench_train_step requires the TPU device")

    from unified_audio_tpu.cli import _build_unise
    from unified_audio_tpu.train.optim import make_optimizer
    from unified_audio_tpu.train.sft_trainer import SFTTrainer

    unise = _build_unise()
    trainer = SFTTrainer(unise, optimizer=make_optimizer())

    rng = np.random.default_rng(0)
    seg = unise.config.segment_len  # 5 s @ 16 kHz
    mix = rng.standard_normal((batch, seg)).astype(np.float32) * 0.1
    target = rng.standard_normal((batch, seg)).astype(np.float32) * 0.1

    # compile + warm every (task, enroll-ness) jit signature the loop hits
    trainer.train_step("se", None, mix, target)
    trainer.train_step("tse", mix, mix, target)
    trainer.train_step("rtse", mix, mix, target)
    t0 = time.perf_counter()
    for i in range(steps):
        task = ("se", "tse", "rtse")[i % 3]
        enroll = mix if task != "se" else None
        loss, acc = trainer.train_step(task, enroll, mix, target)
        assert np.isfinite(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "unise_sft_train_step",
        "batch": batch,
        "steps_per_sec": round(steps / dt, 3),
        "audio_train_sec_per_sec": round(steps * batch * 5.0 / dt, 1),
        "ms_per_step": round(dt / steps * 1e3, 1),
        "last_loss": round(float(loss), 4),
    }), flush=True)


if __name__ == "__main__":
    kw = {}
    if len(sys.argv) > 1:
        kw["batch"] = int(sys.argv[1])
    if len(sys.argv) > 2:
        kw["steps"] = int(sys.argv[2])
    main(**kw)
