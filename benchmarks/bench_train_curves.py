"""Full-size training CURVES on the real chip (VERDICT r4 #7).

The step-time benches (bench_train_step.py, bench_codec_gan_step.py) prove
the full-size trainers STEP fast; this run proves they LEARN at full size:
a few hundred steps of (a) the UniSE SFT loop and (b) the HCodec-1.0 GAN
loop over a small fixed pool of SIMULATED data (data/simulation.py — the
reference's own degradation recipe, simulate.py), with per-step metrics
persisted to benchmarks/curves/*.jsonl via utils.logging.MetricsLogger and
first/last losses printed as JSON for RESULTS.json.

A small fixed dataset is deliberate: cycling it makes learning progress
(memorization) unambiguous in a few hundred steps, which is the claim under
test — the full-size graph trains end to end on chip, losses move, nothing
NaNs. Speech-like signals are synthesized host-side (harmonic stacks with
AM envelopes); the GAN's semantic-distillation target uses fixed random
features per sample (a consistent learnable target — real HuBERT feats just
change the target function, not the trainability claim).
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import os
import threading
import time

import numpy as np

CURVES_DIR = _Path(__file__).parent / "curves"


def log(**kw):
    print(json.dumps(kw), flush=True)


def synth_speech(rng, n, t, fs=16000):
    """Speech-like batch (n, t): harmonic stack, random f0 walk, AM
    envelope, noise floor."""
    out = np.zeros((n, t), np.float32)
    tt = np.arange(t) / fs
    for i in range(n):
        f0 = rng.uniform(90.0, 280.0)
        sig = np.zeros(t)
        for h in range(1, 6):
            sig += rng.uniform(0.2, 1.0) / h * np.sin(
                2 * np.pi * f0 * h * tt + rng.uniform(0, 2 * np.pi))
        env = 0.4 + 0.6 * np.abs(np.sin(
            2 * np.pi * rng.uniform(1.0, 4.0) * tt
            + rng.uniform(0, 2 * np.pi)))
        sig = sig * env + 0.01 * rng.standard_normal(t)
        out[i] = 0.1 * sig / (np.abs(sig).max() + 1e-6)
    return out


def run_unise(steps: int, batch: int):
    import jax

    from unified_audio_tpu.cli import _build_unise
    from unified_audio_tpu.data.simulation import simulate_data
    from unified_audio_tpu.train.optim import make_optimizer
    from unified_audio_tpu.train.sft_trainer import SFTTrainer
    from unified_audio_tpu.utils.logging import MetricsLogger

    log(stage="unise_build")
    unise = _build_unise()
    trainer = SFTTrainer(unise, optimizer=make_optimizer(warmup_steps=50))
    seg = unise.config.segment_len

    rng = np.random.default_rng(0)
    n_batches = 6
    clean = synth_speech(rng, n_batches * batch, seg)
    interf = synth_speech(rng, n_batches * batch, seg)
    noise = 0.05 * rng.standard_normal((n_batches * batch, seg)).astype(
        np.float32)
    batches = []
    for b in range(n_batches):
        task = ("se", "tse", "rtse")[b % 3]
        mixes, targets, enrolls = [], [], []
        for i in range(batch):
            j = b * batch + i
            noisy, sp, itf = simulate_data(
                task, clean[j][None], interf[j][None]
                if task != "se" else None, noise[j][None], None, 16000,
                rng=rng)
            mixes.append(noisy[0][:seg])
            targets.append((itf if task == "rtse" else sp)[0][:seg])
            enrolls.append(clean[j])  # stand-in enrollment of the speaker
        pad = lambda a: np.stack(  # noqa: E731
            [np.pad(x, (0, max(0, seg - len(x))))[:seg] for x in a]
        ).astype(np.float32)
        batches.append((task, pad(enrolls) if task != "se" else None,
                        pad(mixes), pad(targets)))

    log(stage="unise_warmup")
    for task, enroll, mix, target in batches[:3]:
        trainer.train_step(task, enroll, mix, target)

    first = last = None
    t0 = time.perf_counter()
    with MetricsLogger(str(CURVES_DIR / "unise_sft_metrics.jsonl")) as ml:
        for s in range(steps):
            task, enroll, mix, target = batches[s % n_batches]
            loss, acc = trainer.train_step(task, enroll, mix, target)
            assert np.isfinite(loss), (s, loss)
            ml.log(s, task=task, loss=round(loss, 5), acc=round(acc, 5))
            if first is None:
                first = (loss, acc)
            last = (loss, acc)
    wall = time.perf_counter() - t0
    rec = {
        "stage": "unise_sft_curve", "steps": steps, "batch": batch,
        "first_loss": round(first[0], 4), "last_loss": round(last[0], 4),
        "first_acc": round(first[1], 4), "last_acc": round(last[1], 4),
        "steps_per_sec": round(steps / wall, 3),
    }
    log(**rec)
    return rec


def run_codec_gan(steps: int, batch: int, seconds: float = 3.0):
    import jax
    import jax.numpy as jnp

    from unified_audio_tpu.models.hcodec.codec import hcodec10_config
    from unified_audio_tpu.train.codec_trainer import (CodecGANTrainer,
                                                       CodecTrainConfig)
    from unified_audio_tpu.utils.initialization import init_on_cpu
    from unified_audio_tpu.utils.logging import MetricsLogger

    log(stage="gan_build")
    cfg = hcodec10_config(quantize_dropout=False)
    t = int(seconds * cfg.sample_rate)
    feat_frames = t * 50 // cfg.sample_rate
    rng = np.random.default_rng(1)
    n_batches = 6
    wavs = [jnp.asarray(synth_speech(rng, batch, t)) for _ in range(n_batches)]
    feats = [jnp.asarray(rng.standard_normal(
        (batch, feat_frames, cfg.feat_dim)), jnp.float32)
        for _ in range(n_batches)]

    trainer = CodecGANTrainer(
        cfg, CodecTrainConfig(perceptual_start_step=0),
        rng=init_on_cpu(lambda: jax.random.PRNGKey(0)),
        example_batch=(np.zeros((batch, t), np.float32),
                       np.zeros((batch, feat_frames, cfg.feat_dim),
                                np.float32)),
    )

    log(stage="gan_warmup")
    trainer.train_step(wavs[0], feats[0], jax.random.PRNGKey(1))

    first = last = None
    t0 = time.perf_counter()
    with MetricsLogger(str(CURVES_DIR / "codec_gan_metrics.jsonl")) as ml:
        for s in range(steps):
            m = trainer.train_step(wavs[s % n_batches], feats[s % n_batches],
                                   jax.random.PRNGKey(100 + s))
            m = {k: float(v) for k, v in m.items()}
            assert all(np.isfinite(v) for v in m.values()), (s, m)
            ml.log(s, **{k: round(v, 5) for k, v in m.items()})
            if first is None:
                first = m
            last = m
    wall = time.perf_counter() - t0
    pick = [k for k in ("mel_loss", "gen_loss", "loss", "disc_loss")
            if k in first]
    rec = {"stage": "codec_gan_curve", "steps": steps, "batch": batch,
           "steps_per_sec": round(steps / wall, 3)}
    for k in pick:
        rec[f"first_{k}"] = round(first[k], 4)
        rec[f"last_{k}"] = round(last[k], 4)
    log(**rec)
    return rec


def main(steps: int = 300, batch: int = 8):
    try:
        os.nice(-10)
    except OSError:
        pass
    import jax

    if os.environ.get("CURVES_CPU"):
        # plumbing smoke (the axon sitecustomize overrides JAX_PLATFORMS,
        # so this must be the config key — CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
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
    CURVES_DIR.mkdir(exist_ok=True)

    u = run_unise(steps, batch)
    g = run_codec_gan(steps, batch)
    log(stage="done", unise=u, gan=g)


if __name__ == "__main__":
    main(*map(int, _sys.argv[1:3]))
