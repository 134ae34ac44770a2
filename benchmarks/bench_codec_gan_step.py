"""Full-size HCodec-1.0 codec-GAN train step on the real chip.

The reference ships only the config for this loop (HCodec-1.0
conf/config.yaml:49-109); the framework implements it
(train/codec_trainer.py). This measures the heavy regime — generator step
(mel/commit/semantic + adversarial + feature-matching) PLUS discriminator
step — at full model size, batch 8 x 3 s @ 16 kHz.

Times the raw jitted _gen_step/_disc_step pair (the CLI loop's device work)
over two loop lengths and reports the slope, with np.asarray as the
completion barrier (block_until_ready returns early on this backend,
CLAUDE.md #2).
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def main(batch: int = 8, seconds: float = 3.0):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.hcodec.codec import hcodec10_config
    from unified_audio_tpu.train.codec_trainer import (CodecGANTrainer,
                                                       CodecTrainConfig)
    from unified_audio_tpu.utils.initialization import init_on_cpu

    cfg = hcodec10_config(quantize_dropout=False)
    t = int(seconds * cfg.sample_rate)
    feat_frames = t * 50 // cfg.sample_rate
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, t)), jnp.float32)
    feat = jnp.asarray(
        rng.standard_normal((batch, feat_frames, cfg.feat_dim)), jnp.float32)

    # adversarial ON from step 0 (perceptual_start_step=0): the steady-state
    # cost past the reference's 400k warmup is gen + disc together
    print(json.dumps({"stage": "init"}), flush=True)
    trainer = CodecGANTrainer(
        cfg, CodecTrainConfig(perceptual_start_step=0),
        rng=init_on_cpu(lambda: jax.random.PRNGKey(0)),
        example_batch=(np.zeros((batch, t), np.float32),
                       np.zeros((batch, feat_frames, cfg.feat_dim),
                                np.float32)),
    )

    def run(n):
        # gen_vars/opt states are DONATED by the jitted steps: thread the
        # returned pytrees back so the next run never touches dead buffers
        gv, go = trainer.gen_vars, trainer.gen_opt_state
        dp, do = trainer.disc_params, trainer.disc_opt_state
        g_loss = d_loss = None
        for i in range(n):
            k = jax.random.PRNGKey(i)
            gv, go, g_loss, metrics, recon = trainer._gen_step(
                gv, go, dp, wav, feat, k, True)
            dp, do, d_loss = trainer._disc_step(dp, do, wav, recon)
        trainer.gen_vars, trainer.gen_opt_state = gv, go
        trainer.disc_params, trainer.disc_opt_state = dp, do
        return np.asarray(g_loss), np.asarray(d_loss)

    print(json.dumps({"stage": "warmup"}), flush=True)
    g0, d0 = run(1)  # compile
    n1, n2 = 2, 6
    walls = {}
    for n in (n1, n2):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        walls[n] = best
    dt = (walls[n2] - walls[n1]) / (n2 - n1)
    print(json.dumps({
        "metric": "codec_gan_train_step",
        "model": "hcodec10_full",
        "batch": batch,
        "segment_s": seconds,
        "adversarial": True,
        "ms_per_step_device": round(dt * 1e3, 1),
        "audio_sec_per_sec": round(batch * seconds / dt, 1),
        "gen_loss0": round(float(g0), 4),
        "disc_loss0": round(float(d0), 4),
    }), flush=True)


if __name__ == "__main__":
    import sys

    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
