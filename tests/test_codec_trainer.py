"""Codec GAN trainer tests on a tiny config."""
import numpy as np
import pytest
# whole-file slow tier: 413s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.models.hcodec.codec import hcodec10_config
from unified_audio_tpu.train.codec_trainer import CodecGANTrainer, CodecTrainConfig
from unified_audio_tpu.train.discriminators import (
    CodecDiscriminator, discriminator_loss, generator_adversarial_loss,
    multiscale_mel_loss,
)

from tests.test_hcodec import small10


class TestDiscriminators:
    def test_ensemble_shapes(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 4096, 1)).astype(np.float32))
        d = CodecDiscriminator(periods=(2, 3), stft_resolutions=((256, 64),))
        params = d.init(key, x)
        scores, feats = d.apply(params, x)
        assert len(scores) == 3
        assert all(s.ndim == 2 for s in scores)

    def test_losses(self, key, rng):
        x = jnp.asarray(rng.standard_normal((1, 2048, 1)).astype(np.float32))
        d = CodecDiscriminator(periods=(2,), stft_resolutions=((256, 64),))
        params = d.init(key, x)
        rs, _ = d.apply(params, x)
        fs, _ = d.apply(params, x * 0.5)
        assert np.isfinite(float(discriminator_loss(rs, fs)))
        assert np.isfinite(float(generator_adversarial_loss(fs)))

    def test_mel_loss_zero_for_identical(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
        assert float(multiscale_mel_loss(x, x)) == 0.0
        assert float(multiscale_mel_loss(x, x * 0.5)) > 0.0


class TestCodecGANTrainer:
    def test_training_steps(self, rng):
        cfg = small10()
        b, t = 2, 640 * 8
        wav = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.3)
        feat = jnp.asarray(
            rng.standard_normal((b, t // 320, cfg.feat_dim)).astype(np.float32)
        )
        tr = CodecGANTrainer(
            cfg,
            CodecTrainConfig(perceptual_start_step=1),
            rng=jax.random.PRNGKey(0),
            example_batch=(wav, feat),
        )
        m0 = tr.train_step(wav, feat, jax.random.PRNGKey(1))  # no adversarial
        assert m0["adv"] == 0.0 and np.isfinite(m0["gen_loss"])
        m1 = tr.train_step(wav, feat, jax.random.PRNGKey(2))  # with adversarial
        assert np.isfinite(m1["gen_loss"]) and np.isfinite(m1["disc_loss"])
        assert m1["adv"] != 0.0

    def test_overfits_single_batch(self, rng):
        """The GAN loop actually LEARNS: repeating one batch drives the
        generator's reconstruction (mel) loss down substantially — evidence
        the gradients, EMA codebooks, and optimizer plumbing are wired, not
        just finite."""
        cfg = small10()
        b, t = 2, 640 * 8
        tt = np.arange(t) / 16000.0
        wav = np.stack([np.sin(2 * np.pi * f * tt) for f in (220.0, 330.0)])
        wav = jnp.asarray(wav.astype(np.float32) * 0.5)
        feat = jnp.asarray(
            rng.standard_normal((b, t // 320, cfg.feat_dim)).astype(
                np.float32))
        tr = CodecGANTrainer(
            cfg,
            # pure reconstruction regime: adversarial path off so the
            # learning signal is unambiguous
            CodecTrainConfig(perceptual_start_step=10_000, lr=1e-3,
                             adv_weight=0.0, fm_weight=0.0),
            rng=jax.random.PRNGKey(0), example_batch=(wav, feat),
        )
        first = tr.train_step(wav, feat, jax.random.PRNGKey(1))["mel"]
        last = None
        for i in range(30):
            last = tr.train_step(wav, feat, jax.random.PRNGKey(2 + i))["mel"]
        assert last < 0.7 * first, (first, last)

    def test_mesh_step_matches_unsharded(self, rng):
        """dp-SPMD codec GAN step (params replicated, batch dp-sharded)
        produces the same generator loss as the single-device step."""
        from unified_audio_tpu.parallel import mesh as mesh_lib

        cfg = small10()
        b, t = 8, 640 * 8
        wav = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32) * 0.3)
        feat = jnp.asarray(
            rng.standard_normal((b, t // 320, cfg.feat_dim)).astype(np.float32)
        )
        kw = dict(rng=jax.random.PRNGKey(0), example_batch=(wav, feat))
        plain = CodecGANTrainer(cfg, CodecTrainConfig(perceptual_start_step=1),
                                **kw)
        sharded = CodecGANTrainer(cfg, CodecTrainConfig(perceptual_start_step=1),
                                  mesh=mesh_lib.make_mesh(), **kw)
        m_plain = plain.train_step(wav, feat, jax.random.PRNGKey(1))
        m_shard = sharded.train_step(wav, feat, jax.random.PRNGKey(1))
        assert abs(m_plain["gen_loss"] - m_shard["gen_loss"]) < 1e-4
        # VQ EMA stats moved identically (global reduction under GSPMD)
        cb_p = jax.tree_util.tree_leaves(plain.gen_vars["codebook"])
        cb_s = jax.tree_util.tree_leaves(sharded.gen_vars["codebook"])
        for a, b_ in zip(cb_p, cb_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4)
