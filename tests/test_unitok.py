"""UniTok multitask delay-pattern LM tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.unitok.delay import apply_delay, undo_delay
from unified_audio_tpu.models.unitok.model import (
    UNITOK_TASKS, UniTokConfig, UniTokLM,
)


def tiny_cfg():
    return UniTokConfig(
        codebook_size=32, num_quantizers=2, num_streams=2, hidden_size=32,
        num_layers=2, num_heads=4, text_dim=8, audio_dim=8,
    )


class TestDelay:
    def test_roundtrip(self, rng):
        codes = jnp.asarray(rng.integers(0, 100, (2, 7, 4)))
        d = apply_delay(codes, pad_token=999)
        assert d.shape == (2, 10, 4)
        # layer k starts with k pads
        for k in range(4):
            assert (np.asarray(d[:, :k, k]) == 999).all()
        np.testing.assert_array_equal(np.asarray(undo_delay(d)),
                                      np.asarray(codes))


class TestUniTokLM:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        m = UniTokLM(cfg)
        rng = np.random.default_rng(0)
        b, t = 2, 6
        codes = jnp.asarray(rng.integers(0, cfg.codebook_size,
                                         (b, t, cfg.num_codebooks)))
        caption = jnp.asarray(rng.standard_normal((b, 3, cfg.text_dim))
                              .astype(np.float32))
        audio = jnp.asarray(rng.standard_normal((b, 5, cfg.audio_dim))
                            .astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), 0, caption, audio, audio,
                           codes)
        return cfg, m, variables, codes, caption, audio

    def test_all_tasks_forward(self, setup):
        cfg, m, variables, codes, caption, audio = setup
        for task, tid in UNITOK_TASKS.items():
            cap = caption if task in ("lass",) else None
            ref = audio if task in ("tse", "vc") else None
            loss, acc = m.apply(variables, tid, cap, ref, audio, codes)
            assert np.isfinite(float(loss)), task
            assert 0.0 <= float(acc) <= 1.0

    def test_generate(self, setup):
        cfg, m, variables, codes, caption, audio = setup
        out = m.apply(
            variables, UNITOK_TASKS["codec"], None, None, audio, 5,
            jax.random.PRNGKey(1), method="generate", batch=2,
        )
        assert out.shape == (2, 5, cfg.num_codebooks)
        assert int(out.min()) >= 0 and int(out.max()) < cfg.codebook_size

    def test_mixed_task_batch_is_one_pipeline(self, setup):
        """Mixed-task batches differ only in the task embedding row: the same
        jitted program serves every task id."""
        cfg, m, variables, codes, caption, audio = setup
        f = jax.jit(lambda tid: m.apply(variables, tid, None, None, audio,
                                        codes)[0])
        l1 = f(jnp.asarray(0))
        l2 = f(jnp.asarray(3))
        assert np.isfinite(float(l1)) and np.isfinite(float(l2))
        assert float(l1) != float(l2)


class TestUniTokPipeline:
    def test_end_to_end(self, rng):
        """audio -> codes -> LM loss, and generate -> audio, on a tiny stack."""
        import jax

        from unified_audio_tpu.models.unitok.model import UniTokConfig
        from unified_audio_tpu.models.unitok.pipeline import UniTokPipeline
        from tests.test_hcodec import small10
        from tests.test_unise import tiny_ssl_cfg

        codec_cfg = small10()
        ssl_cfg = tiny_ssl_cfg(codec_cfg.feat_dim)
        lm_cfg = UniTokConfig(
            codebook_size=codec_cfg.codebook_size,
            num_quantizers=codec_cfg.num_quantizers,
            hidden_size=32, num_layers=2, num_heads=4,
            audio_dim=ssl_cfg.hidden_size,
        )
        pipe = UniTokPipeline.from_random(
            jax.random.PRNGKey(0), codec_cfg, ssl_cfg, lm_cfg
        )
        wav = jnp.asarray(rng.standard_normal((1, 640 * 4)).astype(np.float32))

        codes = pipe.audio_to_codes(wav)
        assert codes.shape == (1, 4, 2 * codec_cfg.num_quantizers)
        rec = pipe.codes_to_audio(codes)
        assert rec.shape == (1, 640 * 4)

        loss, acc = pipe.train_loss(pipe.lm_params, "codec", wav, wav)
        assert np.isfinite(float(loss))

        out = pipe.generate("ae", wav, jax.random.PRNGKey(1), num_frames=4)
        assert out.shape == (1, 640 * 4)
        assert np.isfinite(np.asarray(out)).all()
