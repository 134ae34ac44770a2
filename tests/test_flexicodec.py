"""FlexiCodec (DAC + FSQ dual stream) tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.hcodec.flexicodec import (
    DACEncoder, FlexiCodec, FlexiCodecConfig,
)


def tiny_cfg():
    return FlexiCodecConfig(
        d_model=4, latent_dim=32, codebook_size=32, num_quantizers=2,
        n_mels=24, semantic_dim=32, fsq_levels=(4, 4, 4),
    )


class TestDACEncoder:
    def test_downsample_rate(self, key, rng):
        m = DACEncoder(d_model=4, rates=(2, 4, 5, 8), latent_dim=16)
        x = jnp.asarray(rng.standard_normal((1, 3200, 1)).astype(np.float32))
        z = m.apply(m.init(key, x), x)
        assert z.shape == (1, 10, 16)  # 3200 / 320


class TestFlexiCodec:
    def test_roundtrip(self, rng):
        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 320 * 20)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        variables = m.init(rngs, wav, train=False)

        out = m.apply(variables, wav, train=False)
        assert out["recons"].shape[0] == 1
        ac, sem = m.apply(variables, wav, method="encode")
        assert ac.shape[-1] == cfg.num_quantizers
        assert int(sem.max()) < 4 ** 3
        rec = m.apply(variables, ac, sem, method="decode")
        np.testing.assert_allclose(
            np.asarray(out["recons"]), np.asarray(rec), atol=1e-4
        )

    def test_fbank_rate(self, rng):
        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        variables = m.init(rngs, wav, train=False)
        fb = m.apply(variables, wav, method="fbank")
        assert fb.shape[-1] == cfg.n_mels
        assert abs(fb.shape[1] - 50) <= 1  # ~50 Hz
