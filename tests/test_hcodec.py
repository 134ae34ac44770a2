"""HCodec 1.0 / 2.0 end-to-end shape + consistency tests (features injected;
the SSL frontend has its own tests)."""
import numpy as np
import pytest
# whole-file slow tier: 181s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.models.hcodec.codec import (
    HCodec, hcodec10_config, hcodec20_config,
)


def small10():
    return hcodec10_config(
        latent_dim=64, seanet_filters=4, codebook_size=32, num_quantizers=2,
        decoder_dim=64, decoder_intermediate_dim=128, decoder_convnext_layers=2,
        semantic_encode_channels=64, feat_dim=32,
    )


def small20():
    return hcodec20_config(
        latent_dim=64, codebook_size=32, num_quantizers=2,
        decoder_dim=64, decoder_intermediate_dim=128, decoder_convnext_layers=2,
        encoder_dim=64, encoder_intermediate_dim=128, encoder_convnext_layers=2,
        semantic_encode_channels=64, feat_dim=32,
    )


@pytest.fixture(scope="module")
def rngs():
    return {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}


class TestHCodec10:
    def test_roundtrip_consistency(self, rngs, rng):
        """encode -> decode equals forward's quantized path at inference."""
        cfg = small10()
        m = HCodec(cfg)
        L = 640 * 8
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, L // 320, cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(rngs, wav, feat, train=False)

        ac, sem = m.apply(variables, wav, feat, method="encode")
        assert ac.shape == (1, 8, 2) and sem.shape == (1, 8, 2)
        assert int(ac.max()) < cfg.codebook_size and int(ac.min()) >= 0

        recon = m.apply(variables, ac, sem, method="decode")
        assert recon.shape == (1, L)

        fwd_recon, pred_feat, commit = m.apply(variables, wav, feat, train=False)
        assert fwd_recon.shape == (1, L)
        assert pred_feat.shape == feat.shape
        np.testing.assert_allclose(
            np.asarray(fwd_recon), np.asarray(recon), atol=1e-4
        )

    def test_train_step_updates_codebooks(self, rngs, rng):
        cfg = small10()
        m = HCodec(cfg)
        L = 640 * 8
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, L // 320, cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(rngs, wav, feat, train=False)
        (recon, pred, commit), mutated = m.apply(
            variables, wav, feat, train=True, mutable=["codebook"],
            rngs={"quant": jax.random.PRNGKey(3)},
        )
        assert float(mutated["codebook"]["quantizer"]["layers_0"]["inited"]) == 1.0
        assert np.isfinite(float(commit))


class TestHCodec20:
    def test_roundtrip_consistency(self, rngs, rng):
        cfg = small20()
        m = HCodec(cfg)
        L = 3840 * 4  # 4 tokens @ 12.5 Hz, 48 kHz
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        # HuBERT runs at 50 Hz on the 16 kHz resample -> L/960 frames
        feat = jnp.asarray(
            rng.standard_normal((1, L // 960, cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(rngs, wav, feat, train=False)
        ac, sem = m.apply(variables, wav, feat, method="encode")
        assert ac.shape == (1, 4, 2) and sem.shape == (1, 4, 2)
        recon = m.apply(variables, ac, sem, method="decode")
        assert recon.shape == (1, L)


class TestHCodec20Tokenizer:
    def test_tokenize_detokenize_with_resample(self, rng):
        """48 kHz tokenizer end-to-end: resamples to 16 kHz for the SSL
        frontend (HCodec-2.0 audio_tokenizer.py:41,50), hop 3840."""
        from unified_audio_tpu.models.hcodec.tokenizer import HCodecTokenizer
        from tests.test_unise import tiny_ssl_cfg

        cfg = small20()
        tok = HCodecTokenizer.from_random(
            jax.random.PRNGKey(0), cfg, tiny_ssl_cfg(cfg.feat_dim)
        )
        wav = jnp.asarray(rng.standard_normal((1, 3840 * 4)).astype(np.float32))
        ac, sem = tok.tokenize(wav)
        assert ac.shape == (1, 2, 4)  # (B, nq, T @ 12.5 Hz)
        rec = tok.detokenize(ac, sem)
        assert rec.shape == (1, 3840 * 4)


class TestBf16ServingMode:
    def test_bf16_close_to_f32(self, rng):
        """bf16 serving mode (dtype=jnp.bfloat16): fp32 VQ-distance and
        ISTFT islands keep the output close to the fp32 path — most token
        IDs agree (only near-tie codebook assignments may flip) and the
        decoded waveforms of the SAME codes stay within bf16 rounding."""
        from unified_audio_tpu.models.hcodec.tokenizer import HCodecTokenizer
        from tests.test_unise import tiny_ssl_cfg

        cfg = small10()
        tok32 = HCodecTokenizer.from_random(
            jax.random.PRNGKey(0), cfg, tiny_ssl_cfg(cfg.feat_dim))
        wav = jnp.asarray(rng.standard_normal((1, 640 * 8)).astype(np.float32))
        # k-means-init the codebooks with one train pass: fresh EMA RVQ
        # codebooks are ZEROS, so decode would be identically zero and the
        # closeness checks vacuous
        feats = tok32.extract_features(wav)
        _, mut = tok32.codec.apply(
            tok32.codec_variables, wav[..., None], feats, train=True,
            mutable=["codebook"], rngs={"quant": jax.random.PRNGKey(3)})
        vars_init = {**tok32.codec_variables, "codebook": mut["codebook"]}
        tok32 = HCodecTokenizer(cfg, vars_init, tok32.ssl.config,
                                tok32.ssl_variables)
        tok16 = HCodecTokenizer(cfg, vars_init,
                                tok32.ssl.config, tok32.ssl_variables,
                                dtype=jnp.bfloat16)
        ac32, sem32 = tok32.tokenize(wav)
        ac16, sem16 = tok16.tokenize(wav)
        agree = float(np.mean(
            np.concatenate([(np.asarray(ac32) == np.asarray(ac16)).ravel(),
                            (np.asarray(sem32) == np.asarray(sem16)).ravel()])
        ))
        assert agree >= 0.75, f"token agreement {agree}"

        rec32 = np.asarray(tok32.detokenize(ac32, sem32))
        rec16 = np.asarray(tok16.detokenize(ac32, sem32))  # same codes
        assert rec16.dtype == np.float32
        err = np.abs(rec16 - rec32)
        scale = np.abs(rec32).max() + 1e-9
        assert float(err.max()) / scale < 0.15, float(err.max()) / scale
        snr = 10 * np.log10(
            float(np.mean(rec32 ** 2)) / (float(np.mean(err ** 2)) + 1e-20))
        assert snr > 15.0, f"decode SNR vs fp32 = {snr:.1f} dB"
