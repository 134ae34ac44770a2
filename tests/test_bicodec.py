"""BiCodec tests: the reference's own round-trip check (bicodec.py:235-257)
plus speaker-branch consistency (speaker_encoder.py:118-140)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.bicodec.bicodec import BiCodec, BiCodecConfig
from unified_audio_tpu.models.bicodec.speaker import SpeakerEncoder


def tiny_cfg():
    return BiCodecConfig(
        feat_dim=32, vocos_dim=32, vocos_intermediate_dim=64,
        vocos_num_layers=2, latent_dim=32, codebook_size=64, codebook_dim=8,
        spk_out_dim=32, spk_latent_dim=16, token_num=4,
        num_mels=32, mel_n_fft=256, mel_win=160, mel_hop=80,
        wave_channels=32, wave_rates=(4, 2), wave_kernels=(8, 4),
    )


class TestSpeakerEncoder:
    def test_tokenize_detokenize_consistency(self, key, rng):
        """d-vector from forward == detokenize(tokenize(mel))
        (speaker_encoder.py:118-140)."""
        m = SpeakerEncoder(input_dim=24, out_dim=32, latent_dim=16, token_num=4)
        mels = jnp.asarray(rng.standard_normal((2, 50, 24)).astype(np.float32))
        variables = m.init(key, mels)
        _, d_vec = m.apply(variables, mels)
        toks = m.apply(variables, mels, method="tokenize")
        assert toks.shape == (2, 4, 1)
        assert int(toks.max()) < 4096 and int(toks.min()) >= 0
        d_vec2 = m.apply(variables, toks, method="detokenize")
        np.testing.assert_allclose(np.asarray(d_vec), np.asarray(d_vec2),
                                   atol=1e-4)


class TestBiCodec:
    def test_forward_tokenize_detokenize_roundtrip(self, key, rng):
        """forward recon == detokenize(tokenize(...)) at inference
        (the reference's own 'Test successful' check, bicodec.py:235-257)."""
        cfg = tiny_cfg()
        m = BiCodec(cfg)
        dur = 0.96
        wav = jnp.asarray(
            rng.standard_normal((2, int(dur * 16000))).astype(np.float32)
        )
        feat = jnp.asarray(
            rng.standard_normal((2, int(dur * 50), cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(key, feat, wav)
        out = m.apply(variables, feat, wav, train=False)
        # wave generator upsamples by prod(rates)=8 from 50 Hz latents @ ratios (1,1)
        assert out["recons"].shape == (2, feat.shape[1] * 8)
        assert out["pred_feat"].shape == feat.shape

        sem, glob = m.apply(variables, feat, wav, method="tokenize")
        assert sem.shape == (2, feat.shape[1])
        assert glob.shape == (2, cfg.token_num, 1)
        recon = m.apply(variables, sem, glob, method="detokenize")
        np.testing.assert_allclose(
            np.asarray(out["recons"]), np.asarray(recon), atol=1e-4
        )

    def test_train_forward(self, key, rng):
        cfg = tiny_cfg()
        m = BiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
        feat = jnp.asarray(rng.standard_normal((1, 25, cfg.feat_dim)).astype(np.float32))
        variables = m.init(key, feat, wav)
        out, mutated = m.apply(
            variables, feat, wav, train=True,
            mutable=["codebook", "batch_stats"],
        )
        assert np.isfinite(float(out["vq_loss"]))
        assert float(out["perplexity"]) > 0
