"""End-to-end UniSE tests on tiny configs: tokenizer round trips, train loss,
and the SE / TSE / SS inference flows."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.bicodec.bicodec import BiCodecConfig
from unified_audio_tpu.models.bicodec.tokenizer import BiCodecTokenizer
from unified_audio_tpu.models.lm.llama import LlamaConfig
from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
from unified_audio_tpu.models.unise.model import UniSE, UniSEConfig


def tiny_bicodec_cfg():
    return BiCodecConfig(
        ref_segment_duration=0.2,
        feat_dim=32, vocos_dim=32, vocos_intermediate_dim=64,
        vocos_num_layers=1, latent_dim=32, codebook_size=64, codebook_dim=8,
        spk_out_dim=32, spk_latent_dim=16, token_num=4,
        fsq_levels=(4, 4, 4),
        num_mels=32, mel_n_fft=256, mel_win=160, mel_hop=80,
        wave_channels=32, wave_rates=(8, 5, 4, 2), wave_kernels=(16, 11, 8, 4),
    )


def tiny_ssl_cfg(hidden):
    return ssl_mod.SSLConfig(
        hidden_size=hidden, num_layers=2, num_heads=4, intermediate_size=32,
        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


@pytest.fixture(scope="module")
def unise():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tok = BiCodecTokenizer.from_random(
        k1, tiny_bicodec_cfg(), tiny_ssl_cfg(32)
    )
    wavlm_cfg = tiny_ssl_cfg(24)
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_cfg)
    wavlm_vars = wavlm.init(k2, jnp.zeros((1, 16320)))
    cfg = UniSEConfig(
        segment_seconds=0.4, feats_dim=24, global_tokens=4,
        llm=LlamaConfig(global_size=64, semantic_size=64, hidden_size=32,
                        num_layers=2, num_heads=4),
    )
    return UniSE(cfg, tok, wavlm_cfg, wavlm_vars, rng={"params": k3})


class TestBiCodecTokenizer:
    def test_roundtrip_shapes(self, unise, rng):
        wav = jnp.asarray(rng.standard_normal((2, 6400)).astype(np.float32))
        g, s = unise.tokenizer.tokenize(wav)
        assert g.shape == (2, 1, 4)  # (B, nq, token_num)
        # XLSR without the +-160 pad: floor conv arithmetic gives 19 frames
        # for 6400 samples (matches HF / the reference tokenizer)
        assert s.shape == (2, 19)
        est = unise.tokenizer.detokenize(g, s)
        assert est.shape == (2, 19 * 320)

    def test_token_determinism(self, unise, rng):
        wav = jnp.asarray(rng.standard_normal((1, 6400)).astype(np.float32))
        g1, s1 = unise.tokenizer.tokenize(wav)
        g2, s2 = unise.tokenizer.tokenize(wav)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


class TestUniSE:
    def test_train_loss_all_tasks(self, unise, rng):
        wav = jnp.asarray(rng.standard_normal((2, 6400)).astype(np.float32))
        mix = jnp.asarray(rng.standard_normal((2, 6400)).astype(np.float32))
        loss_se, acc = unise.loss_fn(unise.sft_params, "se", None, mix, wav)
        assert np.isfinite(float(loss_se))
        loss_tse, _ = unise.loss_fn(unise.sft_params, "tse", wav, mix, wav)
        assert np.isfinite(float(loss_tse))
        loss_rtse, _ = unise.loss_fn(unise.sft_params, "rtse", wav, mix, wav)
        assert np.isfinite(float(loss_rtse))

    def test_enhance_se_flow(self, unise, rng):
        # 1.5 segments -> wrap-pad to 2 segments, parallel decode
        wav = rng.standard_normal((1, 9600)).astype(np.float32)
        est = unise.enhance_se(wav)
        assert est.shape == (9600,)
        assert np.isfinite(est).all()

    def test_enhance_tse_flow(self, unise, rng):
        wav = rng.standard_normal((1, 6400)).astype(np.float32)
        enroll = rng.standard_normal((1, 6400)).astype(np.float32)
        est = unise.enhance_tse(wav, enroll)
        assert est.shape == (6400,)

    def test_separate_ss_flow(self, unise, rng):
        wav = rng.standard_normal((1, 6400)).astype(np.float32)
        s1, s2 = unise.separate_ss(wav)
        assert s1.shape == (6400,) and s2.shape == (6400,)
        assert np.isfinite(s1).all() and np.isfinite(s2).all()
