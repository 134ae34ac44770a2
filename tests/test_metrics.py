"""Metric sanity tests: identity gives perfect scores; noise degrades them
monotonically."""
import numpy as np
import pytest
# whole-file slow tier: 175s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow


import jax
import jax.numpy as jnp

from unified_audio_tpu.eval import metrics


@pytest.fixture
def speechlike(rng):
    t = np.arange(32000) / 16000
    # crude speech-like: AM-modulated harmonics + noise floor
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in
            enumerate((220, 440, 660, 880)))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


class TestSISNR:
    def test_identity_and_scale_invariance(self, speechlike):
        assert metrics.si_snr(speechlike, speechlike) > 50
        assert metrics.si_snr(speechlike * 0.3, speechlike) > 50

    def test_noise_degrades(self, speechlike, rng):
        noisy = speechlike + 0.1 * rng.standard_normal(len(speechlike)).astype(np.float32)
        s = metrics.si_snr(noisy, speechlike)
        assert 0 < s < 40


class TestSTOI:
    def test_identity(self, speechlike):
        assert metrics.stoi(speechlike, speechlike) > 0.99

    def test_monotone_with_noise(self, speechlike, rng):
        n = rng.standard_normal(len(speechlike)).astype(np.float32)
        s_clean = metrics.stoi(speechlike, speechlike)
        s_mid = metrics.stoi(speechlike + 0.05 * n, speechlike)
        s_bad = metrics.stoi(speechlike + 0.7 * n, speechlike)
        assert s_clean > s_mid > s_bad


class TestPESQ:
    def test_identity_near_max(self, speechlike):
        assert metrics.pesq(speechlike, speechlike) > 4.2

    def test_monotone_with_noise(self, speechlike, rng):
        n = rng.standard_normal(len(speechlike)).astype(np.float32)
        scores = [metrics.pesq(speechlike + a * n, speechlike)
                  for a in (0.0, 0.02, 0.1, 0.5)]
        assert scores[0] > scores[1] > scores[2] > scores[3]
        assert scores[-1] < 2.5

    def test_range(self, speechlike, rng):
        garbage = rng.standard_normal(len(speechlike)).astype(np.float32)
        s = metrics.pesq(garbage, speechlike)
        assert -0.5 <= s <= 4.5

    def test_level_invariance(self, speechlike):
        """Active-speech level alignment: a pure gain change barely moves
        the score (P.862 aligns both signals to a common level)."""
        s_same = metrics.pesq(speechlike, speechlike)
        s_gain = metrics.pesq(0.2 * speechlike, speechlike)
        assert abs(s_same - s_gain) < 0.1

    def test_asymmetry(self, speechlike, rng):
        """Additive distortion is penalized more than attenuation of the
        same energy (the P.862 asymmetry factor)."""
        n = rng.standard_normal(len(speechlike)).astype(np.float32)
        added = metrics.pesq(speechlike + 0.15 * n, speechlike)
        # band-attenuate: remove highs (energy loss, no added content)
        import scipy.signal
        sos = scipy.signal.butter(4, 2000, "lowpass", fs=16000, output="sos")
        attenuated = metrics.pesq(
            scipy.signal.sosfilt(sos, speechlike).astype(np.float32),
            speechlike)
        assert added < attenuated

    def test_mos_lqo_mapping(self):
        # P.862.1 anchor points
        assert abs(metrics.pesq_mos_lqo(4.5) - 4.55) < 0.15
        assert abs(metrics.pesq_mos_lqo(1.0) - 1.15) < 0.15
        assert metrics.pesq_mos_lqo(3.0) > metrics.pesq_mos_lqo(2.0)


class TestUTMOSProxy:
    def test_clean_scores_high(self, speechlike):
        assert metrics.utmos_proxy(speechlike) > 3.5

    def test_noise_degrades(self, speechlike, rng):
        n = rng.standard_normal(len(speechlike)).astype(np.float32)
        clean = metrics.utmos_proxy(speechlike)
        noisy = metrics.utmos_proxy(speechlike + 0.2 * n)
        very_noisy = metrics.utmos_proxy(speechlike + 0.8 * n)
        assert clean > noisy > very_noisy

    def test_clipping_degrades(self, speechlike):
        clipped = np.clip(speechlike * 8.0, -1, 1) / 8.0
        assert metrics.utmos_proxy(clipped) < metrics.utmos_proxy(speechlike)

    def test_range(self, rng):
        assert 1.0 <= metrics.utmos_proxy(
            rng.standard_normal(16000).astype(np.float32)) <= 5.0


class TestWER:
    def test_exact_match(self):
        assert metrics.wer("the cat sat", "the cat sat") == 0.0

    def test_substitution_deletion_insertion(self):
        assert metrics.wer("the dog sat", "the cat sat") == pytest.approx(1 / 3)
        assert metrics.wer("the sat", "the cat sat") == pytest.approx(1 / 3)
        assert metrics.wer("the big cat sat", "the cat sat") == pytest.approx(1 / 3)

    def test_empty_reference(self):
        assert metrics.wer("", "") == 0.0
        assert metrics.wer("a b", "") == 2.0

    def test_known_alignment(self):
        # classic: all words wrong -> 1.0; extra hyp words can exceed 1.0
        assert metrics.wer("x y z", "a b c") == 1.0
        assert metrics.wer("a b c d e f", "a b c") == 1.0


class TestSpkSim:
    def test_cosine_properties(self, rng):
        a = rng.standard_normal(192)
        assert abs(metrics.spk_sim(a, a) - 1.0) < 1e-9
        assert abs(metrics.spk_sim(a, -a) + 1.0) < 1e-9
        b = rng.standard_normal(192)
        assert -1.0 <= metrics.spk_sim(a, b) <= 1.0

    def test_ecapa_embed_fn(self, rng):
        """Same utterance (clean vs lightly degraded) scores higher than a
        structurally different signal through the BiCodec x-vector branch."""
        from unified_audio_tpu.models.bicodec.bicodec import (BiCodec,
                                                              BiCodecConfig)

        cfg = BiCodecConfig(
            feat_dim=32, vocos_dim=32, vocos_intermediate_dim=64,
            vocos_num_layers=1, latent_dim=32, codebook_size=64,
            codebook_dim=8, spk_out_dim=32, spk_latent_dim=16, token_num=4,
            num_mels=32, mel_n_fft=256, mel_win=160, mel_hop=80,
            wave_channels=32, wave_rates=(4, 2), wave_kernels=(8, 4),
        )
        import jax
        import jax.numpy as jnp

        model = BiCodec(cfg)
        t = 16000
        feat = jnp.zeros((1, t // 320, cfg.feat_dim))
        variables = model.init(jax.random.PRNGKey(0), feat,
                               jnp.zeros((1, t)))
        embed = metrics.make_spk_embed_fn(model, variables)

        tt = np.arange(t) / 16000.0
        voiced = (np.sin(2 * np.pi * 180 * tt)
                  * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * tt))
                  ).astype(np.float32)[None]
        degraded = voiced + 0.02 * rng.standard_normal((1, t)).astype(
            np.float32)
        other = rng.standard_normal((1, t)).astype(np.float32)

        same = metrics.spk_sim(embed(voiced), embed(degraded))
        diff = metrics.spk_sim(embed(voiced), embed(other))
        assert same > diff
        assert same > 0.9


class TestSpectral:
    def test_lsd(self, speechlike, rng):
        assert metrics.lsd(speechlike, speechlike) < 1e-3
        assert metrics.lsd(
            speechlike + 0.1 * rng.standard_normal(len(speechlike)).astype(np.float32),
            speechlike,
        ) > 1.0

    def test_mcd(self, speechlike, rng):
        assert metrics.mcd(speechlike, speechlike) < 1e-3
        assert metrics.mcd(
            speechlike + 0.3 * rng.standard_normal(len(speechlike)).astype(np.float32),
            speechlike,
        ) > 1.0


class TestLearnedUTMOS:
    """eval/utmos.py: UTMOS22 strong-learner architecture + converter."""

    def test_predictor_runs_and_in_range(self, rng):
        from unified_audio_tpu.eval.utmos import UTMOSConfig, UTMOSPredictor
        from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod

        tiny_ssl = ssl_mod.SSLConfig(
            hidden_size=16, num_layers=2, num_heads=4, intermediate_size=16,
            conv_dim=(8,) * 7, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4)
        cfg = UTMOSConfig(ssl_dim=16, judge_dim=8, domain_dim=8,
                          num_judges=5, num_domains=2, blstm_hidden=8,
                          mlp_hidden=16)
        pred = UTMOSPredictor.from_random(
            jax.random.PRNGKey(0), ssl_config=tiny_ssl, cfg=cfg)
        wav = rng.standard_normal(8000).astype(np.float32) * 0.1
        s = pred(wav)
        assert np.isfinite(s)

    def test_converter_roundtrip(self, rng):
        from unified_audio_tpu.eval.utmos import (
            UTMOSConfig, UTMOSHead, convert_utmos, export_utmos_state_dict)

        cfg = UTMOSConfig(ssl_dim=16, judge_dim=8, domain_dim=8,
                          num_judges=5, num_domains=2, blstm_hidden=8,
                          mlp_hidden=16)
        head = UTMOSHead(cfg)
        feats = jnp.asarray(
            rng.standard_normal((2, 12, 16)).astype(np.float32))
        variables = head.init(jax.random.PRNGKey(0), feats)
        sd = export_utmos_state_dict(variables)
        back = convert_utmos(sd, cfg)
        s1 = head.apply(variables, feats)
        s2 = head.apply(back, feats)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-6)

    def test_blstm_matches_torch(self, rng):
        """The BLSTM layout really is torch nn.LSTM(bidirectional=True):
        converted torch weights give identical outputs."""
        import torch

        from unified_audio_tpu.eval.utmos import BLSTM

        tl = torch.nn.LSTM(6, 4, batch_first=True, bidirectional=True)
        tl.eval()
        x = rng.standard_normal((2, 9, 6)).astype(np.float32)
        with torch.no_grad():
            y_t, _ = tl(torch.from_numpy(x))
        m = BLSTM(4)
        sd = {f"blstm.{k}": v for k, v in tl.state_dict().items()}
        from unified_audio_tpu.eval.utmos import convert_utmos  # noqa: F401

        params = {"params": {
            "w_ih_l0": np.asarray(sd["blstm.weight_ih_l0"]).T,
            "w_hh_l0": np.asarray(sd["blstm.weight_hh_l0"]).T,
            "b_ih_l0": np.asarray(sd["blstm.bias_ih_l0"]),
            "b_hh_l0": np.asarray(sd["blstm.bias_hh_l0"]),
            "w_ih_l0_rev": np.asarray(sd["blstm.weight_ih_l0_reverse"]).T,
            "w_hh_l0_rev": np.asarray(sd["blstm.weight_hh_l0_reverse"]).T,
            "b_ih_l0_rev": np.asarray(sd["blstm.bias_ih_l0_reverse"]),
            "b_hh_l0_rev": np.asarray(sd["blstm.bias_hh_l0_reverse"]),
        }}
        y_j = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(), atol=2e-6)

    def test_converter_accepts_real_utmos22_layout(self, rng):
        """The released UTMOS22 checkpoint's key paths (lightning module
        attribute paths: feature_extractors.1.embedding,
        output_layers.0.{judge_embedding,decoder_rnn},
        output_layers.1.net.{0,3}) convert verbatim — pinned by a torch
        twin with those exact attribute paths."""
        import torch

        from unified_audio_tpu.eval.utmos import (
            UTMOSConfig, UTMOSHead, convert_utmos)

        cfg = UTMOSConfig(ssl_dim=16, judge_dim=8, domain_dim=8,
                          num_judges=5, num_domains=2, blstm_hidden=8,
                          mlp_hidden=16)

        class SSLStub(torch.nn.Module):
            pass

        class DomainEmbedding(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.embedding = torch.nn.Embedding(cfg.num_domains,
                                                    cfg.domain_dim)

        class LDConditioner(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.judge_embedding = torch.nn.Embedding(cfg.num_judges,
                                                          cfg.judge_dim)
                self.decoder_rnn = torch.nn.LSTM(
                    cfg.ssl_dim + cfg.domain_dim + cfg.judge_dim,
                    cfg.blstm_hidden, batch_first=True, bidirectional=True)

        class Projection(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.net = torch.nn.Sequential(
                    torch.nn.Linear(2 * cfg.blstm_hidden, cfg.mlp_hidden),
                    torch.nn.ReLU(), torch.nn.Dropout(0.3),
                    torch.nn.Linear(cfg.mlp_hidden, 1))

        class Lightning(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.feature_extractors = torch.nn.ModuleList(
                    [SSLStub(), DomainEmbedding()])
                self.output_layers = torch.nn.ModuleList(
                    [LDConditioner(), Projection()])

        torch.manual_seed(4)
        twin = Lightning()
        variables = convert_utmos(twin.state_dict(), cfg)
        head = UTMOSHead(cfg)
        feats = jnp.asarray(
            rng.standard_normal((2, 12, 16)).astype(np.float32))
        score = head.apply(variables, feats)
        assert np.isfinite(np.asarray(score)).all()
        # the mapped parameters ARE the twin's tensors (not re-inits)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["judge_embedding"]),
            twin.output_layers[0].judge_embedding.weight.detach().numpy())
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["blstm"]["w_ih_l0"]),
            twin.output_layers[0].decoder_rnn.weight_ih_l0.detach().numpy().T)
        np.testing.assert_array_equal(
            np.asarray(variables["params"]["linear2"]["kernel"]),
            twin.output_layers[1].net[3].weight.detach().numpy().T)

    def test_metrics_utmos_variant_switch(self, rng):
        from unified_audio_tpu.eval import metrics as M

        wav = rng.standard_normal(8000).astype(np.float32) * 0.1
        score, variant = M.utmos(wav)
        assert variant == "utmos_proxy" and 1.0 <= score <= 5.0

        class FakePredictor:
            def __call__(self, w):
                return 3.25

        score, variant = M.utmos(wav, predictor=FakePredictor())
        assert variant == "utmos_learned" and score == 3.25


class TestPESQSpecCompletion:
    """Round-3 P.862 additions: utterance time alignment (default ON),
    Zwicker-table Bark bands, narrowband IRS receive path."""

    def test_alignment_recovers_shifted_identity(self, speechlike):
        sh = np.concatenate([np.zeros(640, np.float32), speechlike])
        sh = sh[: len(speechlike)]
        assert metrics.pesq(sh, speechlike) > 4.3
        # without the search the same pair scores far worse
        assert metrics.pesq(sh, speechlike, assume_aligned=True) < 3.0

    def test_monotonic_under_misaligned_gradation(self, speechlike, rng):
        noise = rng.standard_normal(len(speechlike)).astype(np.float32)
        scores = []
        for snr_db in (30.0, 15.0, 5.0):
            g = 10 ** (-snr_db / 20) * np.std(speechlike) / np.std(noise)
            deg = speechlike + g * noise
            deg = np.concatenate([np.zeros(320, np.float32), deg])[
                : len(speechlike)]
            scores.append(metrics.pesq(deg, speechlike))
        assert scores[0] > scores[1] > scores[2], scores

    def test_narrowband_irs_path(self, speechlike):
        nb = speechlike[::2]  # crude 8 kHz decimation is fine for a smoke
        s = metrics.pesq(nb, nb, fs=8000)
        assert s > 4.0  # identity through the IRS filter stays near-perfect

    def test_bark_bands_from_table(self):
        bank, widths, centers = metrics._bark_filterbank(16000, 512)
        # half-Bark spacing on the Zwicker axis up to 8 kHz (~21.2 Bark)
        assert 40 <= bank.shape[0] <= 44
        np.testing.assert_allclose(widths, 0.5)
        assert bank.shape[1] == 257
