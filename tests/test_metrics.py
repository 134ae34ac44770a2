"""Metric sanity tests: identity gives perfect scores; noise degrades them
monotonically."""
import numpy as np
import pytest

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
