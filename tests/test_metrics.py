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
