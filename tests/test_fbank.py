"""Tests for ops/fbank.py — the funasr WavFrontend chain (kaldi fbank + LFR +
CMVN) the FlexiCodec semantic teacher consumes.

The oracle here is an independent per-frame loop implementation written
straight from the Kaldi/funasr spec (explicit Python loops, scalar math),
checked against the vectorized JAX path — structural independence catches
vectorization/index bugs. The CMVN parse is checked against the reference's
actual ``am.mvn`` stats artifact when /root/reference is present
(QuarkAudio-HCodec/HCodec-1.5/adaptive/am.mvn; feature_extractors.py:13-21
pins the frontend params this module reproduces).
"""
import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unified_audio_tpu.ops import fbank as fb

AM_MVN = "/root/reference/QuarkAudio-HCodec/HCodec-1.5/adaptive/am.mvn"


# ---------------------------------------------------------------------------
# Spec oracle: per-frame loops, numpy scalars
# ---------------------------------------------------------------------------

def _oracle_fbank(wav, sr=16000, n_mels=80, frame_ms=25.0, shift_ms=10.0,
                  preemph=0.97):
    win = int(sr * frame_ms / 1000)
    shift = int(sr * shift_ms / 1000)
    fft = 1 << (win - 1).bit_length()
    x = np.asarray(wav, np.float64) * 32768.0
    t = 1 + (len(x) - win) // shift
    ham = np.array([0.54 - 0.46 * math.cos(2 * math.pi * i / (win - 1))
                    for i in range(win)])
    # mel banks, bin by bin
    def mel(f):
        return 1127.0 * math.log(1.0 + f / 700.0)
    nbins = fft // 2
    lo, hi = mel(20.0), mel(sr / 2.0)
    delta = (hi - lo) / (n_mels + 1)
    banks = np.zeros((n_mels, fft // 2 + 1))
    for m in range(n_mels):
        l, c, r = lo + m * delta, lo + (m + 1) * delta, lo + (m + 2) * delta
        for k in range(nbins):
            fm = mel(k * sr / fft)
            if l < fm <= c:
                banks[m, k] = (fm - l) / (c - l)
            elif c < fm < r:
                banks[m, k] = (r - fm) / (r - c)
    out = np.zeros((t, n_mels))
    for i in range(t):
        frame = x[i * shift:i * shift + win].copy()
        frame -= frame.mean()
        pre = frame.copy()
        for j in range(win - 1, 0, -1):
            pre[j] -= preemph * pre[j - 1]
        pre[0] -= preemph * pre[0]
        spec = np.fft.rfft(pre * ham, n=fft)
        power = spec.real ** 2 + spec.imag ** 2
        out[i] = np.log(np.maximum(banks @ power, np.finfo(np.float32).eps))
    return out


def _oracle_lfr(feats, m, n):
    t, d = feats.shape
    t_lfr = math.ceil(t / n)
    left = (m - 1) // 2
    padded = np.vstack([np.tile(feats[0], (left, 1)), feats])
    tp = len(padded)
    rows = []
    for i in range(t_lfr):
        if m <= tp - i * n:
            rows.append(padded[i * n:i * n + m].reshape(-1))
        else:
            row = padded[i * n:].reshape(-1)
            for _ in range(m - (tp - i * n)):
                row = np.concatenate([row, padded[-1]])
            rows.append(row)
    return np.vstack(rows)


# ---------------------------------------------------------------------------


def test_fbank_matches_spec_oracle():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(4000).astype(np.float32) * 0.3
    got = np.asarray(fb.kaldi_fbank(jnp.asarray(wav)))
    want = _oracle_fbank(wav)
    assert got.shape == want.shape == (23, 80)
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)


def test_fbank_framing_and_batch():
    wav = np.zeros((2, 16000), np.float32)
    wav[:, 8000] = 0.5
    out = np.asarray(fb.kaldi_fbank(jnp.asarray(wav)))
    # snip_edges: T = 1 + (16000-400)//160 = 98
    assert out.shape == (2, 98, 80)
    np.testing.assert_allclose(out[0], out[1], atol=0)


def test_fbank_dither_needs_rng_and_is_reproducible():
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(1600),
                      dtype=jnp.float32)
    with pytest.raises(ValueError):
        fb.kaldi_fbank(wav, dither=1.0)
    a = fb.kaldi_fbank(wav, dither=1.0, rng=jax.random.PRNGKey(0))
    b = fb.kaldi_fbank(wav, dither=1.0, rng=jax.random.PRNGKey(0))
    c = fb.kaldi_fbank(wav, dither=1.0, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


@pytest.mark.parametrize("t", [5, 6, 7, 12, 13, 100])
def test_lfr_matches_funasr_semantics(t):
    rng = np.random.default_rng(t)
    feats = rng.standard_normal((t, 4)).astype(np.float32)
    got = np.asarray(fb.apply_lfr(jnp.asarray(feats), 7, 6))
    want = _oracle_lfr(feats, 7, 6)
    assert got.shape == want.shape == (math.ceil(t / 6), 28)
    np.testing.assert_allclose(got, want, atol=0)


def test_lfr_batched():
    feats = np.random.default_rng(0).standard_normal((3, 25, 8)).astype(
        np.float32)
    got = np.asarray(fb.apply_lfr(jnp.asarray(feats)))
    assert got.shape == (3, math.ceil(25 / 6), 56)
    for b in range(3):
        np.testing.assert_allclose(got[b], _oracle_lfr(feats[b], 7, 6),
                                   atol=0)


def test_cmvn_parse_synthetic(tmp_path):
    path = tmp_path / "mini.mvn"
    path.write_text(
        "<Nnet>\n<Splice> 4 4\n[ 0 ]\n"
        "<AddShift> 4 4 \n<LearnRateCoef> 0 [ -1 -2 -3 -4 ]\n"
        "<Rescale> 4 4 \n<LearnRateCoef> 0 [ 0.5 0.25 2 1 ]\n</Nnet>\n")
    add, scale = fb.load_kaldi_cmvn(str(path))
    np.testing.assert_array_equal(add, [-1, -2, -3, -4])
    np.testing.assert_array_equal(scale, [0.5, 0.25, 2, 1])
    x = jnp.ones((2, 4))
    out = np.asarray(fb.apply_cmvn(x, add, scale))
    np.testing.assert_allclose(out, (np.ones((2, 4)) + add) * scale)


@pytest.mark.skipif(not os.path.exists(AM_MVN),
                    reason="reference am.mvn not present")
def test_reference_am_mvn_loads():
    add, scale = fb.load_kaldi_cmvn(AM_MVN)
    # 560 = n_mels(80) * lfr_m(7) — the dims feature_extractors.py pins
    assert add.shape == scale.shape == (560,)
    assert np.all(np.isfinite(add)) and np.all(np.isfinite(scale))
    assert np.all(scale > 0)  # rescale = 1/std
    assert np.all(add < 0)    # addshift = -mean of log-mels (all positive)


@pytest.mark.skipif(not os.path.exists(AM_MVN),
                    reason="reference am.mvn not present")
def test_sensevoice_frontend_end_to_end():
    front = fb.SenseVoiceFrontend(cmvn_file=AM_MVN)
    assert front.output_dim == 560
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal(16000) * 0.2,
        dtype=jnp.float32)
    feats = np.asarray(jax.jit(front)(wav))
    # fbank T = 98, LFR T = ceil(98/6) = 17
    assert feats.shape == (17, 560)
    # CMVN output should be roughly standardized on natural-scale audio
    assert abs(float(feats.mean())) < 3.0
    # matches the unjitted path
    np.testing.assert_allclose(np.asarray(front(wav)), feats, atol=1e-5)


def test_frontend_rejects_dim_mismatch(tmp_path):
    path = tmp_path / "bad.mvn"
    path.write_text(
        "<AddShift> 4 4 \n<LearnRateCoef> 0 [ -1 -2 -3 -4 ]\n"
        "<Rescale> 4 4 \n<LearnRateCoef> 0 [ 1 1 1 1 ]\n")
    with pytest.raises(ValueError):
        fb.SenseVoiceFrontend(cmvn_file=str(path))
