"""Objective speech metrics for the evaluation harness.

The reference pins torch-pesq / visqol / jiwer as eval deps
(requirements.txt) and prints PESQ/STOI from trainer.test
(model/model.py:294-299, commented). Those wheels are not in this image, so we
implement the standard reference-based metrics directly in numpy:

* STOI (Taal et al. 2011) — short-time objective intelligibility
* SI-SNR — scale-invariant SNR (separation quality)
* MCD — mel-cepstral distance
* LSD — log-spectral distance

These are the fidelity gates used by eval/ to compare reconstructions against
references at matched tolerance.
"""
from __future__ import annotations

import math

import numpy as np


def si_snr(est: np.ndarray, ref: np.ndarray, eps: float = 1e-8) -> float:
    """Scale-invariant SNR in dB. est/ref (T,)."""
    est = est - est.mean()
    ref = ref - ref.mean()
    proj = (np.dot(est, ref) / (np.dot(ref, ref) + eps)) * ref
    noise = est - proj
    return float(10 * np.log10((proj**2).sum() / ((noise**2).sum() + eps) + eps))


def _stft(x, n_fft, hop, win):
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return np.fft.rfft(x[idx] * win, n=n_fft, axis=-1)


def lsd(est: np.ndarray, ref: np.ndarray, n_fft: int = 512,
        hop: int = 256) -> float:
    """Log-spectral distance (dB)."""
    t = min(len(est), len(ref))
    win = np.hanning(n_fft + 1)[:-1]
    se = np.abs(_stft(est[:t], n_fft, hop, win)) ** 2
    sr = np.abs(_stft(ref[:t], n_fft, hop, win)) ** 2
    d = (10 * np.log10((sr + 1e-10) / (se + 1e-10))) ** 2
    return float(np.mean(np.sqrt(np.mean(d, axis=-1))))


def _thirds_octave_bands(fs: int, n_fft: int, num_bands: int = 15,
                         min_freq: float = 150.0):
    f = np.linspace(0, fs / 2, n_fft // 2 + 1)
    cf = min_freq * (2 ** (np.arange(num_bands) / 3.0))
    lo = cf * 2 ** (-1 / 6)
    hi = cf * 2 ** (1 / 6)
    bands = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        bands[i, (f >= lo[i]) & (f < hi[i])] = 1.0
    return bands


def stoi(est: np.ndarray, ref: np.ndarray, fs: int = 16000) -> float:
    """Short-time objective intelligibility (classic STOI, no extended mode).

    Follows Taal et al. 2011: 10 kHz resample via polyphase, 512-pt STFT with
    256 hop, 15 third-octave bands from 150 Hz, 384 ms (30-frame) segments,
    energy-based silence removal, clipped correlation.
    """
    import scipy.signal

    t = min(len(est), len(ref))
    est, ref = est[:t].astype(np.float64), ref[:t].astype(np.float64)
    if fs != 10000:
        g = math.gcd(fs, 10000)
        est = scipy.signal.resample_poly(est, 10000 // g, fs // g)
        ref = scipy.signal.resample_poly(ref, 10000 // g, fs // g)
    n_fft, hop, win_len = 512, 128, 256
    win = np.hanning(win_len + 2)[1:-1]

    # remove silent frames (40 dB below peak energy of ref)
    n_frames = 1 + (len(ref) - win_len) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win_len)[None, :]
    energies = 20 * np.log10(
        np.linalg.norm(ref[idx] * win, axis=-1) + 1e-12
    )
    keep = energies > energies.max() - 40.0
    if keep.sum() < 30:
        keep = np.ones_like(keep, bool)

    def rebuild(x):
        frames = x[idx] * win
        frames = frames[keep]
        out = np.zeros((len(frames) - 1) * hop + win_len)
        for i, fr in enumerate(frames):
            out[i * hop : i * hop + win_len] += fr
        return out

    est, ref = rebuild(est), rebuild(ref)

    spec_e = np.abs(_stft(est, n_fft, hop, np.hanning(n_fft + 2)[1:-1][:n_fft]))
    spec_r = np.abs(_stft(ref, n_fft, hop, np.hanning(n_fft + 2)[1:-1][:n_fft]))
    bands = _thirds_octave_bands(10000, n_fft)
    xe = np.sqrt((spec_e**2) @ bands.T + 1e-12)  # (T, bands)
    xr = np.sqrt((spec_r**2) @ bands.T + 1e-12)

    n = 30  # 384 ms segments
    if len(xr) < n:
        return 0.0
    corrs = []
    beta = 10 ** (-15 / 20)
    for m in range(n, len(xr) + 1):
        Xe, Xr = xe[m - n : m], xr[m - n : m]
        alpha = np.sqrt((Xr**2).sum(0) / ((Xe**2).sum(0) + 1e-12))
        Xe_n = np.minimum(Xe * alpha, Xr * (1 + beta))
        Xe_n = Xe_n - Xe_n.mean(0)
        Xr_c = Xr - Xr.mean(0)
        denom = np.linalg.norm(Xe_n, axis=0) * np.linalg.norm(Xr_c, axis=0)
        corrs.append(np.mean((Xe_n * Xr_c).sum(0) / (denom + 1e-12)))
    return float(np.mean(corrs))


def mcd(est: np.ndarray, ref: np.ndarray, fs: int = 16000, n_mfcc: int = 13,
        n_fft: int = 1024, hop: int = 256, n_mels: int = 40) -> float:
    """Mel-cepstral distance (dB) over aligned frames."""
    from ..ops import dsp
    import jax.numpy as jnp

    t = min(len(est), len(ref))

    def mfcc(x):
        mel = np.asarray(dsp.mel_spectrogram(
            jnp.asarray(x[None, :t].astype(np.float32)), fs, n_fft, n_fft,
            hop, 0.0, fs / 2, n_mels,
        ))[0]
        logm = np.log(mel + 1e-10)
        # DCT-II over mel axis
        k = np.arange(n_mels)
        basis = np.cos(np.pi / n_mels * (k[:, None] + 0.5) * np.arange(n_mfcc)[None])
        return logm.T @ basis  # (T, n_mfcc)

    ce, cr = mfcc(est), mfcc(ref)
    diff = ce[:, 1:] - cr[:, 1:]
    return float(
        np.mean(np.sqrt((diff**2).sum(-1))) * (10.0 / np.log(10)) * np.sqrt(2.0)
    )
