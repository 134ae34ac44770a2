"""L0 signal/DSP ops: STFT, ISTFT ("same" padding), mel filterbanks, MDCT/IMDCT,
windowed-sinc resampling.

TPU-native design notes
-----------------------
* Framing is a static gather (index matrix precomputed at trace time); the FFT
  is batched over all frames at once so XLA sees one large rfft.
* Overlap-add is done with ``hop | win`` as a static stack-shift-sum (r = win/hop
  shifted adds), not a scatter: scatters serialize on TPU, shifted adds fuse.
* Everything is shape-static and jit friendly; no data-dependent control flow.

Reference parity targets (documented, not copied):
* ISTFT "same" overlap-add with window-envelope normalization mirrors
  QuarkAudio-HCodec/HCodec-1.0/vq/spectral_ops.py:33-75.
* log-mel frontend mirrors QuarkAudio-UniSE/model/model.py:53-79.
* MDCT/IMDCT mirror spectral_ops.py:78-192.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (matches torch.hann_window default)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def cosine_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Symmetric cosine (sine) window (matches scipy.signal.windows.cosine)."""
    n = jnp.arange(win_length, dtype=dtype)
    return jnp.sin(jnp.pi / win_length * (n + 0.5))


# ---------------------------------------------------------------------------
# Framing / overlap-add
# ---------------------------------------------------------------------------

def frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slice ``x`` (..., T) into overlapping frames -> (..., n_frames, frame_length).

    Static gather; requires T >= frame_length.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length
        + np.arange(frame_length)[None, :]
    )
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add frames (..., T, L) with stride ``hop_length`` -> (..., (T-1)*hop+L).

    Requires hop_length | L. Implemented as r = L//hop shifted adds (TPU friendly;
    avoids scatter).
    """
    *batch, t, length = frames.shape
    assert length % hop_length == 0, (length, hop_length)
    r = length // hop_length
    chunks = frames.reshape(*batch, t, r, hop_length)
    out_t = t + r - 1
    acc = jnp.zeros((*batch, out_t, hop_length), dtype=frames.dtype)
    for j in range(r):
        pad = [(0, 0)] * len(batch) + [(j, out_t - t - j), (0, 0)]
        acc = acc + jnp.pad(chunks[..., j, :], pad)
    return acc.reshape(*batch, out_t * hop_length)


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------

def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT of (..., T) -> (..., n_freqs, n_frames). Matches torch.stft
    (onesided, normalized=False).
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pads = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pads, mode=pad_mode)
    frames = frame(x, n_fft, hop_length)  # (..., T, n_fft)
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., F, T)


def istft_same(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    window: Optional[jnp.ndarray] = None,
    eps: float = 1e-11,
) -> jnp.ndarray:
    """ISTFT with "same" padding for neural vocoding.

    Overlap-adds windowed irfft frames and normalizes by the window-square
    envelope, trimming (win-hop)//2 samples from both ends — functionally
    identical to the reference custom ISTFT (spectral_ops.py:33-75) which
    exists because torch.istft cannot do "same" padding.

    Args:
        spec: complex (B, N, T) spectrogram, N = n_fft//2+1.
    Returns:
        (B, (T-1)*hop + win - 2*pad) waveform, pad = (win-hop)//2;
        for T = L/hop frames this is exactly L samples.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    pad = (win_length - hop_length) // 2

    frames = jnp.fft.irfft(spec, n=n_fft, axis=-2)  # (B, n_fft, T)
    frames = frames * window[None, :, None]
    frames = jnp.swapaxes(frames, -1, -2)  # (B, T, n_fft)
    y = overlap_add(frames, hop_length)

    t = spec.shape[-1]
    wsq = jnp.broadcast_to((window * window)[None, :], (t, win_length))
    envelope = overlap_add(wsq, hop_length)
    y = y[..., pad:-pad] / jnp.maximum(envelope[pad:-pad], eps)
    return y


# ---------------------------------------------------------------------------
# Mel filterbanks (torchaudio-compatible)
# ---------------------------------------------------------------------------

def _hz_to_mel(freq, mel_scale: str):
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    if np.isscalar(freq):
        if freq >= min_log_hz:
            mels = min_log_mel + math.log(freq / min_log_hz) / logstep
        return mels
    log_t = freq >= min_log_hz
    mels = np.where(
        log_t, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz(mels, mel_scale: str):
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=32)
def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: Optional[str] = None,
    mel_scale: str = "htk",
) -> jnp.ndarray:
    """Triangular mel filterbank (n_freqs, n_mels); matches
    torchaudio.functional.melscale_fbanks semantics (UniSE uses defaults
    htk/no-norm; BiCodec mel uses slaney/slaney).
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(f_min, mel_scale)
    m_max = _hz_to_mel(f_max, mel_scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    # return host numpy: the lru_cache must never hold device arrays (a value
    # created inside one jit trace would leak into later traces)
    return fb.astype(np.float32)


def stft_logmel(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    sample_rate: int = 16000,
    f_max: float = 8000.0,
) -> jnp.ndarray:
    """Log-mel frontend mirroring UniSE Model.stft_logmel (model/model.py:53-79):
    pad to a hop multiple with "same" win padding, center=False STFT, magnitude,
    htk mel (no norm), log(x + 1e-10). x: (B, T) -> (B, T', n_mels).
    """
    t = x.shape[-1]
    pad_len = -(-t // hop_length) * hop_length - t
    side = (win_length - hop_length) // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(side, pad_len + side)])
    spec = stft(x, n_fft, hop_length, win_length, center=False)  # (B, F, T')
    mag = jnp.abs(spec)
    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, f_max, n_mels, sample_rate)
    mel = jnp.einsum("bft,fm->btm", mag, fb)
    return jnp.log(mel + 1e-10)


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    win_length: int,
    hop_length: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    power: float = 1.0,
) -> jnp.ndarray:
    """Slaney-norm mel spectrogram matching torchaudio.transforms.MelSpectrogram
    with power=1, norm="slaney", mel_scale="slaney" (BiCodec bicodec.py:201-221).
    x: (B, T) -> (B, n_mels, T').
    """
    spec = stft(x, n_fft, hop_length, win_length, center=True, pad_mode="reflect")
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag**power
    fb = melscale_fbanks(
        n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate, norm="slaney", mel_scale="slaney"
    )
    return jnp.einsum("bft,fm->bmt", mag, fb)


# ---------------------------------------------------------------------------
# MDCT / IMDCT (parity with spectral_ops.py:78-192; "same" or "center" padding)
# ---------------------------------------------------------------------------

def mdct(audio: jnp.ndarray, frame_len: int, padding: str = "same") -> jnp.ndarray:
    """(B, T) -> (B, L, N) MDCT coefficients, N = frame_len//2."""
    if padding == "center":
        pad = frame_len // 2
    elif padding == "same":
        pad = frame_len // 4
    else:
        raise ValueError("padding must be 'center' or 'same'")
    audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    n = frame_len // 2
    x = frame(audio, frame_len, n)  # (B, L, frame_len)
    window = cosine_window(frame_len, dtype=audio.dtype)
    x = x * window
    k = jnp.arange(frame_len)
    pre = jnp.exp(-1j * jnp.pi * k / frame_len)
    big_x = jnp.fft.fft(x * pre, axis=-1)[..., :n]
    n0 = (n + 1) / 2
    post = jnp.exp(-1j * jnp.pi * n0 * (jnp.arange(n) + 0.5) / n)
    res = big_x * post * np.sqrt(1 / n)
    return jnp.real(res) * np.sqrt(2)


def imdct(coeffs: jnp.ndarray, padding: str = "same") -> jnp.ndarray:
    """(B, L, N) -> (B, T) inverse MDCT."""
    *_, l, n = coeffs.shape
    frame_len = 2 * n
    big_y = jnp.concatenate(
        [coeffs, -jnp.conj(jnp.flip(coeffs, axis=-1))], axis=-1
    ).astype(jnp.complex64)
    n0 = (n + 1) / 2
    pre = jnp.exp(1j * jnp.pi * n0 * jnp.arange(2 * n) / n)
    post = jnp.exp(1j * jnp.pi * (jnp.arange(2 * n) + n0) / (2 * n))
    y = jnp.fft.ifft(big_y * pre, axis=-1)
    y = jnp.real(y * post) * np.sqrt(n) * np.sqrt(2)
    window = cosine_window(frame_len, dtype=y.dtype)
    y = y * window
    audio = overlap_add(y, n)  # (B, (L+1)*N)
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    return audio[..., pad:-pad]


# ---------------------------------------------------------------------------
# Resampling (windowed-sinc, torchaudio-compatible; used for 48k->16k in
# HCodec-2.0 audio_tokenizer.py:41,50 and bandwidth simulation)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _resample_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int, rolloff: float
):
    gcd = math.gcd(orig_freq, new_freq)
    orig_freq, new_freq = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None] / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t = np.clip(t * base_freq, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig_freq
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale
    # host numpy (see melscale_fbanks): cached device arrays leak tracers
    return kernels.astype(np.float32), width, orig_freq, new_freq


def resample(
    x: jnp.ndarray,
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> jnp.ndarray:
    """Polyphase windowed-sinc resampling of (..., T); the lowpass runs as one
    strided conv on the MXU (torchaudio.functional.resample semantics)."""
    if orig_freq == new_freq:
        return x
    kernels, width, o, n = _resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff
    )
    shape = x.shape
    t = shape[-1]
    x2 = x.reshape(-1, 1, t)
    x2 = jnp.pad(x2, [(0, 0), (0, 0), (width, width + o)])
    y = jax.lax.conv_general_dilated(
        x2,
        kernels[:, None, :],  # (out=n_phases, in=1, k)
        window_strides=(o,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, n, T//o + 1)
    y = jnp.swapaxes(y, -1, -2).reshape(x2.shape[0], -1)
    target_len = int(math.ceil(n * t / o))
    return y[..., :target_len].reshape(*shape[:-1], target_len)
