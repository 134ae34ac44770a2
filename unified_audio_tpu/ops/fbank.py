"""Kaldi-compatible fbank frontend: the FlexiCodec semantic teacher's exact
feature chain (funasr ``WavFrontend``), reproduced parameter-for-parameter.

The reference's SenseVoice teacher consumes features produced by
``funasr.frontends.wav_frontend.WavFrontend(cmvn_file=am.mvn, n_mels=80,
frame_length=25, frame_shift=10, lfr_m=7, lfr_n=6)``
(QuarkAudio-HCodec/HCodec-1.5/adaptive/feature_extractors.py:8-28). funasr is
not in this image, so the chain is re-implemented here from the Kaldi feature
spec it wraps:

1. **Kaldi fbank** (torchaudio.compliance.kaldi semantics, snip_edges=True):
   int16-range scaling (x * 2**15), optional dither, per-frame DC removal,
   0.97 pre-emphasis with the first-sample self-subtraction quirk, symmetric
   Hamming window, zero-pad to the next pow2 FFT, power spectrum, Kaldi-style
   triangular mel banks (HTK mel scale, low 20 Hz, high = Nyquist),
   ``log(max(., float32_eps))``.
2. **LFR stacking** (low frame rate): left-pad ``(m-1)//2`` copies of the
   first frame, stack windows of ``lfr_m`` frames at stride ``lfr_n``
   (out length ``ceil(T / n)``), tail windows padded by repeating the last
   frame — exactly funasr's ``apply_lfr``.
3. **CMVN**: ``(x + addshift) * rescale`` with the stats parsed from a Kaldi
   nnet text file (``<AddShift>`` / ``<Rescale>`` rows of ``am.mvn``) —
   exactly funasr's ``apply_cmvn``/``load_cmvn``.

Everything on the device path is shape-static and jittable: framing and LFR
are precomputed index gathers, the FFT is one batched rfft (MXU/VPU friendly,
no per-frame loops). The CMVN file parse is host-side numpy.
"""
from __future__ import annotations

import math
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FLOAT32_EPS = float(np.finfo(np.float32).eps)  # 1.1920929e-07, kaldi's floor


# ---------------------------------------------------------------------------
# Mel banks (Kaldi / HTK scale — differs from the Slaney banks in ops.dsp)
# ---------------------------------------------------------------------------

def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


def kaldi_mel_banks(num_bins: int, fft_size: int, sample_rate: float,
                    low_freq: float = 20.0,
                    high_freq: float = 0.0) -> np.ndarray:
    """Kaldi triangular mel filterbank, shape (num_bins, fft_size//2 + 1).

    ``high_freq <= 0`` means Nyquist + high_freq (Kaldi convention). Weights
    are computed on bins ``0..fft_size//2 - 1``; the Nyquist bin gets weight 0
    (kaldi computes fbanks on the half-open spectrum).
    """
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    if not (0.0 <= low_freq < high_freq <= nyquist):
        raise ValueError(f"bad mel range [{low_freq}, {high_freq}]")
    num_fft_bins = fft_size // 2
    fft_bin_width = sample_rate / fft_size
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_mels = _mel(fft_bin_width * np.arange(num_fft_bins))  # (F,)
    left = mel_low + np.arange(num_bins)[:, None] * mel_delta
    center = left + mel_delta
    right = center + mel_delta
    up = (bin_mels[None, :] - left) / mel_delta
    down = (right - bin_mels[None, :]) / mel_delta
    weights = np.maximum(0.0, np.minimum(up, down)).astype(np.float32)
    # append the zero-weight Nyquist column so the bank multiplies a full
    # rfft power spectrum
    return np.concatenate(
        [weights, np.zeros((num_bins, 1), np.float32)], axis=1)


def _hamming(window_size: int) -> np.ndarray:
    """Symmetric Hamming (kaldi feature-window.cc: a = 2*pi/(M-1))."""
    i = np.arange(window_size, dtype=np.float64)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * i / (window_size - 1))
            ).astype(np.float32)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


# ---------------------------------------------------------------------------
# Kaldi fbank
# ---------------------------------------------------------------------------

def kaldi_fbank(wav: jnp.ndarray,
                sample_rate: int = 16000,
                num_mel_bins: int = 80,
                frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0,
                dither: float = 0.0,
                preemphasis: float = 0.97,
                remove_dc_offset: bool = True,
                low_freq: float = 20.0,
                high_freq: float = 0.0,
                int16_scale: bool = True,
                rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Kaldi-compatible log-mel fbank of a mono waveform in [-1, 1].

    ``wav``: (..., N) float. Returns (..., T, num_mel_bins) with
    ``T = 1 + (N - window) // shift`` (snip_edges framing). ``dither > 0``
    requires ``rng`` (funasr trains with dither=1.0 on the int16 scale; leave
    0 for deterministic eval parity). ``int16_scale`` applies the ``x * 2**15``
    scaling funasr performs before calling kaldi fbank.
    """
    window_size = int(sample_rate * frame_length_ms / 1000.0)
    shift = int(sample_rate * frame_shift_ms / 1000.0)
    fft_size = _next_pow2(window_size)
    n = wav.shape[-1]
    num_frames = 1 + (n - window_size) // shift
    if num_frames < 1:
        raise ValueError(f"waveform too short: {n} < {window_size}")

    x = wav.astype(jnp.float32)
    if int16_scale:
        x = x * 32768.0

    # static-gather framing (one big take along the last axis)
    idx = (np.arange(num_frames)[:, None] * shift
           + np.arange(window_size)[None, :])          # (T, W)
    frames = jnp.take(x, jnp.asarray(idx), axis=-1)     # (..., T, W)

    if dither > 0.0:
        if rng is None:
            raise ValueError("dither > 0 requires rng")
        frames = frames + dither * jax.random.normal(
            rng, frames.shape, dtype=frames.dtype)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        # row[0] -= k*row[0]; row[i] -= k*row[i-1]  (kaldi edge quirk)
        prev = jnp.concatenate(
            [frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev

    frames = frames * jnp.asarray(_hamming(window_size))
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2   # (..., T, F/2+1)

    banks = jnp.asarray(
        kaldi_mel_banks(num_mel_bins, fft_size, float(sample_rate),
                        low_freq, high_freq))
    mel = jnp.einsum("...tf,mf->...tm", power, banks)
    return jnp.log(jnp.maximum(mel, _FLOAT32_EPS))


# ---------------------------------------------------------------------------
# LFR + CMVN (funasr wav_frontend semantics)
# ---------------------------------------------------------------------------

def apply_lfr(feats: jnp.ndarray, lfr_m: int = 7,
              lfr_n: int = 6) -> jnp.ndarray:
    """Low-frame-rate stacking: (..., T, D) -> (..., ceil(T/n), m*D).

    funasr's ``apply_lfr``: left-pad ``(m-1)//2`` copies of frame 0, take
    windows of ``m`` frames at stride ``n``, and pad tail windows by
    repeating the final frame. With static T every index is static, so this
    lowers to one gather + reshape.
    """
    t = feats.shape[-2]
    d = feats.shape[-1]
    t_lfr = math.ceil(t / lfr_n)
    left = (lfr_m - 1) // 2
    t_padded = t + left
    # window index into the left-padded sequence; clamping to the last row
    # reproduces the repeat-last-frame tail padding exactly
    idx = (np.arange(t_lfr)[:, None] * lfr_n
           + np.arange(lfr_m)[None, :])                 # (T_lfr, m)
    idx = np.minimum(idx, t_padded - 1)
    # map back into the unpadded sequence: padded row j < left is frame 0
    idx = np.maximum(idx - left, 0)
    stacked = jnp.take(feats, jnp.asarray(idx), axis=-2)  # (..., T_lfr, m, D)
    return stacked.reshape(*feats.shape[:-2], t_lfr, lfr_m * d)


def load_kaldi_cmvn(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Parse a Kaldi nnet-text CMVN file (``am.mvn``) -> (addshift, rescale).

    The file carries ``<AddShift> d d ... <LearnRateCoef> 0 [ v... ]`` and a
    matching ``<Rescale>`` block (funasr ``load_cmvn``); normalization is
    ``(x + addshift) * rescale``.
    """
    with open(path) as f:
        text = f.read()

    def _block(tag):
        m = re.search(re.escape(tag) + r".*?\[([^\]]*)\]", text, flags=re.S)
        if m is None:
            raise ValueError(f"{tag} block not found in {path}")
        return np.array([float(v) for v in m.group(1).split()],
                        dtype=np.float32)

    addshift = _block("<AddShift>")
    rescale = _block("<Rescale>")
    if addshift.shape != rescale.shape:
        raise ValueError(
            f"CMVN dim mismatch: {addshift.shape} vs {rescale.shape}")
    return addshift, rescale


def apply_cmvn(feats: jnp.ndarray, addshift: np.ndarray,
               rescale: np.ndarray) -> jnp.ndarray:
    """funasr ``apply_cmvn``: ``(x + means) * vars`` along the last dim."""
    return (feats + jnp.asarray(addshift)) * jnp.asarray(rescale)


class SenseVoiceFrontend:
    """The FlexiCodec teacher's full feature chain, ready to jit.

    Equivalent to funasr ``WavFrontend(cmvn_file, n_mels=80, frame_length=25,
    frame_shift=10, lfr_m=7, lfr_n=6)`` as instantiated by the reference
    (feature_extractors.py:13-21). Output dim = ``n_mels * lfr_m`` (560).
    ``cmvn_file`` is the reference's ``am.mvn`` (stats artifact, loaded — not
    vendored); pass ``None`` to skip normalization.
    """

    def __init__(self, cmvn_file: Optional[str] = None, n_mels: int = 80,
                 frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                 lfr_m: int = 7, lfr_n: int = 6, dither: float = 0.0,
                 sample_rate: int = 16000):
        self.n_mels, self.lfr_m, self.lfr_n = n_mels, lfr_m, lfr_n
        self.frame_length_ms, self.frame_shift_ms = (frame_length_ms,
                                                     frame_shift_ms)
        self.dither, self.sample_rate = dither, sample_rate
        self.cmvn = load_kaldi_cmvn(cmvn_file) if cmvn_file else None
        if self.cmvn is not None and self.cmvn[0].shape[0] != n_mels * lfr_m:
            raise ValueError(
                f"CMVN dim {self.cmvn[0].shape[0]} != n_mels*lfr_m "
                f"{n_mels * lfr_m}")

    @property
    def output_dim(self) -> int:
        return self.n_mels * self.lfr_m

    def __call__(self, wav: jnp.ndarray,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """(..., N) waveform in [-1, 1] -> (..., ceil(T/lfr_n), 560)."""
        feats = kaldi_fbank(
            wav, sample_rate=self.sample_rate, num_mel_bins=self.n_mels,
            frame_length_ms=self.frame_length_ms,
            frame_shift_ms=self.frame_shift_ms, dither=self.dither, rng=rng)
        feats = apply_lfr(feats, self.lfr_m, self.lfr_n)
        if self.cmvn is not None:
            feats = apply_cmvn(feats, *self.cmvn)
        return feats
