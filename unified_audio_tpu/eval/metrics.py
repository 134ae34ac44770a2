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

    Follows Taal et al. 2011: 10 kHz polyphase resample, 512-pt FFT over
    256-sample Hann frames at 128 hop (the paper's 50%-overlap convention,
    same framing as pystoi), 15 third-octave bands from 150 Hz, 384 ms
    (30-frame) segments, energy-based silence removal, clipped correlation.

    Caveat: this is a from-scratch implementation (no STOI wheel in this
    image) — use for relative comparisons and regression gates; small
    deviations from pystoi (band-edge rounding, silence-threshold details)
    are possible, so don't quote values against published STOI tables
    without a cross-check.
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


# ---------------------------------------------------------------------------
# PESQ (ITU-T P.862 perceptual model) + P.862.1 MOS-LQO mapping
# ---------------------------------------------------------------------------

def _bark_scale(f_hz: np.ndarray) -> np.ndarray:
    """Zwicker & Terhardt critical-band rate (Bark)."""
    return (13.0 * np.arctan(0.00076 * f_hz)
            + 3.5 * np.arctan((f_hz / 7500.0) ** 2))


# Zwicker (1961) critical-band edge frequencies in Hz — the standard
# critical-band table the P.862 Bark axis is built on. Band index n is the
# critical-band rate in Bark at edge n.
_ZWICKER_EDGES_HZ = np.array([
    0, 100, 200, 300, 400, 510, 630, 770, 920, 1080, 1270, 1480, 1720,
    2000, 2320, 2700, 3150, 3700, 4400, 5300, 6400, 7700, 9500, 12000,
    15500,
], dtype=np.float64)


def _bark_from_table(f_hz: np.ndarray) -> np.ndarray:
    """Critical-band rate from the Zwicker table (linear interpolation
    between edges; the table IS the Bark axis, index n <-> n Bark)."""
    return np.interp(f_hz, _ZWICKER_EDGES_HZ,
                     np.arange(len(_ZWICKER_EDGES_HZ), dtype=np.float64))


def _bark_filterbank(fs: int, n_fft: int):
    """Rectangular Bark-band integration matrix (num_bands, n_fft//2+1) plus
    per-band widths (in Bark) for norm weighting.

    Band edges come from the standard Zwicker critical-band table
    interpolated to HALF-Bark resolution up to fs/2 (the P.862 banding
    strategy; for fs=16000 this yields 43 bands over 0-8 kHz vs the ITU C
    table's 49 — same axis, slightly coarser tail resolution)."""
    f = np.linspace(0, fs / 2, n_fft // 2 + 1)
    z = _bark_from_table(f)
    z_max = float(_bark_from_table(np.array(fs / 2.0)))
    num_bands = int(np.floor(z_max / 0.5))
    edges = np.arange(num_bands + 1) * 0.5
    bank = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        sel = (z >= edges[i]) & (z < edges[i + 1])
        if sel.any():
            bank[i, sel] = 1.0 / sel.sum()  # mean power in band
    widths = np.diff(edges)
    centers = 0.5 * (edges[:-1] + edges[1:])
    return bank, widths, centers


def _irs_receive_filter(x: np.ndarray, fs: int) -> np.ndarray:
    """Modified-IRS receive characteristic (P.830 Annex D shape,
    approximate) as a frequency-sampled linear-phase FIR — the P.862
    narrowband input filter. P.862.2 WIDEBAND mode (fs >= 16000, this
    framework's operating rate) specifies NO IRS filtering, only the 100 Hz
    high-pass, so this runs for narrowband inputs only."""
    import scipy.signal

    freqs = np.array([0, 100, 200, 300, 500, 1000, 2000, 3000, 3400,
                      3700, 4000], dtype=np.float64)
    gains_db = np.array([-80, -35, -16, -5, -1.5, 0, 2.5, 3.0, 1.0,
                         -8, -40], dtype=np.float64)
    grid = np.linspace(0, fs / 2, 129)
    mag = 10 ** (np.interp(grid, freqs, gains_db,
                           right=gains_db[-1]) / 20.0)
    taps = scipy.signal.firwin2(255, grid, mag, fs=fs)
    return scipy.signal.lfilter(taps, [1.0], x)


def _bark_hearing_threshold(centers_bark: np.ndarray) -> np.ndarray:
    """Absolute hearing threshold per Bark band (power units, approximated
    from the ISO 226 / Terhardt threshold-in-quiet curve)."""
    # invert the Bark warp (Zwicker table axis) to get center frequency
    cf = np.interp(centers_bark,
                   np.arange(len(_ZWICKER_EDGES_HZ), dtype=np.float64),
                   _ZWICKER_EDGES_HZ)
    # Terhardt threshold in quiet (dB SPL)
    thr_db = (3.64 * (cf / 1000.0) ** -0.8
              - 6.5 * np.exp(-0.6 * (cf / 1000.0 - 3.3) ** 2)
              + 1e-3 * (cf / 1000.0) ** 4)
    return 10.0 ** (np.clip(thr_db, -20, 60) / 10.0)


def _align_utterance(est: np.ndarray, ref: np.ndarray, fs: int):
    """P.862-style two-stage utterance time alignment.

    Coarse: cross-correlate 4 ms energy envelopes (the standard's
    envelope-based utterance alignment). Fine: full-band waveform
    cross-correlation within +/-5 ms of the coarse lag. Returns the pair
    trimmed to the common aligned span."""
    import scipy.signal

    t = min(len(est), len(ref))
    est, ref = est[:t], ref[:t]
    hop = max(int(0.004 * fs), 1)
    n = t // hop
    if n < 4:
        return est, ref
    env_e = (est[: n * hop].reshape(n, hop) ** 2).sum(-1)
    env_r = (ref[: n * hop].reshape(n, hop) ** 2).sum(-1)
    xc = scipy.signal.correlate(env_e - env_e.mean(),
                                env_r - env_r.mean(), "full")
    coarse = (np.argmax(xc) - (n - 1)) * hop  # est lags ref by `coarse`

    span = int(0.005 * fs)
    lo, hi = coarse - span, coarse + span
    best_lag, best_val = coarse, -np.inf
    for lag in range(lo, hi + 1):
        if lag >= 0:
            a, b = est[lag:], ref[: t - lag]
        else:
            a, b = est[: t + lag], ref[-lag:]
        m = min(len(a), len(b))
        if m < fs // 100:
            continue
        v = float(np.dot(a[:m], b[:m]) / (
            np.linalg.norm(a[:m]) * np.linalg.norm(b[:m]) + 1e-12))
        if v > best_val:
            best_val, best_lag = v, lag
    lag = best_lag
    if lag > 0:
        est, ref = est[lag:], ref[: t - lag]
    elif lag < 0:
        est, ref = est[: t + lag], ref[-lag:]
    return est, ref


def pesq(est: np.ndarray, ref: np.ndarray, fs: int = 16000,
         assume_aligned: bool = False) -> float:
    """PESQ raw score following the ITU-T P.862 perceptual model.

    Implements the standard's perceptual chain from scratch in numpy (the
    reference pins the torch-pesq wheel, requirements.txt, not available in
    this image): utterance time alignment (envelope cross-correlation
    coarse + waveform fine, default ON), input filtering (modified-IRS
    receive for narrowband; P.862.2 wideband mode = 100 Hz high-pass only),
    active-speech level alignment, 32 ms Hann frames at 50% overlap,
    Bark-band power integration on the Zwicker critical-band table at
    half-Bark resolution, partial frequency- and short-term
    gain-compensation, Zwicker-law loudness transform, center-clipped
    disturbance with asymmetry weighting, and the standard's two-stage
    (L6 over 320 ms "syllables", L2 over time) aggregation into
    ``4.5 - 0.1*D - 0.0309*DA``.

    Remaining deviations (numerical, documented): the alignment is
    single-interval (no per-utterance splitting of long recordings), the
    narrowband IRS magnitude grid approximates the P.830 curve within a
    couple of dB, and band-tail resolution is half-Bark rather than the ITU
    C table's 49 entries. Scores correlate with, but are not bit-exact to,
    ITU reference PESQ; use for relative comparisons and regression gating.
    ``assume_aligned=True`` skips the alignment search (valid for this
    framework's codec round trips, which are sample-aligned by
    construction). Returns the raw P.862 score (~[-0.5, 4.5]).
    """
    import scipy.signal

    if not assume_aligned:
        est, ref = _align_utterance(np.asarray(est, np.float64),
                                    np.asarray(ref, np.float64), fs)

    t = min(len(est), len(ref))
    est = np.asarray(est[:t], np.float64)
    ref = np.asarray(ref[:t], np.float64)

    if fs <= 8000:
        # narrowband P.862: modified-IRS receive filtering
        est = _irs_receive_filter(est, fs)
        ref = _irs_receive_filter(ref, fs)
    # 100 Hz high-pass (P.862.2 wideband input filter; also removes DC/hum
    # ahead of the narrowband IRS path)
    sos = scipy.signal.butter(4, 100.0, "highpass", fs=fs, output="sos")
    est = scipy.signal.sosfilt(sos, est)
    ref = scipy.signal.sosfilt(sos, ref)

    # active-speech level alignment to a common target power
    def active_power(x):
        frame = int(0.032 * fs)
        n = len(x) // frame
        if n == 0:
            return float(np.mean(x**2) + 1e-12)
        p = (x[: n * frame].reshape(n, frame) ** 2).mean(-1)
        thr = p.max() * 1e-4  # 40 dB activity threshold
        act = p[p > thr]
        return float(act.mean() if act.size else p.mean()) + 1e-12

    target = 1e-2
    est = est * math.sqrt(target / active_power(est))
    ref = ref * math.sqrt(target / active_power(ref))

    n_fft = int(0.032 * fs)
    hop = n_fft // 2
    win = np.hanning(n_fft)
    if len(ref) < n_fft:
        return 4.5
    pe = np.abs(_stft(est, n_fft, hop, win)) ** 2  # (T, F)
    pr = np.abs(_stft(ref, n_fft, hop, win)) ** 2

    bank, widths, centers = _bark_filterbank(fs, n_fft)
    be = pe @ bank.T  # (T, B) Bark-band powers
    br = pr @ bank.T

    # normalize to a pseudo-SPL scale where the hearing threshold applies
    thr = _bark_hearing_threshold(centers)
    scale = 1e8  # target=1e-2 power ~ 78 dB pseudo-SPL
    be = be * scale
    br = br * scale

    # speech-active frames of the reference drive the compensations
    frame_pow = br.sum(-1)
    active = frame_pow > frame_pow.max() * 1e-3

    # partial frequency compensation: per-band ratio (bounded), applied to ref
    mean_e = be[active].mean(0) + 1e3
    mean_r = br[active].mean(0) + 1e3
    band_ratio = np.clip(mean_e / mean_r, 0.01, 100.0)
    br_eq = br * band_ratio[None]

    # short-term gain compensation (bounded), applied to degraded
    g = (br_eq.sum(-1) + 5e3) / (be.sum(-1) + 5e3)
    g = np.clip(g, 3e-4, 5.0)
    # first-order smoothing along time (the standard's gain tracker)
    for i in range(1, len(g)):
        g[i] = 0.8 * g[i - 1] + 0.2 * g[i]
    be_eq = be * g[:, None]

    # Zwicker loudness
    def loudness(b):
        p0 = thr[None]
        sl = ((p0 / 0.5) ** 0.23) * (
            np.maximum(0.5 + 0.5 * b / p0, 0.5) ** 0.23 - 1.0
        )
        return np.maximum(sl, 0.0) * 32.0

    le = loudness(be_eq)
    lr = loudness(br_eq)

    # center-clipped disturbance
    deadzone = 0.25 * np.minimum(le, lr)
    d = np.maximum(np.abs(le - lr) - deadzone, 0.0)

    # asymmetry factor: added distortion hurts more than attenuation
    asym = ((be_eq + 50.0) / (br_eq + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))
    da = d * asym

    # frame disturbances: width-weighted norms over bands
    w = widths[None]
    d_frame = np.sqrt(((d * w) ** 2).sum(-1)) / w.sum()
    da_frame = (da * w).sum(-1) / w.sum()
    # emphasize audible frames, de-emphasize silence
    weight = ((frame_pow + 1e5) / 1e7) ** 0.04
    d_frame = np.minimum(d_frame / weight, 45.0)
    da_frame = np.minimum(da_frame / weight, 45.0)

    def two_stage(x, p1, p2, chunk=20):  # L_p1 within 320 ms, L_p2 across
        n = max(len(x) // chunk, 1)
        pads = n * chunk - len(x)
        xx = np.pad(x, (0, max(pads, 0)))[: n * chunk].reshape(n, chunk)
        per = (np.mean(xx ** p1, -1)) ** (1.0 / p1)
        return float((np.mean(per ** p2)) ** (1.0 / p2))

    d_total = two_stage(d_frame, 6.0, 2.0)
    da_total = two_stage(da_frame, 1.0, 2.0)

    raw = 4.5 - 0.1 * d_total - 0.0309 * da_total
    return float(np.clip(raw, -0.5, 4.5))


def pesq_mos_lqo(raw_pesq: float) -> float:
    """ITU-T P.862.1 mapping from raw PESQ to MOS-LQO."""
    return 0.999 + (4.999 - 0.999) / (
        1.0 + math.exp(-1.4945 * raw_pesq + 4.6607)
    )


def utmos_proxy(x: np.ndarray, fs: int = 16000) -> float:
    """Reference-free MOS proxy in the role UTMOS plays in BASELINE.md.

    UTMOS is a learned SSL-based MOS predictor whose weights are not
    available in this image, so this is a DOCUMENTED heuristic stand-in
    built from interpretable signal features: (a) estimated SNR from
    noise-floor tracking (10th-percentile band energy), (b) spectral
    flatness of the noise floor, (c) clipping fraction. Calibrated so clean
    wide-band speech scores ~4.2-4.5 and heavily degraded speech scores
    <2.5. Use ONLY for relative regression tracking — values are not
    comparable to published UTMOS numbers.
    """
    x = np.asarray(x, np.float64)
    x = x / (np.abs(x).max() + 1e-9)
    n_fft, hop = 512, 256
    if len(x) < n_fft:
        return 1.0
    win = np.hanning(n_fft)
    spec = np.abs(_stft(x, n_fft, hop, win)) ** 2  # (T, F)
    band = spec[:, 2:].mean(-1) + 1e-12

    floor = np.quantile(band, 0.10)
    speech = np.quantile(band, 0.90)
    snr_db = 10 * np.log10(speech / floor)

    # spectral flatness of the quietest decile frames (hiss/music noise)
    quiet = spec[band <= np.quantile(band, 0.10) * 1.01][:, 2:] + 1e-12
    flat = float(np.exp(np.mean(np.log(quiet))) / np.mean(quiet)) \
        if len(quiet) else 0.0

    clip_frac = float(np.mean(np.abs(x) > 0.985))

    score = 1.0 + 3.5 / (1.0 + math.exp(-(snr_db - 18.0) / 6.0))
    score -= 1.5 * flat          # flat (white) noise floor -> noisy signal
    score -= 20.0 * clip_frac    # clipping artifacts
    return float(np.clip(score, 1.0, 5.0))


def utmos(x: np.ndarray, fs: int = 16000, predictor=None):
    """UTMOS score -> (score, variant). With a learned predictor
    (eval/utmos.UTMOSPredictor, converted weights) the published-comparable
    path runs; otherwise the documented signal-feature proxy
    (:func:`utmos_proxy`). The variant string is surfaced by the eval
    runner so reports always say which produced the number."""
    if predictor is not None:
        return float(predictor(np.asarray(x, np.float32))), "utmos_learned"
    return utmos_proxy(x, fs), "utmos_proxy"


def wer(hyp: str, ref: str) -> float:
    """Word error rate = (S + D + I) / N via Levenshtein alignment over
    whitespace tokens (the WER column of the H-Codec results table;
    the reference pins ``jiwer`` for this, requirements.txt). Transcripts
    come from any ASR the deployment has — none ships in this image, so
    this scores (hypothesis, reference) text pairs."""
    h = hyp.split()
    r = ref.split()
    if not r:
        return 0.0 if not h else float(len(h))
    prev = list(range(len(h) + 1))
    for i, rw in enumerate(r, 1):
        cur = [i] + [0] * len(h)
        for j, hw in enumerate(h, 1):
            cur[j] = min(prev[j] + 1,          # deletion
                         cur[j - 1] + 1,       # insertion
                         prev[j - 1] + (rw != hw))  # substitution
        prev = cur
    return prev[-1] / len(r)


def spk_sim(emb_est: np.ndarray, emb_ref: np.ndarray) -> float:
    """Speaker similarity = cosine of two speaker embeddings (the SPK-SIM
    column of the H-Codec results table, BASELINE.md / SURVEY §6).

    The published number uses a pretrained speaker-verification model; this
    function scores ANY embedding pair — pair it with
    :func:`make_spk_embed_fn` (the package's ECAPA-TDNN x-vector branch,
    models/bicodec/speaker.py) once trained/converted weights are loaded.
    """
    a = np.asarray(emb_est, np.float64).reshape(-1)
    b = np.asarray(emb_ref, np.float64).reshape(-1)
    denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
    return float(np.dot(a, b) / denom)


def make_spk_embed_fn(bicodec, variables, window_seconds: float = 10.0,
                      fs: int = 16000):
    """wav (1, T) float -> x-vector (E,) through BiCodec's mel frontend and
    ECAPA-TDNN speaker encoder (bicodec.py:189).

    Utterances are tiled/cropped to a FIXED ``window_seconds`` analysis
    window (speaker embeddings are length-insensitive at these durations),
    so the jitted program compiles ONCE regardless of input length —
    variable shapes would recompile per utterance, minutes each on
    remote-compiled backends."""
    import jax
    import jax.numpy as jnp

    win = int(window_seconds * fs)

    @jax.jit
    def _emb(wav):
        def f(m, w):
            xv, _ = m.speaker_encoder(m.mel(w), False)
            return xv

        return bicodec.apply(variables, wav, method=f)

    def embed(wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        t = wav.shape[-1]
        if t < win:
            reps = -(-win // t)
            wav = np.tile(wav, (1, reps))
        wav = wav[:, :win]
        return np.asarray(_emb(jnp.asarray(wav)))[0]

    return embed


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
