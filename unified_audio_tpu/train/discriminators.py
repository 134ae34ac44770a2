"""GAN discriminators for codec training.

The reference ships only the GAN trainer *config* (HCodec-1.0
conf/config.yaml:49-109: opt_gen/opt_disc lr 2e-4, perceptual from step 400k,
1M steps) — the trainer itself is unreleased. We implement the standard codec
GAN ensemble those configs imply: HiFiGAN multi-period discriminators +
EnCodec-style multi-resolution complex-STFT discriminators.
Channels-last (B, T, 1) waveforms.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import dsp


class PeriodDiscriminator(nn.Module):
    """Reshape waveform into (T/p, p) frames and run strided 2-D convs."""

    period: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 1) -> pad to period multiple -> (B, T/p, p, 1)
        b, t, _ = x.shape
        p = self.period
        pad = (-t) % p
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(b, -1, p, 1)
        feats = []
        ch = 32
        for i in range(4):
            x = nn.Conv(min(ch, 1024), (5, 1), strides=(3, 1),
                        padding=((2, 2), (0, 0)), name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            feats.append(x)
            ch *= 4
        x = nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)), name="conv_post1")(x)
        x = nn.leaky_relu(x, 0.1)
        feats.append(x)
        score = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post2")(x)
        feats.append(score)
        return score.reshape(b, -1), feats


class STFTDiscriminator(nn.Module):
    """2-D convs over the complex STFT (real ‖ imag), EnCodec MS-STFT style."""

    n_fft: int
    hop_length: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 1)
        spec = dsp.stft(x[..., 0], self.n_fft, self.hop_length)  # (B, F, T')
        h = jnp.stack([spec.real, spec.imag], axis=-1)  # (B, F, T', 2)
        h = jnp.swapaxes(h, 1, 2)  # (B, T', F, 2)
        feats = []
        for i, (ch, stride) in enumerate([(32, (1, 1)), (32, (1, 2)),
                                          (32, (1, 2)), (32, (1, 2))]):
            h = nn.Conv(ch, (3, 9), strides=stride, name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        score = nn.Conv(1, (3, 3), name="conv_post")(h)
        feats.append(score)
        return score.reshape(x.shape[0], -1), feats


class CodecDiscriminator(nn.Module):
    """Ensemble: MPD (periods 2,3,5,7,11) + MS-STFT (3 resolutions)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    stft_resolutions: Sequence[Tuple[int, int]] = (
        (1024, 256), (2048, 512), (512, 128),
    )

    @nn.compact
    def __call__(self, x):
        scores, feats = [], []
        for p in self.periods:
            s, f = PeriodDiscriminator(p, name=f"mpd_{p}")(x)
            scores.append(s)
            feats.append(f)
        for n_fft, hop in self.stft_resolutions:
            s, f = STFTDiscriminator(n_fft, hop, name=f"stft_{n_fft}")(x)
            scores.append(s)
            feats.append(f)
        return scores, feats


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def discriminator_loss(real_scores, fake_scores):
    """LSGAN discriminator loss."""
    loss = 0.0
    for r, f in zip(real_scores, fake_scores):
        loss += jnp.mean((1.0 - r) ** 2) + jnp.mean(f**2)
    return loss / len(real_scores)


def generator_adversarial_loss(fake_scores):
    loss = 0.0
    for f in fake_scores:
        loss += jnp.mean((1.0 - f) ** 2)
    return loss / len(fake_scores)


def feature_matching_loss(real_feats, fake_feats):
    """L1 between discriminator feature maps; real side is a constant target."""
    loss = 0.0
    n = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f))
            n += 1
    return loss / max(n, 1)


def multiscale_mel_loss(
    real: jnp.ndarray,
    fake: jnp.ndarray,
    sample_rate: int = 16000,
    n_ffts: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
    n_mels: int = 80,
) -> jnp.ndarray:
    """DAC-style multi-scale log-mel L1 (real/fake: (B, T))."""
    loss = 0.0
    for n_fft in n_ffts:
        hop = n_fft // 4
        mels = min(n_mels, n_fft // 2)
        mr = dsp.mel_spectrogram(real, sample_rate, n_fft, n_fft, hop, 0.0,
                                 sample_rate / 2, mels)
        mf = dsp.mel_spectrogram(fake, sample_rate, n_fft, n_fft, hop, 0.0,
                                 sample_rate / 2, mels)
        loss += jnp.mean(jnp.abs(jnp.log(mr + 1e-5) - jnp.log(mf + 1e-5)))
    return loss / len(n_ffts)
