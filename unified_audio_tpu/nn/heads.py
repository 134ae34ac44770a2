"""Fourier reconstruction heads (HCodec vq/heads.py)."""
from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.dsp import istft_same


class ISTFTHead(nn.Module):
    """Linear -> (log-mag, phase) -> complex spectrum -> ISTFT-"same"
    (heads.py:23-66). Input (B, T, H) -> waveform (B, T * hop_length)."""

    n_fft: int
    hop_length: int

    @nn.compact
    def __call__(self, x):
        n = self.n_fft // 2 + 1
        out = nn.Dense(self.n_fft + 2, name="out")(x)  # (B, T, 2N)
        # fp32 island: under bf16 inference the exp/cos/sin and the complex
        # ISTFT run in fp32 regardless (bf16 phase wraps poorly; the FFT is
        # complex64 anyway) — a no-op on the fp32 path
        out = out.astype(jnp.float32)
        mag = jnp.exp(out[..., :n])
        mag = jnp.clip(mag, max=1e2)
        phase = out[..., n:]
        spec = mag * (jnp.cos(phase) + 1j * jnp.sin(phase))  # (B, T, N)
        spec = jnp.swapaxes(spec, -1, -2)  # (B, N, T)
        return istft_same(spec, self.n_fft, self.hop_length)
