"""MusicGen-style delay pattern for multi-codebook AR modeling.

UniTok-audio (docs-only in the reference: UniTok-audio/index.html:305,
Figure/UniTok_audio_05.png) models the Nq=4 H-Codec RVQ streams with a 4-layer
delay pattern: codebook layer k is shifted right by k steps so that at
generation step t the model emits layer k's token for frame t-k, keeping all
layers causally consistent while decoding one step per frame.
"""
from __future__ import annotations

import jax.numpy as jnp


def apply_delay(codes: jnp.ndarray, pad_token: int) -> jnp.ndarray:
    """codes (B, T, K) -> delayed (B, T+K-1, K); layer k shifted right by k,
    holes filled with pad_token."""
    b, t, k = codes.shape
    out = jnp.full((b, t + k - 1, k), pad_token, dtype=codes.dtype)
    for layer in range(k):
        out = out.at[:, layer : layer + t, layer].set(codes[..., layer])
    return out


def undo_delay(delayed: jnp.ndarray) -> jnp.ndarray:
    """delayed (B, T+K-1, K) -> codes (B, T, K)."""
    b, tk, k = delayed.shape
    t = tk - k + 1
    cols = [delayed[:, layer : layer + t, layer] for layer in range(k)]
    return jnp.stack(cols, axis=-1)
