"""LSTM layers as lax.scan over time with fused batched gates.

The reference leans on cuDNN LSTMs (SLSTM in vq/conv.py:341-359, the hybrid
LSTM-fed attention in encoder_modules/transformer.py:115). On TPU an LSTM is a
scan whose per-step work is one (B, 4H) matmul — we precompute the input
projection for the whole sequence as a single large matmul (MXU-friendly) and
scan only the recurrent half.

Parameter layout matches torch.nn.LSTM (gate order i, f, g, o; separate
b_ih/b_hh) so checkpoint conversion is a transpose.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def lstm_scan(x, w_ih, w_hh, b_ih, b_hh):
    """Single-layer LSTM over (B, T, C) -> (B, T, H).

    w_ih: (C, 4H), w_hh: (H, 4H), biases (4H,), gate order (i, f, g, o).
    """
    hidden = w_hh.shape[0]
    # One big MXU matmul for all timesteps, then scan only the recurrence.
    x_proj = x @ w_ih + (b_ih + b_hh)  # (B, T, 4H)

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    b = x.shape[0]
    init = (
        jnp.zeros((b, hidden), dtype=x.dtype),
        jnp.zeros((b, hidden), dtype=x.dtype),
    )
    _, ys = jax.lax.scan(step, init, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


class LSTM(nn.Module):
    """Multi-layer unidirectional LSTM, torch.nn.LSTM-compatible params."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x):
        h = self.hidden_size
        for layer in range(self.num_layers):
            cin = x.shape[-1]
            w_ih = self.param(
                f"w_ih_l{layer}", nn.initializers.uniform(scale=h**-0.5), (cin, 4 * h)
            )
            w_hh = self.param(
                f"w_hh_l{layer}", nn.initializers.uniform(scale=h**-0.5), (h, 4 * h)
            )
            b_ih = self.param(f"b_ih_l{layer}", nn.initializers.zeros, (4 * h,))
            b_hh = self.param(f"b_hh_l{layer}", nn.initializers.zeros, (4 * h,))
            x = lstm_scan(x, w_ih, w_hh, b_ih, b_hh)
        return x


class SLSTM(nn.Module):
    """Skip-LSTM (HCodec vq/conv.py:341-359): y = x + LSTM(x). Channels-last."""

    dimension: int
    num_layers: int = 2
    skip: bool = True

    @nn.compact
    def __call__(self, x):
        y = LSTM(hidden_size=self.dimension, num_layers=self.num_layers, name="lstm")(x)
        return x + y if self.skip else y
