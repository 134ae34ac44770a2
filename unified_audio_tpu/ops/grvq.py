"""AutoGroup (residual) vector quantization — HCodec-2.0 vq/auto_grvq.py
(defined-but-unused in the reference; provided for capability parity).

Two parallel factorized cosine-NN codebooks (HiFi-Codec grouped quantization)
whose outputs concatenate back to the input width, with optional inter-frame
temporal residual coding (delta along time before quantization, cumulative sum
after). A residual stack wraps N of these (AutoGroupResidualVectorQuantize,
auto_grvq.py:~200+).

TPU notes: temporal residual coding is jnp.diff / cumsum (the reference's
in-place Python-for-over-frames loops don't trace); group codes fuse into one
index as ``a * codebook_size + b`` exactly as the reference does.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.conv import Conv1d
from .quant import cosine_nearest_code


class AutoGroupVectorQuantize(nn.Module):
    """z (B, T, D) -> dict(z_q, commitment_loss, codebook_loss, indices)."""

    input_dim: int
    codebook_size: int
    codebook_dim: int
    frame_residual_vq: bool = False

    def setup(self):
        self.in_proj_a = Conv1d(self.codebook_dim, 1, padding=0,
                                weight_norm=True, name="in_proj_a")
        self.in_proj_b = Conv1d(self.codebook_dim, 1, padding=0,
                                weight_norm=True, name="in_proj_b")
        self.out_proj_a = Conv1d(self.input_dim // 2, 1, padding=0,
                                 weight_norm=True, name="out_proj_a")
        self.out_proj_b = Conv1d(self.input_dim // 2, 1, padding=0,
                                 weight_norm=True, name="out_proj_b")
        self.codebook_a = self.param(
            "codebook_a", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )
        self.codebook_b = self.param(
            "codebook_b", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )

    @staticmethod
    def _temporal_delta(z):
        """z[t] -= z[t-1] for t > 0 (vectorized diff, keeps frame 0)."""
        return jnp.concatenate([z[:, :1], z[:, 1:] - z[:, :-1]], axis=1)

    @staticmethod
    def _temporal_cumsum(z):
        return jnp.cumsum(z, axis=1)

    def _quantize_group(self, z_g, codebook):
        idx = cosine_nearest_code(z_g, codebook)
        return jnp.take(codebook, idx, axis=0), idx

    def __call__(self, z, train: bool = False):
        if self.frame_residual_vq:
            z = self._temporal_delta(z)
        z_a = self.in_proj_a(z)
        z_b = self.in_proj_b(z)
        z_aq, idx_a = self._quantize_group(z_a, self.codebook_a)
        z_bq, idx_b = self._quantize_group(z_b, self.codebook_b)

        sg = jax.lax.stop_gradient
        commitment = (
            jnp.mean(jnp.square(z_a - sg(z_aq)), axis=(1, 2))
            + jnp.mean(jnp.square(z_b - sg(z_bq)), axis=(1, 2))
        )
        codebook_loss = (
            jnp.mean(jnp.square(z_aq - sg(z_a)), axis=(1, 2))
            + jnp.mean(jnp.square(z_bq - sg(z_b)), axis=(1, 2))
        )
        z_aq = z_a + sg(z_aq - z_a)
        z_bq = z_b + sg(z_bq - z_b)
        z_q = jnp.concatenate(
            [self.out_proj_a(z_aq), self.out_proj_b(z_bq)], axis=-1
        )
        if self.frame_residual_vq:
            z_q = self._temporal_cumsum(z_q)
        indices = idx_a * self.codebook_size + idx_b
        return {
            "z_q": z_q,
            "commitment_loss": commitment,
            "codebook_loss": codebook_loss,
            "indices": indices,
        }

    def decode_indices(self, indices):
        idx_a = indices // self.codebook_size
        idx_b = indices % self.codebook_size
        z_aq = self.out_proj_a(jnp.take(self.codebook_a, idx_a, axis=0))
        z_bq = self.out_proj_b(jnp.take(self.codebook_b, idx_b, axis=0))
        z_q = jnp.concatenate([z_aq, z_bq], axis=-1)
        if self.frame_residual_vq:
            z_q = self._temporal_cumsum(z_q)
        return z_q


class AutoGroupResidualVectorQuantize(nn.Module):
    """Residual stack of AutoGroup quantizers (auto_grvq.py)."""

    input_dim: int
    codebook_size: int
    codebook_dim: int
    num_quantizers: int = 2
    frame_residual_vq: bool = False

    def setup(self):
        self.quantizers = [
            AutoGroupVectorQuantize(
                self.input_dim, self.codebook_size, self.codebook_dim,
                frame_residual_vq=(self.frame_residual_vq and i == 0),
                name=f"quantizers_{i}",
            )
            for i in range(self.num_quantizers)
        ]

    def __call__(self, z, train: bool = False):
        residual = z
        z_q = jnp.zeros_like(z)
        commitment = 0.0
        codebook = 0.0
        all_indices = []
        for q in self.quantizers:
            out = q(residual, train=train)
            residual = residual - jax.lax.stop_gradient(out["z_q"])
            z_q = z_q + out["z_q"]
            commitment = commitment + out["commitment_loss"]
            codebook = codebook + out["codebook_loss"]
            all_indices.append(out["indices"])
        return {
            "z_q": z_q,
            "commitment_loss": commitment,
            "codebook_loss": codebook,
            "indices": jnp.stack(all_indices, axis=-1),  # (B, T, nq)
        }

    def decode_indices(self, indices):
        out = 0.0
        for i, q in enumerate(self.quantizers):
            out = out + q.decode_indices(indices[..., i])
        return out
