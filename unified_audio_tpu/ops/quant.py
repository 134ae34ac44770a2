"""L2 quantizers: EMA Euclidean RVQ, factorized cosine VQ, FSQ / Residual-FSQ.

TPU-native redesign of the reference quantization stack
(HCodec vq/core_vq.py, UniSE modules/vq/factorized_vector_quantize.py,
modules/fsq/*). Key differences from the torch originals:

* Nearest-neighbor search is one fused matmul on the MXU:
  ``dist = |x|^2 - 2 x E^T + |E|^2`` then argmin. A Pallas kernel with the
  codebook resident in VMEM lives in ops/pallas/vq_kernel.py; this module is
  the XLA reference path (they are test-verified equal).
* EMA codebook statistics are plain data: under multi-device training the
  one-hot counts and embed sums are ``lax.psum``-reduced over the data axis
  before the EMA update — mathematically identical to the reference's
  all_reduce + broadcast dance (core_vq.py:54-91,199,217) with no
  broadcast step needed because every device computes the same update.
* k-means init and dead-code expiry are jittable (lax.cond on the ``inited``
  flag, fixed-iteration k-means, masked replacement) instead of python-side
  branching.

State lives in the flax variable collection "codebook" so training steps can
return updated buffers functionally.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# Fused nearest-neighbor search
# ---------------------------------------------------------------------------

def nearest_code(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_j ||x_i - e_j||^2 for x (..., D), codebook (N, D) -> (...,) int32.

    The |x|^2 term does not affect the argmin; we keep -2xE + |E|^2 only,
    which XLA fuses into one matmul + bias + argmin.
    """
    # HIGHEST precision: the argmin is tie-sensitive, and default TPU matmul
    # precision (bf16 passes) flips near-tie code assignments vs fp32
    dots = jnp.einsum(
        "...d,nd->...n", x, codebook, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1) - 2.0 * dots
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def cosine_nearest_code(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Cosine-distance NN via L2 normalization of both sides
    (factorized_vector_quantize.py:169-187)."""
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    cn = codebook / jnp.maximum(
        jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-12
    )
    dots = jnp.einsum("...d,nd->...n", xn, cn, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.argmax(dots, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# jittable k-means (core_vq.py:122-144 semantics, fixed iterations)
# ---------------------------------------------------------------------------

def sample_vectors(key, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """Sample ``num`` rows from (M, D); permutation when M >= num else uniform."""
    m = samples.shape[0]
    if m >= num:
        idx = jax.random.permutation(key, m)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, m)
    return samples[idx]


def kmeans(key, samples: jnp.ndarray, num_clusters: int, num_iters: int = 10):
    """Lloyd's k-means on (M, D) -> (means (N, D), bins (N,)). Static iters."""
    means = sample_vectors(key, samples, num_clusters)

    def body(_, means):
        buckets = nearest_code(samples, means)
        onehot = jax.nn.one_hot(buckets, num_clusters, dtype=samples.dtype)
        bins = jnp.sum(onehot, axis=0)
        sums = jnp.einsum("md,mn->nd", samples, onehot)
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    bins = jnp.sum(
        jax.nn.one_hot(nearest_code(samples, means), num_clusters), axis=0
    )
    return means, bins


def _maybe_psum(x, axis_name):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


# ---------------------------------------------------------------------------
# EMA Euclidean codebook VQ (core_vq.py:147-363)
# ---------------------------------------------------------------------------

class VectorQuantization(nn.Module):
    """Single EMA-codebook VQ layer.

    ``__call__(x, train)`` with x (B, T, D) returns (quantized, indices, loss).
    Buffers (embed, embed_avg, cluster_size, inited) live in the "codebook"
    collection; pass ``mutable=["codebook"]`` and rng "quant" during training.
    """

    dim: int
    codebook_size: int
    decay: float = 0.99
    epsilon: float = 1e-5
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    commitment_weight: float = 1.0
    axis_name: Optional[str] = None  # data axis for psum-synced EMA stats

    def setup(self):
        init = (
            nn.initializers.zeros
            if self.kmeans_init
            else nn.initializers.kaiming_uniform()
        )
        self.embed = self.variable(
            "codebook", "embed", init, jax.random.PRNGKey(0),
            (self.codebook_size, self.dim),
        )
        self.embed_avg = self.variable(
            "codebook", "embed_avg", lambda: jnp.array(self.embed.value)
        )
        self.cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((self.codebook_size,))
        )
        self.inited = self.variable(
            "codebook", "inited",
            lambda: jnp.array(0.0 if self.kmeans_init else 1.0),
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        return nearest_code(x, self.embed.value)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embed.value, indices, axis=0)

    def __call__(self, x, train: bool = False):
        embed = self.embed.value
        flat = x.reshape(-1, self.dim)

        # hoist rng generation out of lax.cond branches (flax rng counting
        # must not depend on the traced branch)
        init_key = replace_key = None
        if train:
            if self.kmeans_init:
                init_key = self.make_rng("quant")
            if self.threshold_ema_dead_code > 0:
                replace_key = self.make_rng("quant")

        if train and self.kmeans_init:
            def do_init(_):
                # k-means init on the first training batch (core_vq.py:188-199).
                # Devices run identical code on their shard; the first EMA psum
                # re-syncs. Gather flat beforehand for exact cross-device parity.
                e, b = kmeans(init_key, flat, self.codebook_size, self.kmeans_iters)
                return e, e, b, jnp.array(1.0)

            def no_init(_):
                return (
                    embed,
                    self.embed_avg.value,
                    self.cluster_size.value,
                    self.inited.value,
                )

            embed, embed_avg, cluster_size, inited = jax.lax.cond(
                self.inited.value > 0, no_init, do_init, None
            )
        else:
            embed_avg = self.embed_avg.value
            cluster_size = self.cluster_size.value
            inited = self.inited.value

        indices = nearest_code(flat, embed)
        quantized = jnp.take(embed, indices, axis=0).reshape(x.shape)

        loss = jnp.zeros((), dtype=jnp.float32)
        if train:
            onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=x.dtype)
            counts = _maybe_psum(jnp.sum(onehot, axis=0), self.axis_name)
            embed_sum = _maybe_psum(
                jnp.einsum("md,mn->nd", flat, onehot), self.axis_name
            )
            # dead-code expiry BEFORE the EMA update, as in core_vq.py:265-271
            if self.threshold_ema_dead_code > 0:
                expired = cluster_size < self.threshold_ema_dead_code
                replacements = sample_vectors(
                    replace_key, flat, self.codebook_size
                )
                embed = jnp.where(
                    (expired & (inited > 0))[:, None], replacements, embed
                )
            cluster_size = cluster_size * self.decay + counts * (1 - self.decay)
            embed_avg = embed_avg * self.decay + embed_sum * (1 - self.decay)
            n = jnp.sum(cluster_size)
            smoothed = (
                (cluster_size + self.epsilon)
                / (n + self.codebook_size * self.epsilon)
                * n
            )
            embed = embed_avg / smoothed[:, None]

            self.embed.value = embed
            self.embed_avg.value = embed_avg
            self.cluster_size.value = cluster_size
            self.inited.value = jnp.maximum(inited, 1.0)

            if self.commitment_weight > 0:
                commit = jnp.mean(
                    jnp.square(jax.lax.stop_gradient(quantized) - x)
                )
                loss = commit * self.commitment_weight
            # straight-through estimator
            quantized = x + jax.lax.stop_gradient(quantized - x)

        return quantized, indices.reshape(x.shape[:-1]), loss


class ResidualVQ(nn.Module):
    """Residual VQ stack (core_vq.py:366-412 + vq-pytorch quantize_dropout).

    __call__(x (B,T,D), train) -> (quantized (B,T,D), codes (B,T,nq), losses (nq,)).
    Structured quantizer dropout: during training a random cutoff layer is
    drawn per batch and later layers contribute nothing (their codes = -1),
    matching ResidualVQ(quantize_dropout=True) used by HCodec configs
    (vq/codec.py:101-119).
    """

    dim: int
    codebook_size: int
    num_quantizers: int
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: float = 2.0
    commitment_weight: float = 1.0
    quantize_dropout: bool = False
    axis_name: Optional[str] = None

    def setup(self):
        self.layers = [
            VectorQuantization(
                dim=self.dim,
                codebook_size=self.codebook_size,
                decay=self.decay,
                kmeans_init=self.kmeans_init,
                kmeans_iters=self.kmeans_iters,
                threshold_ema_dead_code=self.threshold_ema_dead_code,
                commitment_weight=self.commitment_weight,
                axis_name=self.axis_name,
                name=f"layers_{i}",
            )
            for i in range(self.num_quantizers)
        ]

    def __call__(self, x, train: bool = False):
        layers = self.layers
        nq = self.num_quantizers
        if train and self.quantize_dropout and nq > 1:
            key = self.make_rng("quant")
            # dropout index synced across devices by identical fold-in of a
            # batch-invariant rng (caller passes the same key per step)
            dropout_index = jax.random.randint(key, (), 0, nq)
        else:
            dropout_index = nq - 1

        quantized_out = jnp.zeros_like(x)
        residual = x
        all_indices = []
        all_losses = []
        for i, layer in enumerate(layers):
            q, idx, loss = layer(residual, train=train)
            active = jnp.asarray(i <= dropout_index, dtype=x.dtype)
            q = q * active
            idx = jnp.where(i <= dropout_index, idx, -1)
            residual = residual - jax.lax.stop_gradient(q)
            quantized_out = quantized_out + q
            all_indices.append(idx)
            all_losses.append(loss * active.astype(jnp.float32))
        codes = jnp.stack(all_indices, axis=-1)  # (B, T, nq)
        losses = jnp.stack(all_losses)
        return quantized_out, codes, losses

    def encode(self, x) -> jnp.ndarray:
        """(B, T, D) -> codes (B, T, nq); inference path, no dropout."""
        layers = self.layers
        residual = x
        out = []
        for layer in layers:
            idx = layer.encode(residual)
            q = layer.decode(idx)
            residual = residual - q
            out.append(idx)
        return jnp.stack(out, axis=-1)

    def decode(self, codes) -> jnp.ndarray:
        """codes (B, T, nq) -> (B, T, D); -1 codes (dropout) contribute 0."""
        layers = self.layers
        out = 0.0
        for i, layer in enumerate(layers):
            idx = codes[..., i]
            q = layer.decode(jnp.maximum(idx, 0))
            out = out + q * (idx >= 0)[..., None]
        return out

    # reference-API aliases (vq-pytorch naming used at vq/codec.py:183-184)
    def get_output_from_indices(self, codes):
        return self.decode(codes)


# ---------------------------------------------------------------------------
# Factorized (cosine) VQ — BiCodec semantic quantizer
# ---------------------------------------------------------------------------

class FactorizedVectorQuantize(nn.Module):
    """8192-entry low-dim (8) cosine-NN codebook with 1x1 weight-normed
    projections and EMA usage stats (factorized_vector_quantize.py:36-187).

    Channels-last: __call__(z (B, T, D_in), train) -> dict.
    """

    input_dim: int
    codebook_size: int
    codebook_dim: int
    commitment: float = 0.25
    codebook_loss_weight: float = 1.0
    decay: float = 0.99
    threshold_ema_dead_code: float = 2.0
    axis_name: Optional[str] = None

    def setup(self):
        from ..nn.conv import Conv1d

        if self.input_dim != self.codebook_dim:
            self.in_project = Conv1d(
                self.codebook_dim, 1, padding=0, weight_norm=True, name="in_project"
            )
            self.out_project = Conv1d(
                self.input_dim, 1, padding=0, weight_norm=True, name="out_project"
            )
        else:
            self.in_project = lambda x: x
            self.out_project = lambda x: x
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )
        self.cluster_size = self.variable(
            "codebook", "cluster_size", lambda: jnp.zeros((self.codebook_size,))
        )

    def decode_latents(self, z_e):
        indices = cosine_nearest_code(z_e, self.codebook)
        z_q = jnp.take(self.codebook, indices, axis=0)
        return z_q, indices

    def __call__(self, z, train: bool = False):
        z_e = self.in_project(z)  # (B, T, dc)
        z_q, indices = self.decode_latents(z_e)

        onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=z.dtype)
        avg_probs = jnp.mean(onehot.reshape(-1, self.codebook_size), axis=0)
        avg_probs = _maybe_psum(avg_probs, self.axis_name)
        if self.axis_name is not None:
            avg_probs = avg_probs / jax.lax.psum(1, self.axis_name)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

        if train:
            counts = _maybe_psum(jnp.sum(onehot, axis=(0, 1)), self.axis_name)
            self.cluster_size.value = (
                self.cluster_size.value * self.decay + counts * (1 - self.decay)
            )
            active_num = jnp.sum(
                self.cluster_size.value > self.threshold_ema_dead_code
            ).astype(jnp.float32)
            commit_loss = (
                jnp.mean(
                    jnp.square(z_e - jax.lax.stop_gradient(z_q)), axis=(1, 2)
                )
                * self.commitment
            )
            codebook_loss = (
                jnp.mean(
                    jnp.square(z_q - jax.lax.stop_gradient(z_e)), axis=(1, 2)
                )
                * self.codebook_loss_weight
            )
            vq_loss = jnp.mean(commit_loss + codebook_loss)
        else:
            active_num = jnp.sum(onehot.sum(axis=(0, 1)) > 0).astype(jnp.float32)
            vq_loss = jnp.zeros(())

        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        z_q = self.out_project(z_q)
        return {
            "z_q": z_q,
            "indices": indices,
            "vq_loss": vq_loss,
            "perplexity": perplexity,
            "active_num": active_num,
        }

    def tokenize(self, z) -> jnp.ndarray:
        z_e = self.in_project(z)
        _, indices = self.decode_latents(z_e)
        return indices

    def detokenize(self, indices) -> jnp.ndarray:
        z_q = jnp.take(self.codebook, indices, axis=0)
        return self.out_project(z_q)


# ---------------------------------------------------------------------------
# FSQ / Residual FSQ (finite_scalar_quantization.py, residual_fsq.py)
# ---------------------------------------------------------------------------

def _round_ste(z):
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


class FSQ(nn.Module):
    """Finite scalar quantization (stateless). x (..., len(levels))."""

    levels: Sequence[int]

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    def _consts(self):
        levels = jnp.asarray(list(self.levels), dtype=jnp.float32)
        basis = jnp.asarray(
            np.concatenate([[1], np.cumprod(self.levels[:-1])]).astype(np.float32)
        )
        return levels, basis

    def bound(self, z, eps: float = 1e-3):
        levels, _ = self._consts()
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        quantized = _round_ste(self.bound(z))
        half_width = jnp.asarray(
            [l // 2 for l in self.levels], dtype=jnp.float32
        )
        return quantized / half_width

    def codes_to_indices(self, zhat):
        levels, basis = self._consts()
        half_width = jnp.asarray([l // 2 for l in self.levels], dtype=jnp.float32)
        shifted = zhat * half_width + half_width
        return jnp.sum(shifted * basis, axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        levels, basis = self._consts()
        half_width = jnp.asarray([l // 2 for l in self.levels], dtype=jnp.float32)
        codes_nc = jnp.mod(
            jnp.floor_divide(indices[..., None].astype(jnp.float32), basis), levels
        )
        return (codes_nc - half_width) / half_width

    def __call__(self, z):
        codes = self.quantize(z.astype(jnp.float32)).astype(z.dtype)
        indices = self.codes_to_indices(codes)
        return codes, indices


class ResidualFSQ(nn.Module):
    """Residual FSQ with per-layer scales (residual_fsq.py:48-263).

    Channels-last: __call__(x (B, T, D)) -> (quantized, indices (B, T, nq)).
    """

    levels: Sequence[int]
    num_quantizers: int
    dim: Optional[int] = None

    def setup(self):
        codebook_dim = len(self.levels)
        dim = self.dim if self.dim is not None else codebook_dim
        if dim != codebook_dim:
            self.project_in = nn.Dense(codebook_dim, name="project_in")
            self.project_out = nn.Dense(dim, name="project_out")
        else:
            self.project_in = lambda x: x
            self.project_out = lambda x: x
        self.layers = [FSQ(levels=self.levels) for _ in range(self.num_quantizers)]
        levels = np.asarray(list(self.levels), dtype=np.float32)
        self.scales = jnp.asarray(
            np.stack([(levels - 1.0) ** -float(i) for i in range(self.num_quantizers)])
        )

    @property
    def codebook_size(self):
        return int(np.prod(self.levels))

    def __call__(self, x):
        x = self.project_in(x)
        quantized_out = jnp.zeros_like(x)
        residual = x
        all_indices = []
        for i, layer in enumerate(self.layers):
            scale = self.scales[i]
            q, idx = layer(residual / scale)
            q = q * scale
            residual = residual - jax.lax.stop_gradient(q)
            quantized_out = quantized_out + q
            all_indices.append(idx)
        out = self.project_out(quantized_out)
        return out, jnp.stack(all_indices, axis=-1)

    def get_output_from_indices(self, indices):
        """indices (B, T, nq) -> (B, T, dim)."""
        total = 0.0
        for i in range(self.num_quantizers):
            codes = self.layers[i].indices_to_codes(indices[..., i])
            total = total + codes * self.scales[i]
        return self.project_out(total)
