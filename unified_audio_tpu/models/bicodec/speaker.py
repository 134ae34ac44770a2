"""Speaker (global-token) branch of BiCodec: ECAPA-TDNN x-vector network,
Perceiver resampler, Residual-FSQ tokenizer, d-vector projection.

Reference: modules/speaker/{ecapa_tdnn.py, pooling_layers.py,
perceiver_encoder.py, speaker_encoder.py}. Channels-last throughout; BatchNorm
running stats live in the "batch_stats" collection.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.conv import Conv1d
from ...ops.quant import ResidualFSQ


class ConvReluBn(nn.Module):
    """conv -> relu -> BN (ecapa_tdnn.py:90-109)."""

    features: int
    kernel_size: int = 1
    dilation: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv1d(self.features, self.kernel_size, dilation=self.dilation,
                   padding=self.padding, name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


class Res2ConvReluBn(nn.Module):
    """Res2Net grouped conv (ecapa_tdnn.py:29-83), scale groups."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    padding: int = 0
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        parts = jnp.split(x, self.scale, axis=-1)
        out = []
        sp = parts[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + parts[i]
            sp = Conv1d(width, self.kernel_size, dilation=self.dilation,
                        padding=self.padding, name=f"conv_{i}")(sp)
            sp = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name=f"bn_{i}")(nn.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(parts[-1])
        return jnp.concatenate(out, axis=-1)


class SEConnect(nn.Module):
    """Squeeze-excitation over time (ecapa_tdnn.py:116-129)."""

    channels: int
    bottleneck: int = 128

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=-2)  # (B, C)
        s = nn.relu(nn.Dense(self.bottleneck, name="linear1")(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, name="linear2")(s))
        return x * s[:, None, :]


class SERes2Block(nn.Module):
    channels: int
    kernel_size: int
    dilation: int
    padding: int
    scale: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvReluBn(self.channels, 1, name="in_conv")(x, train)
        h = Res2ConvReluBn(self.channels, self.kernel_size, self.dilation,
                           self.padding, self.scale, name="res2")(h, train)
        h = ConvReluBn(self.channels, 1, name="out_conv")(h, train)
        h = SEConnect(self.channels, name="se")(h)
        return x + h


class ASTP(nn.Module):
    """Attentive statistics pooling with global context
    (pooling_layers.py:92-148). Input (B, T, C) -> (B, 2C)."""

    in_dim: int
    bottleneck: int = 128
    global_context_att: bool = True

    @nn.compact
    def __call__(self, x):
        if self.global_context_att:
            mean = jnp.mean(x, axis=-2, keepdims=True)
            std = jnp.sqrt(jnp.var(x, axis=-2, keepdims=True) + 1e-7)
            x_in = jnp.concatenate(
                [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
                axis=-1,
            )
        else:
            x_in = x
        alpha = jnp.tanh(nn.Dense(self.bottleneck, name="linear1")(x_in))
        alpha = jax.nn.softmax(nn.Dense(self.in_dim, name="linear2")(alpha), axis=-2)
        mean = jnp.sum(alpha * x, axis=-2)
        var = jnp.sum(alpha * x * x, axis=-2) - mean**2
        std = jnp.sqrt(jnp.clip(var, min=1e-7))
        return jnp.concatenate([mean, std], axis=-1)


class ECAPATDNN(nn.Module):
    """x-vector network (ecapa_tdnn.py:153-212, GLOB_c512 variant).
    __call__(feats (B, T, F)) -> (embedding (B, E), latent (B, T, 1536))."""

    channels: int = 512
    embed_dim: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        out1 = ConvReluBn(c, 5, padding=2, name="layer1")(x, train)
        out2 = SERes2Block(c, 3, 2, 2, name="layer2")(out1, train)
        out3 = SERes2Block(c, 3, 3, 3, name="layer3")(out2, train)
        out4 = SERes2Block(c, 3, 4, 4, name="layer4")(out3, train)
        out = jnp.concatenate([out2, out3, out4], axis=-1)
        latent = nn.relu(Conv1d(512 * 3, 1, padding=0, name="conv")(out))
        pooled = ASTP(512 * 3, global_context_att=True, name="pool")(latent)
        pooled = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, name="bn")(pooled)
        emb = nn.Dense(self.embed_dim, name="linear")(pooled)
        return emb, latent


class PerceiverRMSNorm(nn.Module):
    """lucidrains RMSNorm: normalize(x) * sqrt(d) * gamma."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        n = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return n * (self.dim**0.5) * gamma


class PerceiverAttention(nn.Module):
    """Cross-attention with queries included in the context
    (perceiver_encoder.py:253-293)."""

    dim: int
    dim_head: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, latents, context):
        h, hd = self.heads, self.dim_head
        inner = h * hd
        ctx = jnp.concatenate([latents, context], axis=-2)
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, h, hd)
        k = k.reshape(b, tk, h, hd)
        v = v.reshape(b, tk, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, tq, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """Linear -> GEGLU -> Linear, inner = dim*mult*2/3 (perceiver_encoder.py:237-250)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult * 2 / 3)
        h = nn.Dense(inner * 2, name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.dim, name="proj_out")(nn.gelu(gate, approximate=False) * a)


class PerceiverResampler(nn.Module):
    """32 learned latents cross-attend to the ECAPA latent sequence
    (perceiver_encoder.py:296-349)."""

    dim: int
    dim_context: int
    num_latents: int = 32
    depth: int = 2
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        if self.dim_context != self.dim:
            x = nn.Dense(self.dim, name="proj_context")(x)
        latents = self.param(
            "latents", nn.initializers.normal(0.02), (self.num_latents, self.dim)
        )
        latents = jnp.broadcast_to(latents[None], (b, self.num_latents, self.dim))
        for i in range(self.depth):
            latents = PerceiverAttention(
                self.dim, self.dim_head, self.heads, name=f"attn_{i}"
            )(latents, x) + latents
            latents = GEGLUFeedForward(self.dim, self.ff_mult, name=f"ff_{i}")(
                latents
            ) + latents
        return PerceiverRMSNorm(self.dim, name="norm")(latents)


class SpeakerEncoder(nn.Module):
    """x-vector + d-vector speaker encoder (speaker_encoder.py:33-116).

    __call__(mels (B, T, F), train) -> (x_vector (B, E), d_vector (B, E)).
    tokenize(mels) -> global tokens (B, token_num, nq);
    detokenize(tokens) -> d_vector.
    """

    input_dim: int = 128
    out_dim: int = 1024
    latent_dim: int = 128
    token_num: int = 32
    fsq_levels: Sequence[int] = (4, 4, 4, 4, 4, 4)
    fsq_num_quantizers: int = 1

    def setup(self):
        self.speaker_encoder = ECAPATDNN(
            channels=512, embed_dim=self.out_dim, name="speaker_encoder"
        )
        self.perceiver_sampler = PerceiverResampler(
            dim=self.latent_dim, dim_context=512 * 3,
            num_latents=self.token_num, name="perceiver_sampler",
        )
        self.quantizer = ResidualFSQ(
            levels=tuple(self.fsq_levels),
            num_quantizers=self.fsq_num_quantizers,
            dim=self.latent_dim, name="quantizer",
        )
        self.project = nn.Dense(self.out_dim, name="project")

    @staticmethod
    def _flatten_cf(zq):
        """(B, T, D) -> (B, D*T) flattened CHANNEL-major: the reference
        reshapes the channel-first zq (B, D, T) (speaker_encoder.py:99,115),
        so the project weights are laid out d-major — reference-golden
        tested (tests/test_reference_golden.py)."""
        return jnp.swapaxes(zq, 1, 2).reshape(zq.shape[0], -1)

    def __call__(self, mels, train: bool = False):
        x_vector, latent = self.speaker_encoder(mels, train)
        x = self.perceiver_sampler(latent)  # (B, 32, latent_dim)
        zq, _ = self.quantizer(x)
        d_vector = self.project(self._flatten_cf(zq))
        return x_vector, d_vector

    def tokenize(self, mels):
        _, latent = self.speaker_encoder(mels, False)
        x = self.perceiver_sampler(latent)
        _, indices = self.quantizer(x)
        return indices  # (B, token_num, nq)

    def detokenize(self, indices):
        zq = self.quantizer.get_output_from_indices(indices)
        return self.project(self._flatten_cf(zq))


# ---------------------------------------------------------------------------
# Alternative pooling heads (pooling_layers.py TAP/TSDP/TSTP; ASTP above)
# ---------------------------------------------------------------------------

def tap_pool(x):
    """Temporal average pooling, (B, T, C) -> (B, C)."""
    return jnp.mean(x, axis=-2)


def tsdp_pool(x):
    """Temporal standard-deviation pooling."""
    return jnp.sqrt(jnp.var(x, axis=-2) + 1e-7)


def tstp_pool(x):
    """Temporal statistics pooling: [mean ‖ std] (x-vector standard)."""
    return jnp.concatenate([tap_pool(x), tsdp_pool(x)], axis=-1)
