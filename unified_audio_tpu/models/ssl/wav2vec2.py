"""Frozen SSL feature frontends: one configurable wav2vec2-family encoder
covering HuBERT-base, WavLM-base-plus (gated relative position bias) and
wav2vec2-large-XLSR-53 (stable/pre-LayerNorm), as used by the reference:

* HuBERT-base, all-layer mean + |x|^0.3 compression —
  HCodec-1.0/audio_tokenizer.py:28,35-48
* WavLM-base-plus, all-layer mean — UniSE/model/model.py:30,38-51
* w2v2-large-xlsr-53, layers {11,14,16}/3 —
  UniSE/model/bicodec/audio_tokenizer.py:46-52,74-90

Weights are converted from HF torch checkpoints (utils/convert.py); this module
reproduces the HF computation graph (transformers 4.49 semantics) in flax.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.conv import conv1d


@dataclass(frozen=True)
class SSLConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" | "layer"
    do_stable_layer_norm: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    # WavLM relative position bias
    use_rel_pos_bias: bool = False
    num_buckets: int = 320
    max_distance: int = 800


def hubert_base_config() -> SSLConfig:
    return SSLConfig()


def wavlm_base_plus_config() -> SSLConfig:
    return SSLConfig(use_rel_pos_bias=True)


def wav2vec2_large_xlsr53_config() -> SSLConfig:
    return SSLConfig(
        hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
    )


class FeatureExtractor(nn.Module):
    """7-layer strided conv frontend, 320x downsample -> 50 Hz."""

    config: SSLConfig

    @nn.compact
    def __call__(self, x):
        # x: (B, T) -> (B, T/320, 512)
        cfg = self.config
        h = x[..., None]
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            kernel = self.param(
                f"conv_{i}_kernel", nn.initializers.lecun_normal(),
                (k, h.shape[-1], dim),
            )
            h = conv1d(h, kernel, stride=s)
            if cfg.conv_bias:
                h = h + self.param(f"conv_{i}_bias", nn.initializers.zeros, (dim,))
            if cfg.feat_extract_norm == "group" and i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5,
                                 name=f"norm_{i}")(h)
            elif cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=1e-5, name=f"norm_{i}")(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding, kernel 128 / 16 groups, same-pad with
    the trailing element dropped (kernel even)."""

    config: SSLConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        d = cfg.hidden_size
        k = cfg.num_conv_pos_embeddings
        g = cfg.num_conv_pos_embedding_groups
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (k, d // g, d))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        h = conv1d(x, kernel, groups=g, padding=(k // 2, k // 2)) + bias
        if k % 2 == 0:
            h = h[:, :-1]
        return nn.gelu(h, approximate=False)


def _relative_position_buckets(qlen, klen, num_buckets, max_distance):
    """WavLM T5-style bidirectional relative position buckets (static numpy)."""
    context = np.arange(qlen)[:, None]
    memory = np.arange(klen)[None, :]
    relative = memory - context
    nb = num_buckets // 2
    buckets = (relative > 0).astype(np.int64) * nb
    rel = np.abs(relative)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return jnp.asarray(buckets)


class SSLSelfAttention(nn.Module):
    config: SSLConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg = self.config
        d, h = cfg.hidden_size, cfg.num_heads
        hd = d // h
        b, t, _ = x.shape

        if cfg.use_rel_pos_bias and position_bias is None:
            assert self.has_relative_position_bias
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02),
                (cfg.num_buckets, h),
            )
            buckets = _relative_position_buckets(
                t, t, cfg.num_buckets, cfg.max_distance
            )
            position_bias = jnp.take(rel_embed, buckets, axis=0)  # (T, T, H)
            position_bias = jnp.transpose(position_bias, (2, 0, 1))  # (H, T, T)

        q = nn.Dense(d, name="q_proj")(x).reshape(b, t, h, hd)
        k = nn.Dense(d, name="k_proj")(x).reshape(b, t, h, hd)
        v = nn.Dense(d, name="v_proj")(x).reshape(b, t, h, hd)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5

        if cfg.use_rel_pos_bias:
            # gated relative position bias (HF WavLMAttention)
            gate_in = jnp.swapaxes(q, 1, 2)  # (B, H, T, hd)
            proj = nn.Dense(8, name="gru_rel_pos_linear")(gate_in)
            proj = proj.reshape(*proj.shape[:-1], 2, 4).sum(-1)  # (B,H,T,2)
            gates = jax.nn.sigmoid(proj)
            gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]
            gru_const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, h, 1, 1)
            )
            gate_out = gate_a * (gate_b * gru_const - 1.0) + 2.0  # (B,H,T,1)
            gated_bias = gate_out * position_bias[None]  # (B,H,T,T)
            logits = logits + gated_bias

        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        return nn.Dense(d, name="out_proj")(out), position_bias


class SSLEncoderLayer(nn.Module):
    config: SSLConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, x, position_bias=None):
        cfg = self.config
        attn = SSLSelfAttention(
            cfg, has_relative_position_bias=self.has_relative_position_bias,
            name="attention",
        )
        if cfg.do_stable_layer_norm:  # pre-LN (xlsr-large)
            h, position_bias = attn(
                nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x), position_bias
            )
            x = x + h
            ff_in = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
            ff = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(ff_in)
            ff = nn.gelu(ff, approximate=False)
            ff = nn.Dense(cfg.hidden_size, name="output_dense")(ff)
            x = x + ff
        else:  # post-LN (base models)
            h, position_bias = attn(x, position_bias)
            x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x + h)
            ff = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(x)
            ff = nn.gelu(ff, approximate=False)
            ff = nn.Dense(cfg.hidden_size, name="output_dense")(ff)
            x = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x + ff)
        return x, position_bias


class _ScanSSLLayer(nn.Module):
    """nn.scan body: carry = hidden state, y = per-layer hidden state."""

    config: SSLConfig

    @nn.compact
    def __call__(self, x, position_bias):
        x, _ = SSLEncoderLayer(
            self.config, has_relative_position_bias=False, name="layer"
        )(x, position_bias)
        return x, x


class Wav2Vec2Model(nn.Module):
    """Full frozen SSL encoder. __call__(wav (B, T)) -> tuple of hidden states
    (num_layers + 1 entries, HF layout: embeddings first).

    Layers 1..N-1 run as one nn.scan over stacked params (single layer body in
    the HLO — compile-time critical on remote-compiled TPU backends); layer 0
    stays separate because it owns the WavLM relative-position-bias table.
    """

    config: SSLConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = FeatureExtractor(cfg, name="feature_extractor")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="feature_projection_norm")(h)
        h = nn.Dense(cfg.hidden_size, name="feature_projection")(h)

        pos = PositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        h = h + pos
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(h)

        hidden_states = [h]
        h, position_bias = SSLEncoderLayer(
            cfg, has_relative_position_bias=True, name="layers_0"
        )(h, None)
        hidden_states.append(h)

        if cfg.num_layers > 1:
            scan = nn.scan(
                _ScanSSLLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast,),
                out_axes=0,
                length=cfg.num_layers - 1,
            )
            if position_bias is None:
                position_bias = jnp.zeros((0,), h.dtype)  # empty pytree leaf
            h, per_layer = scan(cfg, name="layers_rest")(h, position_bias)
            hidden_states.extend(
                per_layer[i] for i in range(cfg.num_layers - 1)
            )

        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(h)
            hidden_states[-1] = h
        return tuple(hidden_states)


# ---------------------------------------------------------------------------
# Feature-mix recipes (the exact layer mixes used by each tokenizer)
# ---------------------------------------------------------------------------

def hubert_features(hidden_states) -> jnp.ndarray:
    """All-layer mean + signed |x|^0.3 magnitude compression
    (HCodec-1.0/audio_tokenizer.py:35-48)."""
    mix = jnp.mean(jnp.stack(hidden_states, axis=0), axis=0)
    sign = jnp.where(mix > 0, 1.0, -1.0)
    return sign * jnp.abs(mix) ** 0.3


def wavlm_features(hidden_states) -> jnp.ndarray:
    """All-layer mean, no compression (UniSE model/model.py:38-51)."""
    return jnp.mean(jnp.stack(hidden_states, axis=0), axis=0)


def xlsr_features(hidden_states, layers=(11, 14, 16)) -> jnp.ndarray:
    """(h11 + h14 + h16) / 3 (bicodec audio_tokenizer.py:86-88). Layer indices
    clamp to the available depth so shallow test configs stay valid."""
    n = len(hidden_states)
    picked = [hidden_states[min(i, n - 1)] for i in layers]
    return sum(picked) / float(len(picked))
