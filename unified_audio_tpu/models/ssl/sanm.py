"""SenseVoice SAN-M encoder — the FlexiCodec semantic teacher's missing half.

The reference runs the frozen SenseVoiceSmall encoder in-line to produce
FlexiCodec's semantic stream (QuarkAudio-HCodec/HCodec-1.5/adaptive/
modeling_flexicodec.py:54-95 — ``semantic_model.encoder(input_features,
audio_features_lengths, extract_hidden=True)`` after
``semantic_model.prepend_inputs`` adds 4 query frames; model loaded at :122,
``semantic_model_path="./SenseVoiceSmall"``). funasr is not in this image, so
this module reconstructs the architecture from the public FunASR source
(funasr/models/sense_voice/model.py ``SenseVoiceEncoderSmall`` +
funasr/models/sanm/attention.py ``MultiHeadedAttentionSANM``):

* features: kaldi fbank + LFR(7,6) + CMVN (``ops/fbank.py`` — exact) ->
  (B, T, 560)
* ``prepend_inputs``: 4 query frames from the model's embedding table —
  [language, event, emotion, textnorm] = embed([lang_id, 1, 2, textnorm_id])
  (SenseVoiceSmall.inference: language_query + event_emo_query ([1, 2]) +
  textnorm_query; lid_dict "auto"=0, textnorm "woitn"=15) — matching the
  reference's ``[b, t+4, c]`` comment and its ``hidden_out[:, 4:]`` strip.
* encoder: x * sqrt(d_out), sinusoidal PE (positions start at 1),
  1x EncoderLayerSANM(560 -> 512, NO attention residual since in != out),
  49x EncoderLayerSANM(512), after_norm -> ``hidden_out``; then 20x tp
  blocks + tp_norm -> ``encoder_out`` (SenseVoiceSmall config: output_size
  512, heads 4, linear_units 2048, num_blocks 50, tp_blocks 20,
  kernel_size 11, sanm_shfit 0).
* SAN-M attention: fused qkv projection; the value stream additionally runs
  a depthwise-conv FSMN memory block (kernel 11, symmetric zero pad, residual
  add, re-masked) whose output is ADDED to the attention output.

``extract_hidden`` semantics (the DualCodec wrapper the reference calls):
``hidden_out`` is the after_norm trunk output (before tp blocks) and
``hiddens`` the per-layer outputs; FlexiCodec's default path uses
``hidden_out[:, 4:]`` (modeling_flexicodec.py:75-76).

The torch twin lives in tests/reference_loader.py (same recipe as the other
golden shims) and ``utils.convert.convert_sensevoice`` maps the funasr
state-dict layout (``encoder.encoders0.0.self_attn.linear_q_k_v.weight``,
``encoder.encoders.{i}...``, ``encoder.tp_encoders.{i}...``, ``embed.weight``).

Adversarial re-read vs funasr's published source (round 5; the twin is
builder-authored, so each detail below was re-derived from upstream rather
than from the twin — hunting a SHARED misreading):

* ``SinusoidalPositionEncoder`` (funasr/models/transformer/embedding.py,
  ``encode``/``forward``): positions ``torch.arange(1, T+1)`` — start at 1,
  CONFIRMED; ``log_timescale_increment = log(10000)/(depth/2 - 1)`` with
  depth = input dim (560), i.e. the 280-timescale table divides by 279,
  CONFIRMED (both sides use ``half - 1``); layout ``cat([sin, cos], dim)``
  halves concatenated (not interleaved), CONFIRMED; PE is ADDED after the
  ``x * sqrt(output_size)`` scale (SenseVoiceEncoderSmall.forward scales by
  OUTPUT size 512 even though x is still 560-dim — both sides reproduce
  this), CONFIRMED. Deviation kept: funasr computes the table in the input
  dtype (fp32); both sides here use fp64 and cast, which is ~1e-6 MORE
  accurate than upstream — harmless at bf16/fp32 inference tolerances.
* Query-id table (funasr/models/sense_voice/model.py SenseVoiceSmall):
  ``embed = nn.Embedding(7 + len(lid_dict) + len(textnorm_dict), input_size)``
  = 16 rows, CONFIRMED; inference() concatenates
  [language_query, event_emo_query([1, 2]), textnorm_query] before the
  audio, so ids = [lang, 1, 2, textnorm], CONFIRMED; lid_dict["auto"] = 0,
  textnorm_dict = {"withitn": 14, "woitn": 15}, CONFIRMED. RESIDUAL RISK:
  the reference reaches ``prepend_inputs`` through DualCodec's funasr fork
  (not in this image) — whether its default textnorm id is 15 ("woitn",
  assumed here) or 14 cannot be pinned without that source; both are one
  config knob (``SANMConfig.textnorm_id``) if real weights disagree.
* FSMN pad/mask order (funasr/models/sanm/attention.py
  MultiHeadedAttentionSANM.forward_fsmn): v is masked BEFORE the conv, the
  residual adds the MASKED inputs (``x += inputs`` after
  ``inputs = inputs * mask``), output re-masked, CONFIRMED in that order;
  pad ``left = (k-1)//2`` with ``if sanm_shfit > 0: left += sanm_shfit``,
  ``right = k-1-left``, conv ``groups=n_feat, bias=False``, CONFIRMED
  (this module adds the shift unconditionally — identical at the
  SenseVoice config's shift 0; upstream ignores a NEGATIVE shift).
  Attention mask: key-only ``mask.unsqueeze(1).eq(0)`` masked_fill with
  finfo.min, softmax, then re-zero — CONFIRMED (query rows unmasked
  upstream too; padded-row outputs are garbage both sides and stripped by
  lengths downstream).
* 560 -> 512 no-residual rule (funasr/models/sanm/encoder.py
  EncoderLayerSANM.forward): attention residual only when
  ``in_size == size``; norm1 is LayerNorm(in_size) (560 on encoders0),
  norm2 LayerNorm(size); FFN residual unconditional — all CONFIRMED.
  encoders0 attention takes ``in_feat=input_size, n_feat=output_size``
  (qkv Linear 560 -> 3*512), CONFIRMED.
* RESIDUAL RISK (non-default path only): ``hiddens`` for list-form
  ``semantic_layer_idx`` is reconstructed as the 50 pre-after_norm trunk
  outputs; the DualCodec fork's exact ``extract_hidden`` collection order
  is unverifiable here. The reference's shipped default
  (``semantic_layer_idx=None`` -> ``hidden_out[:, 4:]``) does not touch it.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclass(frozen=True)
class SANMConfig:
    input_size: int = 560          # 80 mel x LFR m=7
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50           # encoders0 (1, 560->512) + 49 homogeneous
    tp_blocks: int = 20
    kernel_size: int = 11
    sanm_shift: int = 0
    embed_vocab: int = 16          # query-embedding table (ids 0..15 used)
    lang_id: int = 0               # lid_dict["auto"]
    textnorm_id: int = 15          # textnorm_dict["woitn"]


def sensevoice_small_config() -> SANMConfig:
    return SANMConfig()


def sinusoidal_pe(length: int, depth: int, dtype=jnp.float32) -> jnp.ndarray:
    """funasr SinusoidalPositionEncoder: positions start at 1,
    [sin | cos] concatenated over depth/2 timescales."""
    positions = np.arange(1, length + 1, dtype=np.float64)
    half = depth // 2
    log_inc = np.log(10000.0) / (half - 1)
    inv = np.exp(np.arange(half, dtype=np.float64) * -log_inc)
    scaled = positions[:, None] * inv[None, :]
    pe = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    return jnp.asarray(pe, dtype)


class SANMAttention(nn.Module):
    """MultiHeadedAttentionSANM: softmax attention + FSMN memory on the
    value stream, summed (funasr/models/sanm/attention.py)."""

    n_feat: int
    heads: int
    kernel_size: int
    sanm_shift: int = 0

    @nn.compact
    def __call__(self, x, mask=None):
        # x (B, T, in); mask (B, T) 1/0 key-validity or None (all valid)
        n, h = self.n_feat, self.heads
        d_k = n // h
        qkv = nn.Dense(3 * n, name="linear_q_k_v")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # FSMN memory block on the (un-headed) value stream
        inp = v if mask is None else v * mask[..., None].astype(v.dtype)
        left = (self.kernel_size - 1) // 2 + self.sanm_shift
        right = self.kernel_size - 1 - left
        pad = jnp.pad(inp, ((0, 0), (left, right), (0, 0)))
        kern = self.param(
            "fsmn_kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, n))
        f = jax.lax.conv_general_dilated(
            pad, kern[:, None, :].astype(v.dtype), (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=n)
        f = f + inp
        if mask is not None:
            f = f * mask[..., None].astype(f.dtype)

        b, t, _ = x.shape
        qh = q.reshape(b, t, h, d_k).transpose(0, 2, 1, 3) * (d_k ** -0.5)
        kh = k.reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(b, t, h, d_k).transpose(0, 2, 1, 3)
        scores = qh @ kh.transpose(0, 1, 3, 2)  # (B, h, T, T)
        if mask is not None:
            key_ok = mask[:, None, None, :].astype(bool)
            scores = jnp.where(key_ok, scores,
                               jnp.finfo(scores.dtype).min)
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = attn * key_ok.astype(attn.dtype)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, t, n)
        return nn.Dense(n, name="linear_out")(out) + f


class SANMLayer(nn.Module):
    """EncoderLayerSANM (normalize_before=True): pre-LN attention with a
    residual ONLY when in_size == size (the 560->512 layer has none), then
    pre-LN ReLU FFN with residual."""

    size: int
    heads: int
    linear_units: int
    kernel_size: int
    sanm_shift: int = 0
    in_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask=None):
        in_size = self.size if self.in_size is None else self.in_size
        residual = x
        h = nn.LayerNorm(name="norm1")(x)
        h = SANMAttention(self.size, self.heads, self.kernel_size,
                          self.sanm_shift, name="self_attn")(h, mask)
        x = residual + h if in_size == self.size else h
        residual = x
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.linear_units, name="ff_w1")(h)
        h = nn.Dense(self.size, name="ff_w2")(nn.relu(h))
        return residual + h


class _ScanSANMLayer(nn.Module):
    """nn.scan body: carry = hidden state, y = per-layer hidden state."""

    config: SANMConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        x = SANMLayer(cfg.output_size, cfg.attention_heads, cfg.linear_units,
                      cfg.kernel_size, cfg.sanm_shift, name="layer")(x, mask)
        return x, x


def _layer_scan(cfg: SANMConfig, length: int, name: str):
    return nn.scan(
        _ScanSANMLayer,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,),
        out_axes=0,
        length=length,
    )(cfg, name=name)


class SANMEncoder(nn.Module):
    """SenseVoiceEncoderSmall. ``__call__(feats (B, T, 560), mask=None)``
    returns ``(encoder_out, hidden_out, hiddens)``:

    * ``hidden_out`` (B, T, 512): after_norm trunk output — FlexiCodec's
      default semantic representation (strip the 4 query frames:
      ``hidden_out[:, 4:]``).
    * ``encoder_out`` (B, T, 512): after the 20 tp blocks + tp_norm (the
      ASR head's input).
    * ``hiddens`` (num_blocks, B, T, 512): per-layer outputs of the trunk
      (encoders0 + 49 scan layers), for ``semantic_layer_idx`` selection.
    """

    config: SANMConfig

    @nn.compact
    def __call__(self, feats, mask=None):
        cfg = self.config
        x = feats * (cfg.output_size ** 0.5)
        x = x + sinusoidal_pe(x.shape[1], cfg.input_size, x.dtype)[None]
        x = SANMLayer(cfg.output_size, cfg.attention_heads, cfg.linear_units,
                      cfg.kernel_size, cfg.sanm_shift,
                      in_size=cfg.input_size, name="encoders0_0")(x, mask)
        first = x
        x, per_layer = _layer_scan(cfg, cfg.num_blocks - 1, "encoders")(
            x, mask)
        hidden_out = nn.LayerNorm(name="after_norm")(x)
        tp, _ = _layer_scan(cfg, cfg.tp_blocks, "tp_encoders")(
            hidden_out, mask)
        encoder_out = nn.LayerNorm(name="tp_norm")(tp)
        hiddens = jnp.concatenate([first[None], per_layer], axis=0)
        return encoder_out, hidden_out, hiddens


class SenseVoiceSemanticEncoder(nn.Module):
    """The teacher as FlexiCodec consumes it: prepend the 4 query frames,
    run the SAN-M encoder, strip the queries back off
    (modeling_flexicodec.py:60-76).

    ``__call__(feats (B, T, 560))`` -> semantic features (B, T, 512)
    (``hidden_out[:, 4:]`` — the ``semantic_layer_idx is None`` default).
    ``layer_mean=(lo, hi)`` instead averages trunk layers [lo, hi)
    (the list/range form of ``semantic_layer_idx``)."""

    config: SANMConfig
    layer_mean: Optional[tuple] = None

    @nn.compact
    def __call__(self, feats, lengths=None):
        cfg = self.config
        table = self.param(
            "query_embed", nn.initializers.normal(1.0),
            (cfg.embed_vocab, cfg.input_size))
        ids = jnp.asarray(
            [cfg.lang_id, 1, 2, cfg.textnorm_id], jnp.int32)
        queries = jnp.broadcast_to(
            table[ids][None].astype(feats.dtype),
            (feats.shape[0], 4, cfg.input_size))
        x = jnp.concatenate([queries, feats], axis=1)
        mask = None
        if lengths is not None:
            mask = (jnp.arange(x.shape[1])[None]
                    < (lengths + 4)[:, None]).astype(feats.dtype)
        _, hidden_out, hiddens = SANMEncoder(cfg, name="encoder")(x, mask)
        if self.layer_mean is not None:
            lo, hi = self.layer_mean
            sel = jnp.mean(hiddens[lo:hi], axis=0)
            return sel[:, 4:]
        return hidden_out[:, 4:]
