"""FlexiCodec / DualCodec alternative line — reference-weight-compatible.

Mirrors the vendored stack parameter-for-parameter so the published
checkpoints (hf jiaqili3/flexicodec, pulled by adaptive/infer.py:10-212)
convert directly (utils/convert_hcodec.convert_flexicodec):

* DAC acoustic path: conv Encoder (dac_model.py:79-110), projected
  L2-normalized RVQ (dac_quantize.py:13-288), conv Decoder
  (dac_model.py:111-160 == nn/blocks.WaveGenerator family).
* Semantic path: WNConv1x1 + ConvNeXt adapter (modeling_flexicodec.py:
  270-306, cnn.py blocks), FSQ quantizer (fsq_wrapper.py + fsq_quantizer.py
  — note that vendored FSQ bounds with ``tan`` and ``1-eps``, unlike the
  BiCodec FSQ's ``atanh``/``1+eps``; reproduced exactly), ConvNeXt decoder
  back to the DAC latent space.
* DualCodec coupling (forward_features, modeling_flexicodec.py:560-720):
  the acoustic RVQ quantizes the RESIDUAL ``encoder(x) - decoded_semantic``
  and decode sums the two streams.
* Optional similarity alignment + query-token aggregation + Mimi bottleneck
  (the FlexiCodec mode) reuses the same static-shape machinery as
  models/hcodec/adaptive.py.

The SenseVoice teacher is fully ported: its FEATURE FRONTEND (funasr
WavFrontend: kaldi fbank + LFR + CMVN, feature_extractors.py:8-28) is exact
in ``ops/fbank.py``, and the SAN-M ENCODER (SenseVoiceEncoderSmall, the
``semantic_model.encoder(...)`` the reference runs in-line at
modeling_flexicodec.py:54-95,122) is golden-pinned in ``models/ssl/sanm.py``
with a funasr-layout converter (``utils.convert.convert_sensevoice``). Use
``sensevoice_teacher_semantic`` below for the full raw-audio -> semantic
path; the model itself still takes the semantic stream as an ARGUMENT
(``semantic_repr``) so any frozen teacher plugs in. Only the released
SenseVoiceSmall *weights* remain env-blocked (zero egress). Distillation
against a frozen teacher is in ``__call__`` via ``teacher_feats``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.blocks import (
    ConvNeXtStack, DACResidualUnit, Snake1d, WaveGenerator,
)
from ...nn.conv import Conv1d
from ...nn.mimi import MimiProjectedTransformer
from ...ops import dsp
from .adaptive import (
    QueryTokenAggregator, degroup, group_ids_from_lengths, inject_length,
    extract_length, similarity_group_ids,
)


# ---------------------------------------------------------------------------
# DAC acoustic path (dac_model.py / dac_quantize.py)
# ---------------------------------------------------------------------------

class DACEncoderBlock(nn.Module):
    """3 dilated residual units -> Snake -> strided conv
    (dac_model.py:58-77)."""

    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(dim, dilation=d, name=f"res_{i}")(x)
        x = Snake1d(dim, name="snake")(x)
        return Conv1d(
            self.output_dim, 2 * self.stride, stride=self.stride,
            padding=-(-self.stride // 2), weight_norm=True, name="down",
        )(x)


class DACEncoder(nn.Module):
    """wav (B, T, 1) -> latents (B, T/prod(rates), latent_dim)
    (dac_model.py:79-110)."""

    d_model: int = 64
    rates: Sequence[int] = (2, 4, 8, 8)
    latent_dim: int = 1024

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.d_model, 7, padding=3, weight_norm=True,
                   name="conv_pre")(x)
        dim = self.d_model
        for i, s in enumerate(self.rates):
            dim *= 2
            x = DACEncoderBlock(dim, s, name=f"block_{i}")(x)
        x = Snake1d(dim, name="snake_post")(x)
        return Conv1d(self.latent_dim, 3, padding=1, weight_norm=True,
                      name="conv_post")(x)


class DACVectorQuantize(nn.Module):
    """Projected, L2-normalized VQ (dac_quantize.py:13-97): in_proj 1x1 ->
    cosine NN in codebook_dim space -> out_proj 1x1."""

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = Conv1d(self.codebook_dim, 1, padding=0,
                              weight_norm=True, name="in_proj")
        self.out_proj = Conv1d(self.input_dim, 1, padding=0,
                               weight_norm=True, name="out_proj")
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim))

    def _nn(self, z_e):
        """(B, T, cd) -> indices (B, T); L2-normalized euclidean == cosine.
        HIGHEST precision on the distance matmul (CLAUDE.md #5: default MXU
        precision flips near-tie assignments vs fp32)."""
        enc = z_e / jnp.maximum(
            jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
        cb = self.codebook / jnp.maximum(
            jnp.linalg.norm(self.codebook, axis=-1, keepdims=True), 1e-12)
        dist = (jnp.sum(enc**2, -1, keepdims=True)
                - 2 * jnp.einsum("btd,nd->btn", enc, cb,
                                 precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(cb**2, -1)[None, None])
        return jnp.argmin(dist, axis=-1)

    def __call__(self, z):
        """z (B, T, D) -> (z_q, commitment, codebook_loss, indices, z_e)."""
        z_e = self.in_proj(z)
        idx = self._nn(z_e)
        z_qp = self.codebook[idx]
        commitment = jnp.mean(
            jnp.square(z_e - jax.lax.stop_gradient(z_qp)), axis=(1, 2))
        codebook_loss = jnp.mean(
            jnp.square(z_qp - jax.lax.stop_gradient(z_e)), axis=(1, 2))
        z_qp = z_e + jax.lax.stop_gradient(z_qp - z_e)
        return self.out_proj(z_qp), commitment, codebook_loss, idx, z_e

    def decode_code(self, idx):
        return self.codebook[idx]


class DACRVQ(nn.Module):
    """Residual stack of DACVectorQuantize (dac_quantize.py:123-288);
    eval-mode semantics (no quantizer dropout)."""

    input_dim: int
    n_codebooks: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.quantizers = [
            DACVectorQuantize(self.input_dim, self.codebook_size,
                              self.codebook_dim, name=f"quantizers_{i}")
            for i in range(self.n_codebooks)
        ]

    def __call__(self, z):
        z_q = jnp.zeros_like(z)
        residual = z
        commitment = 0.0
        codebook_loss = 0.0
        codes = []
        for q in self.quantizers:
            z_q_i, c_i, cb_i, idx_i, _ = q(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            commitment += jnp.mean(c_i)
            codebook_loss += jnp.mean(cb_i)
            codes.append(idx_i)
        return z_q, jnp.stack(codes, axis=-1), commitment, codebook_loss

    def encode(self, z):
        _, codes, _, _ = self(z)
        return codes  # (B, T, nq)

    def from_codes(self, codes):
        """(B, T, nq) -> (B, T, D)."""
        z_q = 0.0
        for i, q in enumerate(self.quantizers):
            z_q = z_q + q.out_proj(q.decode_code(codes[..., i]))
        return z_q


# ---------------------------------------------------------------------------
# Semantic path (fsq_wrapper.py / fsq_quantizer.py + ConvNeXt adapters)
# ---------------------------------------------------------------------------

class FlexiFSQ(nn.Module):
    """The vendored FSQ (fsq_quantizer.py:41-183): Linear project_in/out
    around per-channel rounding. NOTE the vendored bound formula uses
    ``(1 - eps)`` and ``tan`` (fsq_quantizer.py:84-89) — different from
    lucidrains/BiCodec FSQ; reproduced for checkpoint parity."""

    input_dim: int
    levels: Sequence[int] = (8, 8, 8, 8, 8)

    def setup(self):
        cd = len(self.levels)
        if self.input_dim != cd:
            self.project_in = nn.Dense(cd, name="project_in")
            self.project_out = nn.Dense(self.input_dim, name="project_out")
        else:
            self.project_in = lambda x: x
            self.project_out = lambda x: x

    @property
    def codebook_size(self):
        return int(np.prod(self.levels))

    def _consts(self):
        levels = jnp.asarray(list(self.levels), jnp.float32)
        basis = jnp.asarray(np.concatenate(
            [[1], np.cumprod(self.levels[:-1])]).astype(np.float32))
        return levels, basis

    def bound(self, z, eps: float = 1e-3):
        levels, _ = self._consts()
        half_l = (levels - 1) * (1 - eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.tan(offset / half_l)  # vendored quirk: tan, not atanh
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z):
        q = jnp.round(self.bound(z))
        q = z + jax.lax.stop_gradient(q - z)  # round_ste
        half_width = jnp.asarray([lv // 2 for lv in self.levels], jnp.float32)
        return q / half_width

    def codes_to_indices(self, zhat):
        levels, basis = self._consts()
        half_width = jnp.asarray([lv // 2 for lv in self.levels], jnp.float32)
        shifted = zhat * half_width + half_width
        return jnp.sum(shifted * basis, axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices):
        levels, basis = self._consts()
        half_width = jnp.asarray([lv // 2 for lv in self.levels], jnp.float32)
        nc = jnp.mod(jnp.floor_divide(
            indices[..., None].astype(jnp.float32), basis), levels)
        return self.project_out((nc - half_width) / half_width)

    def __call__(self, x):
        """x (B, T, D) -> (quantized (B, T, D), indices (B, T))."""
        z = self.project_in(x)
        codes = self.quantize(z)
        indices = self.codes_to_indices(codes)
        return self.project_out(codes), indices

    def from_indices(self, indices):
        return self.indices_to_codes(indices)


class SemanticEncoderCNX(nn.Module):
    """WNConv1x1 (ssl_dim -> convnext_dim) + N ConvNeXt blocks
    (modeling_flexicodec.py:270-281)."""

    convnext_dim: int
    num_layers: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv1d(self.convnext_dim, 1, padding=0, weight_norm=True,
                   name="proj")(x)
        return ConvNeXtStack(
            dim=self.convnext_dim, intermediate_dim=2048,
            num_layers=self.num_layers, causal=self.causal, name="blocks",
        )(x)


class SemanticDecoderCNX(nn.Module):
    """N ConvNeXt blocks + WNConv1x1 (convnext_dim -> dac latent)
    (modeling_flexicodec.py:295-306)."""

    convnext_dim: int
    out_dim: int
    num_layers: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        x = ConvNeXtStack(
            dim=self.convnext_dim, intermediate_dim=2048,
            num_layers=self.num_layers, causal=self.causal, name="blocks",
        )(x)
        return Conv1d(self.out_dim, 1, padding=0, weight_norm=True,
                      name="proj")(x)


# ---------------------------------------------------------------------------
# The codec
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FlexiCodecConfig:
    """Defaults follow modeling_flexicodec.py:98-155 (the in-repo defaults;
    the HF yaml configs feed the same knobs)."""

    sample_rate: int = 24000
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    latent_dim: int = 1024  # encoder_dim * 2**len(rates)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    # semantic branch
    ssl_dim: int = 1024
    convnext_dim: int = 768
    convnext_layers: int = 4
    fsq_levels: Tuple[int, ...] = (8, 8, 8, 8, 8)
    decode_semantic_for_codec: bool = True
    is_causal: bool = False
    semantic_downsample_factor: int = 2
    # FlexiCodec mode (similarity alignment); False = original DualCodec
    use_similarity_alignment: bool = False
    similarity_threshold: float = 0.9
    max_tokens_per_group: int = 8
    use_query_token_aggregator: bool = False
    agg_layers: int = 6
    agg_heads: int = 8
    agg_ff: int = 2048
    agg_context: int = 24
    use_bottleneck_transformer: bool = False
    bottleneck_layers: int = 6
    bottleneck_heads: int = 8
    bottleneck_ff: int = 2048
    bottleneck_context: int = 24
    # distillation (modeling_flexicodec loss; teacher enters as argument)
    lambda_distill: float = 15.0

    @property
    def hop_length(self):
        return int(np.prod(self.encoder_rates))


class FlexiCodec(nn.Module):
    config: FlexiCodecConfig = FlexiCodecConfig()

    def setup(self):
        cfg = self.config
        self.encoder = DACEncoder(
            d_model=cfg.encoder_dim, rates=cfg.encoder_rates,
            latent_dim=cfg.latent_dim, name="encoder")
        self.quantizer = DACRVQ(
            input_dim=cfg.latent_dim, n_codebooks=cfg.n_codebooks,
            codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
            name="quantizer")
        self.decoder = WaveGenerator(
            input_channel=cfg.latent_dim, channels=cfg.decoder_dim,
            rates=cfg.decoder_rates,
            kernel_sizes=tuple(2 * r for r in cfg.decoder_rates),
            name="decoder")
        self.convnext_encoder = SemanticEncoderCNX(
            cfg.convnext_dim, cfg.convnext_layers, cfg.is_causal,
            name="convnext_encoder")
        self.convnext_decoder = SemanticDecoderCNX(
            cfg.convnext_dim, cfg.latent_dim, cfg.convnext_layers,
            cfg.is_causal, name="convnext_decoder")
        self.semantic_vq = FlexiFSQ(
            cfg.convnext_dim, cfg.fsq_levels, name="semantic_vq")
        if cfg.use_query_token_aggregator:
            agg = dict(num_heads=cfg.agg_heads, num_layers=cfg.agg_layers,
                       dim_feedforward=cfg.agg_ff, context=cfg.agg_context)
            self.semantic_aggregator = QueryTokenAggregator(
                dim=cfg.ssl_dim, **agg, name="semantic_aggregator")
            self.acoustic_aggregator = QueryTokenAggregator(
                dim=cfg.latent_dim, **agg, name="acoustic_aggregator")
        if cfg.use_bottleneck_transformer:
            self.bottleneck_transformer = MimiProjectedTransformer(
                d_model=cfg.latent_dim, input_dim=cfg.latent_dim,
                output_dim=cfg.latent_dim,
                num_layers=cfg.bottleneck_layers,
                num_heads=cfg.bottleneck_heads,
                dim_feedforward=cfg.bottleneck_ff, causal=False,
                context=cfg.bottleneck_context, name="bottleneck_transformer")

    # -- semantic helpers ---------------------------------------------------

    def downsample_semantic(self, feats):
        """avg_pool by semantic_downsample_factor
        (modeling_flexicodec.py:404-417); feats (B, T, C)."""
        f = self.config.semantic_downsample_factor
        if f == 1:
            return feats
        t = feats.shape[1] // f * f
        return jnp.mean(
            feats[:, :t].reshape(feats.shape[0], t // f, f, -1), axis=2)

    def _streams(self, wav, semantic_repr):
        """Encode both streams at matched frame rates."""
        z = self.encoder(wav[..., None])  # (B, T, D)
        sem = self.downsample_semantic(semantic_repr)
        t = min(z.shape[1], sem.shape[1])
        return z[:, :t], sem[:, :t]

    # -- DualCodec mode -----------------------------------------------------

    def __call__(self, wav, semantic_repr, teacher_feats=None,
                 train: bool = False, threshold=None):
        """Training/eval forward. DualCodec when alignment off; FlexiCodec
        (aggregated) otherwise. Returns dict like forward_features."""
        cfg = self.config
        z, sem = self._streams(wav, semantic_repr)
        if cfg.use_similarity_alignment:
            gid = similarity_group_ids(
                sem, threshold if threshold is not None
                else cfg.similarity_threshold, cfg.max_tokens_per_group)
            sem_agg, counts = self.semantic_aggregator(sem, gid)
            ac_agg, _ = self.acoustic_aggregator(z, gid)
        else:
            gid, counts = None, None
            sem_agg, ac_agg = sem, z
        sem_enc = self.convnext_encoder(sem_agg)
        sem_q, sem_codes = self.semantic_vq(sem_enc)
        if cfg.use_similarity_alignment:
            # zero the PADDING groups before the semantic ConvNeXt decoder:
            # its receptive field mixes tail context into the last valid
            # groups, and a zero tail is exactly what the reference's
            # unpadded sequence sees (its convs zero same-pad past the end).
            # decode() masks by extracted lengths the same way — without
            # this, encode's data-dependent padding codes and decode's -1
            # sentinel would reconstruct DIFFERENT tail context and
            # decode(encode(x)) would diverge from forward over the final
            # receptive field.
            sem_q = jnp.where((counts > 0)[..., None], sem_q, 0.0)
        sem_dec = (self.convnext_decoder(sem_q)
                   if cfg.decode_semantic_for_codec else sem_q)
        ac_q, ac_codes, commitment, codebook_loss = self.quantizer(
            ac_agg - sem_dec)
        latent = ac_q + sem_dec
        if cfg.use_similarity_alignment:
            latent = degroup(latent, gid)
        if cfg.use_bottleneck_transformer:
            latent = self.bottleneck_transformer(latent)
        recon = self.decoder(latent)[..., 0]
        out = {
            "recons": recon,
            "acoustic_codes": ac_codes,
            "semantic_codes": sem_codes,
            "commit_loss": commitment + codebook_loss,
            "group_ids": gid,
        }
        if teacher_feats is not None:
            # distill the quantized semantic stream toward the frozen
            # teacher (modeling_flexicodec distill loss; stop-grad target)
            tgt = jax.lax.stop_gradient(
                self.downsample_semantic(teacher_feats))
            t = min(sem_dec.shape[1], tgt.shape[1], sem_q.shape[1])
            pred = sem_q[:, :t]
            d = min(pred.shape[-1], tgt.shape[-1])
            se = jnp.square(pred[..., :d] - tgt[:, :t, :d])
            if counts is not None:
                # aligned mode: average only over VALID groups — padding
                # rows are zeroed above and carry no semantic content
                w = (counts[:, :t] > 0).astype(se.dtype)[..., None]
                out["distill_loss"] = cfg.lambda_distill * (
                    jnp.sum(se * w) / jnp.maximum(jnp.sum(w) * d, 1.0))
            else:
                out["distill_loss"] = cfg.lambda_distill * jnp.mean(se)
        return out

    def encode(self, wav, semantic_repr, threshold=None):
        """-> (acoustic_codes, semantic_codes). Aligned mode: group-rate
        codes with lengths injected (codec_adaptive.py:68-80 convention);
        DualCodec mode: frame-rate codes, semantic (B, T, 1)."""
        cfg = self.config
        z, sem = self._streams(wav, semantic_repr)
        if not cfg.use_similarity_alignment:
            sem_enc = self.convnext_encoder(sem)
            _, sem_codes = self.semantic_vq(sem_enc)
            sem_dec = (self.convnext_decoder(self.semantic_vq.from_indices(
                sem_codes)) if cfg.decode_semantic_for_codec
                else self.semantic_vq.from_indices(sem_codes))
            ac_codes = self.quantizer.encode(z - sem_dec)
            return ac_codes, sem_codes[..., None]
        gid = similarity_group_ids(
            sem, threshold if threshold is not None
            else cfg.similarity_threshold, cfg.max_tokens_per_group)
        sem_agg, counts = self.semantic_aggregator(sem, gid)
        ac_agg, _ = self.acoustic_aggregator(z, gid)
        sem_enc = self.convnext_encoder(sem_agg)
        _, sem_codes = self.semantic_vq(sem_enc)
        sem_q = self.semantic_vq.from_indices(sem_codes)
        # padding groups -> zero before the ConvNeXt decoder (see __call__)
        sem_q = jnp.where((counts > 0)[..., None], sem_q, 0.0)
        sem_dec = (self.convnext_decoder(sem_q)
                   if cfg.decode_semantic_for_codec else sem_q)
        ac_codes = self.quantizer.encode(ac_agg - sem_dec)
        ac_codes = inject_length(ac_codes, counts, cfg.codebook_size)
        sem_codes = inject_length(
            sem_codes[..., None], counts, self.semantic_vq.codebook_size)
        return ac_codes, sem_codes

    def decode(self, acoustic_codes, semantic_codes):
        """Inverse of encode (decode_from_codes,
        modeling_flexicodec.py:470-515)."""
        cfg = self.config
        if cfg.use_similarity_alignment:
            ac_plain, lengths = extract_length(
                acoustic_codes, cfg.codebook_size)
            sem_plain, _ = extract_length(
                semantic_codes, self.semantic_vq.codebook_size)
            t = int(acoustic_codes.shape[1])
            gid = group_ids_from_lengths(lengths, t)
            sem_q = self.semantic_vq.from_indices(
                jnp.maximum(sem_plain[..., 0], 0))
            # padding groups (-1 sentinel, length 0) -> zero, matching
            # encode's masking so both sides feed the ConvNeXt decoder
            # identical tail context
            sem_q = jnp.where((lengths > 0)[..., None], sem_q, 0.0)
            sem_dec = (self.convnext_decoder(sem_q)
                       if cfg.decode_semantic_for_codec else sem_q)
            ac_q = self.quantizer.from_codes(jnp.maximum(ac_plain, 0))
            latent = degroup(ac_q + sem_dec, gid)
            if cfg.use_bottleneck_transformer:
                latent = self.bottleneck_transformer(latent)
            return self.decoder(latent)[..., 0]
        sem_q = self.semantic_vq.from_indices(semantic_codes[..., 0])
        sem_dec = (self.convnext_decoder(sem_q)
                   if cfg.decode_semantic_for_codec else sem_q)
        latent = self.quantizer.from_codes(acoustic_codes) + sem_dec
        if cfg.use_bottleneck_transformer:
            latent = self.bottleneck_transformer(latent)
        return self.decoder(latent)[..., 0]


def fbank_semantic(wav, sample_rate=16000, n_mels=80, hop=160,
                   out_dim=1024):
    """Log-fbank fallback for the absent SenseVoice frontend (documented
    environment substitution): (B, T) -> (B, T/hop, n_mels) tiled to
    out_dim. Use teacher_features for a real SSL teacher."""
    mel = dsp.mel_spectrogram(
        wav, sample_rate, 512, 400, hop, 0.0, sample_rate / 2, n_mels)
    h = jnp.swapaxes(jnp.log(mel + 1e-6), -1, -2)
    reps = -(-out_dim // n_mels)
    return jnp.tile(h, (1, 1, reps))[..., :out_dim]


def sensevoice_semantic(wav, cmvn_file, out_dim=1024, sample_rate=16000):
    """Semantic stream from the EXACT reference teacher frontend (funasr
    WavFrontend: kaldi fbank 80 x 25/10 ms + LFR 7/6 + CMVN from ``am.mvn``
    — feature_extractors.py:13-21, reproduced in ops/fbank.py). The 560-dim
    frames are tiled/truncated to ``out_dim`` (the SenseVoice encoder that
    would normally project them is weight-unavailable in this image).

    (B, T) -> (B, ceil(T_frames/6), out_dim).
    """
    from ...ops.fbank import SenseVoiceFrontend

    front = SenseVoiceFrontend(cmvn_file=cmvn_file, sample_rate=sample_rate)
    feats = front(wav)                                   # (B, T_lfr, 560)
    d = front.output_dim
    reps = -(-out_dim // d)
    return jnp.tile(feats, (1, 1, reps))[..., :out_dim]


def sensevoice_teacher_semantic(sanm_variables, wav, cmvn_file, config=None,
                                layer_mean=None, sample_rate=16000,
                                out_dim=None):
    """Semantic stream from the FULL reference teacher: the exact funasr
    frontend (``ops/fbank.py``) into the ported SAN-M encoder
    (``models/ssl/sanm.py``), exactly what the reference runs in-line
    (modeling_flexicodec.py:54-95 — prepend_inputs + encoder + strip the 4
    query frames; ``layer_mean=(lo, hi)`` is the ``semantic_layer_idx``
    list form).

    (B, T) audio -> (B, ceil(T_frames/6), 512), stop-gradded. ``out_dim``
    tiles/truncates the 512-d output for models converted at another
    ``ssl_dim`` (real FlexiCodec+SenseVoice checkpoints are 512 — no-op).
    """
    from ...models.ssl.sanm import (SenseVoiceSemanticEncoder,
                                    sensevoice_small_config)
    from ...ops.fbank import SenseVoiceFrontend

    front = SenseVoiceFrontend(cmvn_file=cmvn_file, sample_rate=sample_rate)
    feats = front(wav)                                   # (B, T_lfr, 560)
    enc = SenseVoiceSemanticEncoder(config or sensevoice_small_config(),
                                    layer_mean=layer_mean)
    sem = jax.lax.stop_gradient(enc.apply(sanm_variables, feats))
    if out_dim is not None and sem.shape[-1] != out_dim:
        reps = -(-out_dim // sem.shape[-1])
        sem = jnp.tile(sem, (1, 1, reps))[..., :out_dim]
    return sem


def match_frame_rate(feats, num_frames: int):
    """Linearly resample (B, T, C) features along time to ``num_frames``.

    The model consumes the semantic stream at 2x the acoustic frame rate:
    it downsamples by ``semantic_downsample_factor`` (2) and then only
    min-trims a small residual mismatch against the acoustic latents
    (modeling_flexicodec.py:576 docstring, :617-623 trim). Teacher
    frontends run at their own rates (SenseVoice fbank+LFR = 16.67 Hz,
    plain fbank = 100 Hz), so callers must rate-match to
    ``2 * (samples // hop_length)`` before encoding or the trim truncates
    the reconstruction to the shorter stream."""
    t = feats.shape[1]
    if t == num_frames:
        return feats
    pos = jnp.linspace(0.0, float(t - 1), num_frames)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w = (pos - lo.astype(pos.dtype))[None, :, None]
    return feats[:, lo] * (1.0 - w) + feats[:, hi] * w


def teacher_features(ssl_model, ssl_variables, wav):
    """Frozen-teacher target (SenseVoice role; any frozen models/ssl
    encoder). Mean of all hidden states, stop-gradded."""
    from ...models.ssl.wav2vec2 import hubert_features

    return jax.lax.stop_gradient(
        hubert_features(ssl_model.apply(ssl_variables, wav))
    )
