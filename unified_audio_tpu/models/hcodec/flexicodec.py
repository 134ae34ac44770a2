"""FlexiCodec / DualCodec alternative line (HCodec-1.5 adaptive/ vendored
stack: dac_model.py:79-160 DAC conv encoder/decoder, dac_quantize.py RVQ,
fsq_quantizer.py:41-183 + fsq_wrapper.py FSQ semantic quantizer, cnn.py
ConvNeXt adapter, feature_extractors.py:8-57 fbank frontend).

Dual-stream design: a DAC convolutional acoustic branch (RVQ) and an
fbank-driven semantic branch (ConvNeXt adapter + FSQ), decoded jointly by a
DAC generator.

Semantic-teacher distillation (modeling_flexicodec.py:786-789): a frozen SSL
teacher (the SenseVoice role; here any frozen encoder from models/ssl, e.g.
HuBERT/wav2vec2) produces target representations, and the quantized semantic
latents are decoded through a small ConvNeXt head trained with
``lambda_distill * MSE(stop_grad(teacher), head(sq))``. Pass
``teacher_feats`` to ``__call__`` to get the loss; ``teacher_features``
builds the target from an SSL model. The inference driver equivalent of
adaptive/infer.py:10-212 is ``cli.py codec`` (load -> encode -> decode ->
wav).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.blocks import (
    ConvNeXtStack, DACResidualUnit, Snake1d, WaveGenerator,
)
from ...nn.conv import Conv1d
from ...ops import dsp
from ...ops.quant import FSQ, ResidualVQ


class DACEncoderBlock(nn.Module):
    """3 dilated residual units -> Snake -> strided downsampling conv
    (mirror of the WaveGenerator decoder block; dac_model.py:79-117)."""

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
            padding=(self.stride + 1) // 2, weight_norm=True, name="down",
        )(x)


class DACEncoder(nn.Module):
    """wav (B, T, 1) -> latents (B, T/prod(rates), latent_dim)."""

    d_model: int = 64
    rates: Sequence[int] = (2, 4, 5, 8)
    latent_dim: int = 512

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


class FSQSemanticQuantizer(nn.Module):
    """ConvNeXt adapter -> projection -> FSQ -> projection
    (fsq_quantizer.py:41-183 + cnn.py adapter)."""

    input_dim: int
    dim: int
    levels: Sequence[int] = (8, 5, 5, 5)
    adapter_layers: int = 2

    def setup(self):
        self.adapter = ConvNeXtStack(
            dim=self.dim, intermediate_dim=self.dim * 3,
            num_layers=self.adapter_layers, name="adapter",
        )
        self.pre = nn.Dense(self.dim, name="pre")
        self.project_in = nn.Dense(len(self.levels), name="project_in")
        self.project_out = nn.Dense(self.dim, name="project_out")
        self.fsq = FSQ(levels=tuple(self.levels))

    @property
    def codebook_size(self):
        return self.fsq.codebook_size

    def __call__(self, feats):
        h = self.adapter(self.pre(feats))
        z = self.project_in(h)
        codes, indices = self.fsq(z)
        return self.project_out(codes), indices

    def decode_indices(self, indices):
        codes = self.fsq.indices_to_codes(indices)
        return self.project_out(codes)


@dataclass(frozen=True)
class FlexiCodecConfig:
    sample_rate: int = 16000
    hop_length: int = 320  # prod(rates) -> 50 Hz latents
    d_model: int = 64
    rates: Tuple[int, ...] = (2, 4, 5, 8)
    latent_dim: int = 512
    codebook_size: int = 1024
    num_quantizers: int = 8
    # semantic branch
    n_mels: int = 80
    fbank_hop: int = 160  # 10 ms frames, pooled x2 to 50 Hz
    semantic_dim: int = 512
    fsq_levels: Tuple[int, ...] = (8, 5, 5, 5)
    # frozen-teacher distillation target (modeling_flexicodec.py:113-123)
    teacher_dim: int = 768  # SSL hidden size (HuBERT-base in SenseVoice role)
    lambda_distill: float = 15.0
    distill_head_layers: int = 2


class FlexiCodec(nn.Module):
    config: FlexiCodecConfig = FlexiCodecConfig()
    vq_axis_name: Optional[str] = None

    def setup(self):
        cfg = self.config
        self.encoder = DACEncoder(
            d_model=cfg.d_model, rates=cfg.rates, latent_dim=cfg.latent_dim,
            name="encoder",
        )
        self.quantizer = ResidualVQ(
            dim=cfg.latent_dim, codebook_size=cfg.codebook_size,
            num_quantizers=cfg.num_quantizers, axis_name=self.vq_axis_name,
            name="quantizer",
        )
        self.semantic_quantizer = FSQSemanticQuantizer(
            input_dim=cfg.n_mels, dim=cfg.semantic_dim,
            levels=cfg.fsq_levels, name="semantic_quantizer",
        )
        self.fuse = nn.Dense(cfg.latent_dim, name="fuse")
        # distillation head: quantized semantic latents -> teacher space
        # (the reference decodes sq through a semantic decoder and matches
        # the frozen teacher representation, modeling_flexicodec.py:786-789)
        self.distill_stack = ConvNeXtStack(
            dim=cfg.semantic_dim, intermediate_dim=cfg.semantic_dim * 3,
            num_layers=cfg.distill_head_layers, name="distill_stack",
        )
        self.distill_proj = nn.Dense(cfg.teacher_dim, name="distill_proj")
        self.decoder = WaveGenerator(
            input_channel=cfg.latent_dim, channels=16 * cfg.d_model,
            rates=tuple(reversed(cfg.rates)),
            kernel_sizes=tuple(2 * r for r in reversed(cfg.rates)),
            name="decoder",
        )

    def fbank(self, wav):
        """(B, T) -> (B, T/hop/2, n_mels) 50 Hz log-fbank
        (feature_extractors.py:8-57 SenseVoice-style frontend)."""
        cfg = self.config
        mel = dsp.mel_spectrogram(
            wav, cfg.sample_rate, 512, 400, cfg.fbank_hop, 0.0,
            cfg.sample_rate / 2, cfg.n_mels,
        )  # (B, M, T')
        logmel = jnp.log(mel + 1e-6)
        h = jnp.swapaxes(logmel, -1, -2)
        t = h.shape[1] // 2 * 2
        return 0.5 * (h[:, 0:t:2] + h[:, 1:t:2])  # 100 Hz -> 50 Hz

    def _encode_latents(self, wav):
        z = self.encoder(wav[..., None])
        sem_feats = self.fbank(wav)
        t = min(z.shape[1], sem_feats.shape[1])
        return z[:, :t], sem_feats[:, :t]

    def __call__(self, wav, teacher_feats=None, train: bool = False):
        """With ``teacher_feats`` (B, T', teacher_dim) from a FROZEN SSL
        teacher, adds the distillation loss
        lambda * MSE(stop_grad(teacher), head(sq)) — the SenseVoice
        supervision of the semantic branch (modeling_flexicodec.py:789)."""
        z, sem_feats = self._encode_latents(wav)
        zq, codes, commit = self.quantizer(z, train=train)
        sq, sem_indices = self.semantic_quantizer(sem_feats)
        fused = self.fuse(jnp.concatenate([zq, sq], axis=-1))
        recon = self.decoder(fused)[..., 0]
        out = {
            "recons": recon,
            "acoustic_codes": codes,
            "semantic_codes": sem_indices,
            "commit_loss": jnp.mean(commit),
            "semantic_latents": sq,
        }
        if teacher_feats is not None:
            pred = self.distill_proj(self.distill_stack(sq))
            t = min(pred.shape[1], teacher_feats.shape[1])
            target = jax.lax.stop_gradient(teacher_feats[:, :t])
            out["distill_loss"] = self.config.lambda_distill * jnp.mean(
                jnp.square(pred[:, :t] - target)
            )
        return out

    def encode(self, wav):
        z, sem_feats = self._encode_latents(wav)
        codes = self.quantizer.encode(z)
        _, sem_indices = self.semantic_quantizer(sem_feats)
        return codes, sem_indices

    def decode(self, acoustic_codes, semantic_codes):
        zq = self.quantizer.decode(acoustic_codes)
        sq = self.semantic_quantizer.decode_indices(semantic_codes)
        fused = self.fuse(jnp.concatenate([zq, sq], axis=-1))
        return self.decoder(fused)[..., 0]


def teacher_features(ssl_model, ssl_variables, wav):
    """Frozen-teacher target for the distillation loss: mean of all SSL
    hidden states (the SenseVoice-encoder role, feature_extractors.py:8-57 +
    modeling_flexicodec.py:36 layer selection; here the layer mix follows
    the HuBERT recipe). Call OUTSIDE the training jit or inside with frozen
    variables; the loss stop-grads the result either way."""
    from ...models.ssl.wav2vec2 import hubert_features

    return jax.lax.stop_gradient(
        hubert_features(ssl_model.apply(ssl_variables, wav))
    )
