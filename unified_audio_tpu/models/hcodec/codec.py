"""H-Codec 1.0 and 2.0: dual-stream (acoustic + semantic) neural audio codecs.

* HCodec-1.0 (16 kHz, 25 Hz tokens, hop 640): SEANet acoustic encoder + 2x
  ResidualVQ(4x1024) + ConvNeXt/ISTFT decoder — vq/codec.py:21-198,
  vq/codec_decoder.py:14-67.
* HCodec-2.0 (48 kHz, 12.5 Hz tokens, hop 3840): STFT-domain encoder
  (vq/codec_encoder.py:12-79), repeat-interleave decoder
  (vq/codec_decoder.py:14-72), RVQ 16x1024 — conf/large_12.5hz_config.yaml.

All modules channels-last; encode/decode are pure jit-able functions of the
variables dict.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.blocks import ConvNeXtBlock, ConvNeXtStack, ResnetBlock, SEANetEncoder
from ...nn.conv import CausalConv1d, SubPixelConvTranspose1d
from ...nn.heads import ISTFTHead
from ...nn.transformer import Transformer
from ...ops import dsp
from ...ops.quant import ResidualVQ
from .semantic import SemanticDecoder, SemanticEncoder


class PriorNet(nn.Module):
    """2 Resnet -> 2-layer hybrid transformer -> 2 Resnet -> GroupNorm
    (codec_decoder.py:36-53)."""

    dim: int
    transformer_layers: int = 2
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.dim, causal=self.causal, name="res0")(x)
        x = ResnetBlock(self.dim, causal=self.causal, name="res1")(x)
        x = Transformer(
            hidden_size=self.dim,
            intermediate_size=min(self.dim * 4, 4096),
            num_heads=self.dim // 64 if self.dim % 64 == 0 else 8,
            num_layers=self.transformer_layers,
            causal=self.causal,
            name="transformer",
        )(x)
        x = ResnetBlock(self.dim, causal=self.causal, name="res2")(x)
        x = ResnetBlock(self.dim, causal=self.causal, name="res3")(x)
        return nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(x)


class CodecDecoder10(nn.Module):
    """HCodec-1.0 decoder: sub-pixel x2 upsample embed -> prior net -> 12
    ConvNeXt -> ISTFT head (codec_decoder.py:14-67)."""

    dim: int = 768
    intermediate_dim: int = 2304
    convnext_layers: int = 12
    n_fft: int = 1280
    hop_length: int = 320
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        x = SubPixelConvTranspose1d(self.dim, kernel_size=5, stride=2,
                                    causal=self.causal, name="embed")(x)
        x = PriorNet(self.dim, causal=self.causal, name="prior_net")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = ConvNeXtStack(
            dim=self.dim, intermediate_dim=self.intermediate_dim,
            num_layers=self.convnext_layers, causal=self.causal,
            layer_scale_init_value=1 / self.convnext_layers, name="post_net",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)
        return ISTFTHead(self.n_fft, self.hop_length, name="head")(x)


class CodecEncoder20(nn.Module):
    """HCodec-2.0 STFT-domain encoder (codec_encoder.py:12-79):
    complex STFT -> [log-mag ‖ phase/pi] -> conv embed -> ConvNeXt stack ->
    transformer -> strided conv to the target frame rate."""

    dim: int = 1536
    intermediate_dim: int = 4608
    dimension: int = 512
    n_fft: int = 1920
    hop_length: int = 960
    convnext_layers: int = 24
    transformer_layers: int = 2
    target_frame_rate: float = 12.5
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        # x: (B, T) waveform, length divisible by hop_length
        pad = (self.n_fft - self.hop_length) // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
        spec = dsp.stft(xp, self.n_fft, self.hop_length, center=False)  # (B,F,T)
        mag = jnp.log(jnp.clip(jnp.abs(spec), min=1e-5))
        phase = jnp.angle(spec) / jnp.pi
        h = jnp.concatenate([mag, phase], axis=-2)  # (B, 2F, T)
        h = jnp.swapaxes(h, -1, -2)  # (B, T, 2F)

        h = CausalConv1d(self.dim, 3, causal=self.causal, name="embed")(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = ConvNeXtStack(
            dim=self.dim, intermediate_dim=self.intermediate_dim,
            num_layers=self.convnext_layers, causal=self.causal,
            layer_scale_init_value=1 / self.convnext_layers, name="prior_net",
        )(h)
        h = Transformer(
            hidden_size=self.dim,
            intermediate_size=min(self.dim * 4, 4096),
            num_heads=self.dim // 64,
            num_layers=self.transformer_layers,
            causal=self.causal,
            name="post_net",
        )(h)
        h = nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(h)
        stride = int(50 / self.target_frame_rate)
        return CausalConv1d(self.dimension, stride * 2 + 1, stride=stride,
                            causal=self.causal, name="out")(h)


class CodecDecoder20(nn.Module):
    """HCodec-2.0 decoder: repeat-interleave upsample -> conv embed -> prior ->
    ConvNeXt stack -> ISTFT head (HCodec-2.0 vq/codec_decoder.py:14-72)."""

    dim: int = 1536
    intermediate_dim: int = 4608
    convnext_layers: int = 32
    n_fft: int = 1920
    hop_length: int = 960
    transformer_layers: int = 2
    target_frame_rate: float = 12.5
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        factor = int(50 / self.target_frame_rate)
        x = jnp.repeat(x, factor, axis=-2)
        x = CausalConv1d(self.dim, factor + 1, causal=self.causal, name="embed")(x)
        x = PriorNet(self.dim, transformer_layers=self.transformer_layers,
                     causal=self.causal, name="prior_net")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = ConvNeXtStack(
            dim=self.dim, intermediate_dim=self.intermediate_dim,
            num_layers=self.convnext_layers, causal=self.causal,
            layer_scale_init_value=1 / self.convnext_layers, name="post_net",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)
        return ISTFTHead(self.n_fft, self.hop_length, name="head")(x)


@dataclass(frozen=True)
class HCodecConfig:
    """Shared dual-stream codec config. Defaults = HCodec-1.0 shipped model
    (vq/codec.py:30-136); hcodec20() gives the 48 kHz large_12.5hz config."""

    version: str = "1.0"
    sample_rate: int = 16000
    hop_length: int = 640  # samples per token (25 Hz)
    # acoustic encoder (1.0) / STFT encoder (2.0)
    latent_dim: int = 512
    seanet_filters: int = 32
    # constructor-order ratios (seanet.py:114 applies them REVERSED); the
    # 1.0 model passes [8,5,4,2] (downsamples 2,4,5,8), the 1.5 config
    # passes [2,4,5,8] (downsamples 8,5,4,2) — config_adaptive_v3.yaml:16
    seanet_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    # quantizers
    codebook_size: int = 1024
    num_quantizers: int = 4
    quantize_dropout: bool = True
    # decoder
    decoder_dim: int = 768
    decoder_intermediate_dim: int = 2304
    decoder_convnext_layers: int = 12
    n_fft: int = 1280
    istft_hop: int = 320
    # semantic branch
    feat_dim: int = 768
    semantic_encode_channels: int = 768
    semantic_ratios: Tuple[float, ...] = (1, 1)
    semantic_strides: Tuple[int, ...] = (2, 1)
    # 2.0-only
    encoder_dim: int = 1536
    encoder_intermediate_dim: int = 4608
    encoder_convnext_layers: int = 24
    target_frame_rate: float = 12.5
    causal: bool = False


def hcodec10_config(**kw) -> HCodecConfig:
    return HCodecConfig(**kw)


def hcodec20_config(**kw) -> HCodecConfig:
    base = dict(
        version="2.0",
        sample_rate=48000,
        hop_length=3840,  # 48000 / 12.5
        latent_dim=512,
        codebook_size=1024,
        num_quantizers=16,
        quantize_dropout=False,
        decoder_dim=1536,
        decoder_intermediate_dim=4608,
        decoder_convnext_layers=32,
        n_fft=1920,
        istft_hop=960,
        semantic_encode_channels=1536,
        semantic_ratios=(1, 1, 1),
        semantic_strides=(2, 1, 2),
        encoder_dim=1536,
        encoder_intermediate_dim=4608,
        encoder_convnext_layers=24,
        target_frame_rate=12.5,
    )
    base.update(kw)
    return HCodecConfig(**base)


class HCodec(nn.Module):
    """Dual-stream codec: acoustic + semantic RVQ streams, joint decoder.

    forward(wav (B, L, 1), feat (B, Tf, 768), train) ->
        (recon (B, L'), pred_feat, commit_loss)
    encode(wav, feat) -> (acoustic_codes (B, T, nq), semantic_codes (B, T, nq))
    decode(acoustic_codes, semantic_codes) -> wav (B, L')
    """

    config: HCodecConfig
    vq_axis_name: Optional[str] = None

    def setup(self):
        cfg = self.config
        if cfg.version == "1.0":
            self.encoder = SEANetEncoder(
                dimension=cfg.latent_dim, n_filters=cfg.seanet_filters,
                ratios=cfg.seanet_ratios, causal=cfg.causal, name="encoder",
            )
            self.decoder = CodecDecoder10(
                dim=cfg.decoder_dim,
                intermediate_dim=cfg.decoder_intermediate_dim,
                convnext_layers=cfg.decoder_convnext_layers,
                n_fft=cfg.n_fft, hop_length=cfg.istft_hop, causal=cfg.causal,
                name="decoder",
            )
        else:
            self.encoder = CodecEncoder20(
                dim=cfg.encoder_dim,
                intermediate_dim=cfg.encoder_intermediate_dim,
                dimension=cfg.latent_dim,
                n_fft=cfg.n_fft, hop_length=cfg.istft_hop,
                convnext_layers=cfg.encoder_convnext_layers,
                target_frame_rate=cfg.target_frame_rate, causal=cfg.causal,
                name="encoder",
            )
            self.decoder = CodecDecoder20(
                dim=cfg.decoder_dim,
                intermediate_dim=cfg.decoder_intermediate_dim,
                convnext_layers=cfg.decoder_convnext_layers,
                n_fft=cfg.n_fft, hop_length=cfg.istft_hop,
                target_frame_rate=cfg.target_frame_rate, causal=cfg.causal,
                name="decoder",
            )
        vq_kwargs = dict(
            dim=cfg.latent_dim,
            codebook_size=cfg.codebook_size,
            num_quantizers=cfg.num_quantizers,
            quantize_dropout=cfg.quantize_dropout,
            axis_name=self.vq_axis_name,
        )
        self.quantizer = ResidualVQ(**vq_kwargs, name="quantizer")
        self.semantic_quantizer = ResidualVQ(**vq_kwargs, name="semantic_quantizer")
        self.semantic_encoder = SemanticEncoder(
            input_channels=cfg.feat_dim,
            encode_channels=cfg.semantic_encode_channels,
            out_channels=cfg.latent_dim,
            channel_ratios=cfg.semantic_ratios,
            strides=cfg.semantic_strides,
            name="semantic_encoder",
        )
        self.semantic_decoder = SemanticDecoder(
            code_dim=cfg.latent_dim,
            output_channels=cfg.feat_dim,
            decode_channels=cfg.semantic_encode_channels,
            channel_ratios=cfg.semantic_ratios,
            strides=cfg.semantic_strides,
            name="semantic_decoder",
        )

    def _encode_latents(self, wav, feat):
        if self.config.version == "1.0":
            emb = self.encoder(wav)  # (B, T, D), wav (B, L, 1)
        else:
            emb = self.encoder(wav[..., 0])
        semantic_emb = self.semantic_encoder(feat)
        return emb, semantic_emb

    def __call__(self, wav, feat, train: bool = False):
        emb, semantic_emb = self._encode_latents(wav, feat)
        quantized, _, commit = self.quantizer(emb, train=train)
        quantized_sem, _, commit_sem = self.semantic_quantizer(
            semantic_emb, train=train
        )
        recon = self.decoder(jnp.concatenate([quantized, quantized_sem], axis=-1))
        pred_feat = self.semantic_decoder(quantized_sem)
        return recon, pred_feat, jnp.mean(commit) + jnp.mean(commit_sem)

    def encode(self, wav, feat):
        emb, semantic_emb = self._encode_latents(wav, feat)
        acoustic_codes = self.quantizer.encode(emb)
        semantic_codes = self.semantic_quantizer.encode(semantic_emb)
        return acoustic_codes, semantic_codes  # (B, T, nq) each

    def decode(self, acoustic_codes, semantic_codes):
        acoustic_emb = self.quantizer.decode(acoustic_codes)
        semantic_emb = self.semantic_quantizer.decode(semantic_codes)
        return self.decoder(jnp.concatenate([acoustic_emb, semantic_emb], axis=-1))
