"""BiCodec: semantic tokens (FVQ over SSL features) + global speaker tokens
(Residual-FSQ), DAC-style wave generation (bicodec.py:31-231).

Flow (reference bicodec.py:113-199):
  semantic: feat -> Encoder(Vocos + sampling) -> FVQ -> z_q
  global:   ref mel -> SpeakerEncoder -> d_vector (+ tokens)
  decode:   prenet(z_q, d_vector) -> (+ d_vector) -> WaveGenerator -> wav
            postnet(prenet out) -> pred_feat (training aux)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...nn.blocks import SamplingBlock, VocosBackbone, WaveGenerator
from ...ops import dsp
from ...ops.quant import FactorizedVectorQuantize
from .speaker import SpeakerEncoder


class FeatEncoder(nn.Module):
    """Vocos backbone + down-sampling blocks -> project
    (encoder_decoder/feat_encoder.py:29-90). (B, T, in) -> (B, T', out)."""

    vocos_dim: int
    vocos_intermediate_dim: int
    vocos_num_layers: int
    out_channels: int
    sample_ratios: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = VocosBackbone(
            dim=self.vocos_dim, intermediate_dim=self.vocos_intermediate_dim,
            num_layers=self.vocos_num_layers, name="encoder",
        )(x)
        for i, ratio in enumerate(self.sample_ratios):
            x = SamplingBlock(dim=self.vocos_dim, groups=self.vocos_dim,
                              downsample_scale=ratio, name=f"down_{i}")(x)
            x = VocosBackbone(
                dim=self.vocos_dim, intermediate_dim=self.vocos_intermediate_dim,
                num_layers=2, name=f"down_vocos_{i}",
            )(x)
        return nn.Dense(self.out_channels, name="project")(x)


class FeatDecoder(nn.Module):
    """Up-sampling + conditioned Vocos backbone
    (encoder_decoder/feat_decoder.py:29-97). (B, T, in), cond (B, C) ->
    (B, T*prod(ratios), out)."""

    vocos_dim: int
    vocos_intermediate_dim: int
    vocos_num_layers: int
    out_channels: int
    condition_dim: Optional[int] = None
    sample_ratios: Sequence[int] = (1, 1)
    use_tanh_at_final: bool = False

    @nn.compact
    def __call__(self, x, condition=None):
        x = nn.Dense(self.vocos_dim, name="linear_pre")(x)
        for i, ratio in enumerate(self.sample_ratios):
            x = SamplingBlock(dim=self.vocos_dim, groups=self.vocos_dim,
                              upsample_scale=ratio, name=f"up_{i}")(x)
            x = VocosBackbone(
                dim=self.vocos_dim, intermediate_dim=self.vocos_intermediate_dim,
                num_layers=2, name=f"up_vocos_{i}",
            )(x)
        x = VocosBackbone(
            dim=self.vocos_dim, intermediate_dim=self.vocos_intermediate_dim,
            num_layers=self.vocos_num_layers, condition_dim=self.condition_dim,
            name="vocos_backbone",
        )(x, condition)
        x = nn.Dense(self.out_channels, name="linear")(x)
        return jnp.tanh(x) if self.use_tanh_at_final else x


@dataclass(frozen=True)
class BiCodecConfig:
    """Defaults follow the SparkTTS-0.5B BiCodec shipped with UniSE."""

    sample_rate: int = 16000
    latent_hop_length: int = 320  # 50 Hz semantic tokens
    ref_segment_duration: float = 6.0
    # mel (for the speaker branch)
    mel_n_fft: int = 1024
    mel_win: int = 640
    mel_hop: int = 320
    mel_fmin: float = 10.0
    mel_fmax: float = 8000.0
    num_mels: int = 128
    # semantic branch
    feat_dim: int = 1024  # wav2vec2-large hidden
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    latent_dim: int = 1024
    sample_ratios: Tuple[int, ...] = (1, 1)
    codebook_size: int = 8192
    codebook_dim: int = 8
    commitment: float = 0.25
    # speaker branch
    spk_out_dim: int = 1024
    spk_latent_dim: int = 128
    token_num: int = 32
    fsq_levels: Tuple[int, ...] = (4, 4, 4, 4, 4, 4)
    # wave generator
    wave_channels: int = 1536
    wave_rates: Tuple[int, ...] = (8, 5, 4, 2)
    wave_kernels: Tuple[int, ...] = (16, 11, 8, 4)


class BiCodec(nn.Module):
    config: BiCodecConfig = BiCodecConfig()
    vq_axis_name: Optional[str] = None

    def setup(self):
        cfg = self.config
        self.encoder = FeatEncoder(
            vocos_dim=cfg.vocos_dim,
            vocos_intermediate_dim=cfg.vocos_intermediate_dim,
            vocos_num_layers=cfg.vocos_num_layers,
            out_channels=cfg.latent_dim,
            sample_ratios=cfg.sample_ratios,
            name="encoder",
        )
        self.quantizer = FactorizedVectorQuantize(
            input_dim=cfg.latent_dim,
            codebook_size=cfg.codebook_size,
            codebook_dim=cfg.codebook_dim,
            commitment=cfg.commitment,
            axis_name=self.vq_axis_name,
            name="quantizer",
        )
        self.speaker_encoder = SpeakerEncoder(
            input_dim=cfg.num_mels,
            out_dim=cfg.spk_out_dim,
            latent_dim=cfg.spk_latent_dim,
            token_num=cfg.token_num,
            fsq_levels=cfg.fsq_levels,
            name="speaker_encoder",
        )
        self.prenet = FeatDecoder(
            vocos_dim=cfg.vocos_dim,
            vocos_intermediate_dim=cfg.vocos_intermediate_dim,
            vocos_num_layers=cfg.vocos_num_layers,
            out_channels=cfg.latent_dim,
            condition_dim=cfg.spk_out_dim,
            sample_ratios=cfg.sample_ratios,
            name="prenet",
        )
        self.postnet = FeatDecoder(
            vocos_dim=cfg.vocos_dim,
            vocos_intermediate_dim=cfg.vocos_intermediate_dim,
            vocos_num_layers=cfg.vocos_num_layers,
            out_channels=cfg.feat_dim,
            sample_ratios=(1, 1),
            name="postnet",
        )
        self.decoder = WaveGenerator(
            input_channel=cfg.latent_dim,
            channels=cfg.wave_channels,
            rates=cfg.wave_rates,
            kernel_sizes=cfg.wave_kernels,
            name="decoder",
        )

    def mel(self, wav):
        """Speaker-branch mel (B, T) -> (B, T', num_mels); slaney norm/scale
        (bicodec.py:201-221)."""
        cfg = self.config
        m = dsp.mel_spectrogram(
            wav, cfg.sample_rate, cfg.mel_n_fft, cfg.mel_win, cfg.mel_hop,
            cfg.mel_fmin, cfg.mel_fmax, cfg.num_mels,
        )  # (B, M, T)
        return jnp.swapaxes(m, -1, -2)

    def __call__(self, feat, ref_wav, train: bool = False):
        """Training forward (bicodec.py:113-149). feat (B, T, feat_dim),
        ref_wav (B, Tref)."""
        z = self.encoder(feat)
        vq = self.quantizer(z, train=train)
        mel = self.mel(ref_wav)
        x_vector, d_vector = self.speaker_encoder(mel, train)
        x = self.prenet(vq["z_q"], d_vector)
        pred_feat = self.postnet(x)
        x = x + d_vector[:, None, :]
        wav_recon = self.decoder(x)[..., 0]
        return {
            "vq_loss": vq["vq_loss"],
            "perplexity": vq["perplexity"],
            "cluster_size": vq["active_num"],
            "recons": wav_recon,
            "pred_feat": pred_feat,
            "x_vector": x_vector,
            "d_vector": d_vector,
        }

    def tokenize(self, feat, ref_wav):
        """-> (semantic_tokens (B, T), global_tokens (B, token_num, nq))."""
        z = self.encoder(feat)
        semantic_tokens = self.quantizer.tokenize(z)
        global_tokens = self.speaker_encoder.tokenize(self.mel(ref_wav))
        return semantic_tokens, global_tokens

    def detokenize(self, semantic_tokens, global_tokens):
        z_q = self.quantizer.detokenize(semantic_tokens)
        d_vector = self.speaker_encoder.detokenize(global_tokens)
        x = self.prenet(z_q, d_vector)
        x = x + d_vector[:, None, :]
        return self.decoder(x)[..., 0]
