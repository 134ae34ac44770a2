"""UniTok end-to-end pipeline: audio -> H-Codec tokens -> multitask LM ->
tokens -> audio.

Realizes the full UniTok-audio system description (index.html:305: frozen
H-Codec encoder/decoder around the delay-pattern LM; tasks
SR/TSE/SS/VC/LASS/CODEC/AE). The acoustic and semantic RVQ streams interleave
on the codebook axis (acoustic nq ‖ semantic nq = K codebooks per 25 Hz
frame); conditioning audio enters through the frozen SSL features the
tokenizer already computes.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..hcodec.tokenizer import HCodecTokenizer
from .model import UNITOK_TASKS, UniTokConfig, UniTokLM


class UniTokPipeline:
    def __init__(self, tokenizer: HCodecTokenizer, lm: UniTokLM, lm_params):
        self.tokenizer = tokenizer
        self.lm = lm
        self.lm_params = lm_params
        nq = tokenizer.config.num_quantizers
        assert lm.cfg.num_quantizers == nq and lm.cfg.num_streams == 2

    @classmethod
    def from_random(cls, key, codec_config=None, ssl_config=None,
                    lm_config: Optional[UniTokConfig] = None):
        k1, k2 = jax.random.split(key)
        tok = HCodecTokenizer.from_random(k1, codec_config, ssl_config)
        cfg = lm_config or UniTokConfig(
            codebook_size=tok.config.codebook_size,
            num_quantizers=tok.config.num_quantizers,
        )
        lm = UniTokLM(cfg)
        t = 4
        dummy_codes = jnp.zeros((1, t, cfg.num_codebooks), jnp.int32)
        dummy_audio = jnp.zeros((1, t, cfg.audio_dim))
        params = lm.init(k2, 0, None, None, dummy_audio, dummy_codes)
        return cls(tok, lm, params)

    def audio_to_codes(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav (B, T) -> interleaved codes (B, T', 2*nq)."""
        acoustic, semantic = self.tokenizer.tokenize(wav)  # (B, nq, T')
        return jnp.concatenate(
            [jnp.swapaxes(acoustic, -1, -2), jnp.swapaxes(semantic, -1, -2)],
            axis=-1,
        )

    def codes_to_audio(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (B, T', 2*nq) -> wav (B, T)."""
        nq = self.tokenizer.config.num_quantizers
        acoustic = jnp.swapaxes(codes[..., :nq], -1, -2)
        semantic = jnp.swapaxes(codes[..., nq:], -1, -2)
        return self.tokenizer.detokenize(acoustic, semantic)

    def train_loss(self, params, task: str, input_wav, target_wav,
                   caption_feats=None, ref_wav=None):
        """Teacher-forced multitask loss: conditions on the input audio's SSL
        features, predicts the target's codec tokens."""
        codes = self.audio_to_codes(target_wav)
        input_feats = self.tokenizer.extract_features(input_wav)
        ref_feats = (
            self.tokenizer.extract_features(ref_wav)
            if ref_wav is not None else None
        )
        return self.lm.apply(
            params, UNITOK_TASKS[task], caption_feats, ref_feats, input_feats,
            codes,
        )

    def generate(self, task: str, input_wav, rng, num_frames: Optional[int] = None,
                 caption_feats=None, ref_wav=None, do_sample: bool = True):
        """-> generated wav (B, T)."""
        input_feats = self.tokenizer.extract_features(
            self.tokenizer.pad_wav(input_wav)
        )
        if num_frames is None:
            num_frames = input_wav.shape[-1] // self.tokenizer.hop_length
        ref_feats = (
            self.tokenizer.extract_features(ref_wav)
            if ref_wav is not None else None
        )
        codes = self.lm.apply(
            self.lm_params, UNITOK_TASKS[task], caption_feats, ref_feats,
            input_feats, num_frames, rng, method="generate",
            do_sample=do_sample, batch=input_wav.shape[0],
        )
        return self.codes_to_audio(codes)
