"""BiCodecTokenizer: wav -> (global, semantic) tokens and back
(UniSE model/bicodec/audio_tokenizer.py:30-121).

Mirrors the reference pipeline exactly: per-utterance zero-mean/unit-var input
normalization (the HF Wav2Vec2FeatureExtractor step), XLSR layer-{11,14,16}/3
feature mix, 6-second tiled reference clip for the speaker branch.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ...utils.initialization import init_on_cpu
from ..ssl import wav2vec2 as ssl_mod
from .bicodec import BiCodec, BiCodecConfig


def normalize_input(wav: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """HF Wav2Vec2FeatureExtractor do_normalize: per-sequence (x-mean)/std."""
    mean = jnp.mean(wav, axis=-1, keepdims=True)
    var = jnp.var(wav, axis=-1, keepdims=True)
    return (wav - mean) / jnp.sqrt(var + eps)


class BiCodecTokenizer:
    def __init__(self, config: BiCodecConfig, bicodec_variables,
                 ssl_config: ssl_mod.SSLConfig, ssl_variables):
        self.config = config
        self.model = BiCodec(config)
        self.variables = bicodec_variables
        self.ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        self.ssl_variables = ssl_variables

        # variables are jit ARGUMENTS (not closures); see hcodec/tokenizer.py
        @jax.jit
        def _features(ssl_variables, wav):
            hs = self.ssl.apply(ssl_variables, normalize_input(wav))
            return ssl_mod.xlsr_features(hs)

        @jax.jit
        def _tokenize(variables, feat, ref_wav):
            return self.model.apply(variables, feat, ref_wav,
                                    method="tokenize")

        @jax.jit
        def _detokenize(variables, semantic, global_):
            return self.model.apply(variables, semantic, global_,
                                    method="detokenize")

        self._features = lambda wav: _features(self.ssl_variables, wav)
        self._tokenize = lambda feat, ref: _tokenize(self.variables, feat, ref)
        self._detokenize = lambda sem, g: _detokenize(self.variables, sem, g)

    @classmethod
    def from_random(cls, key, config=None, ssl_config=None):
        config = config or BiCodecConfig()
        ssl_config = ssl_config or ssl_mod.wav2vec2_large_xlsr53_config()
        k1, k2 = jax.random.split(key)
        model = BiCodec(config)
        wav = np.zeros((1, config.latent_hop_length * 10), np.float32)
        feat = np.zeros((1, 10, config.feat_dim), np.float32)
        variables = init_on_cpu(lambda: model.init(k1, feat, wav))
        ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        ssl_vars = init_on_cpu(lambda: ssl.init(k2, np.zeros((1, 16320), np.float32)))
        return cls(config, variables, ssl_config, ssl_vars)

    def get_ref_clip(self, wav: jnp.ndarray) -> jnp.ndarray:
        """6-second (hop-aligned) reference clip, tiled if short
        (audio_tokenizer.py:54-72)."""
        cfg = self.config
        ref_len = (
            int(cfg.sample_rate * cfg.ref_segment_duration)
            // cfg.latent_hop_length * cfg.latent_hop_length
        )
        t = wav.shape[-1]
        if ref_len > t:
            wav = jnp.tile(wav, (1, ref_len // t + 1))
        return wav[:, :ref_len]

    def extract_features(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self._features(wav)

    def tokenize(self, wav: jnp.ndarray):
        """-> (global_tokens (B, 1, 32), semantic_tokens (B, T)) matching the
        reference return layout (audio_tokenizer.py:92-105)."""
        ref_wav = self.get_ref_clip(wav)
        feat = self.extract_features(wav)
        semantic, global_ = self._tokenize(feat, ref_wav)  # (B,T), (B,32,nq)
        return jnp.swapaxes(global_, -1, -2), semantic

    def tokenize_with_vars(self, variables, ssl_variables, wav: jnp.ndarray):
        """Pure tokenize for embedding inside an OUTER jit (the SFT train
        step): variables arrive as traced ARGUMENTS. Going through the
        closure-based jitted helpers instead would bake the full frozen
        weights into the outer program as constants — hundreds of MB of HLO
        that the remote compiler rejects or chews on for tens of minutes
        (CLAUDE.md #3)."""
        ref_wav = self.get_ref_clip(wav)
        hs = self.ssl.apply(ssl_variables, normalize_input(wav))
        feat = ssl_mod.xlsr_features(hs)
        semantic, global_ = self.model.apply(variables, feat, ref_wav,
                                             method="tokenize")
        return jnp.swapaxes(global_, -1, -2), semantic

    def detokenize(self, global_tokens, semantic_tokens):
        """global (B, 1, 32), semantic (B, T) -> wav (B, T*hop... )."""
        return self._detokenize(
            semantic_tokens, jnp.swapaxes(global_tokens, -1, -2)
        )
