"""HCodecTokenizer 1.5: adaptive-frame-rate tokenize/detokenize
(HCodec-1.5/audio_tokenizer.py:38-124). Codes carry their group durations in
the index (len-injected), so detokenize needs no side channel; returns the
length-annotated dict the reference API exposes."""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.initialization import init_on_cpu
from ..ssl import wav2vec2 as ssl_mod
from .adaptive import AdaptiveConfig, AdaptiveHCodec


class AdaptiveHCodecTokenizer:
    def __init__(self, config: AdaptiveConfig, codec_variables,
                 ssl_config: ssl_mod.SSLConfig, ssl_variables):
        self.config = config
        self.codec = AdaptiveHCodec(config)
        self.codec_variables = codec_variables
        self.ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        self.ssl_variables = ssl_variables
        self.hop_length = config.base.hop_length

        @jax.jit
        def _features(ssl_variables, wav):
            # xlsr layers {11,14,16}/3 + signed cube-root compression
            # (HCodec-1.5/audio_tokenizer.py:52-67)
            padded = jnp.pad(wav, [(0, 0), (160, 160)])
            hs = self.ssl.apply(ssl_variables, padded)
            mix = ssl_mod.xlsr_features(hs)
            sign = jnp.where(mix > 0, 1.0, -1.0)
            return sign * jnp.abs(mix) ** 0.3

        @jax.jit
        def _encode(codec_variables, wav, feats):
            return self.codec.apply(codec_variables, wav[..., None], feats,
                                    method="encode")

        @jax.jit
        def _decode(codec_variables, acoustic, semantic):
            return self.codec.apply(codec_variables, acoustic, semantic,
                                    method="decode")

        @jax.jit
        def _token_rate(codec_variables, wav, feats):
            return self.codec.apply(codec_variables, wav[..., None], feats,
                                    method="token_rate")

        self._features = lambda w: _features(self.ssl_variables, w)
        self._encode = lambda w, f: _encode(self.codec_variables, w, f)
        self._decode = lambda a, s: _decode(self.codec_variables, a, s)
        self._token_rate = lambda w, f: _token_rate(self.codec_variables, w, f)

    @classmethod
    def from_random(cls, key, config=None, ssl_config=None):
        config = config or AdaptiveConfig()
        ssl_config = ssl_config or ssl_mod.wav2vec2_large_xlsr53_config()
        k1, k2, k3 = jax.random.split(key, 3)
        codec = AdaptiveHCodec(config)
        t = 4 * config.base.hop_length
        wav = np.zeros((1, t, 1), np.float32)
        feats = np.zeros((1, t // 320, config.base.feat_dim), np.float32)
        codec_vars = init_on_cpu(
            lambda: codec.init({"params": k1, "quant": k2}, wav, feats,
                               train=False)
        )
        ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        ssl_vars = init_on_cpu(lambda: ssl.init(k3, np.zeros((1, 16320),
                                                             np.float32)))
        return cls(config, codec_vars, ssl_config, ssl_vars)

    def pad_wav(self, wav):
        t = wav.shape[-1]
        pad = -(-t // self.hop_length) * self.hop_length - t
        return jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])

    def tokenize(self, wav) -> Dict[str, jnp.ndarray]:
        """-> dict with length-injected codes (b, nq, G layout at the API
        boundary like 1.0) plus the realized token rate."""
        wav = self.pad_wav(wav)
        feats = self._features(wav)
        acoustic, semantic = self._encode(wav, feats)  # (B, G, nq)
        rate = self._token_rate(wav, feats)
        return {
            "acoustic_codes": jnp.swapaxes(acoustic, -1, -2),
            "semantic_codes": jnp.swapaxes(semantic, -1, -2),
            "token_rate_hz": rate,
        }

    def detokenize(self, acoustic_codes, semantic_codes):
        return self._decode(
            jnp.swapaxes(acoustic_codes, -1, -2),
            jnp.swapaxes(semantic_codes, -1, -2),
        )
