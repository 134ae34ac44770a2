"""HCodecTokenizer: the user-facing tokenize/detokenize API bundling the frozen
SSL frontend with the codec (HCodec-1.0/audio_tokenizer.py:18-66,
HCodec-2.0/audio_tokenizer.py:19-79).

A plain Python orchestrator over jitted pure functions — the codec and SSL
variables are closed over as constants so XLA folds and fuses the whole
tokenize/detokenize pipeline into single programs.
"""
from __future__ import annotations

import math
from functools import partial


import jax
import jax.numpy as jnp
import numpy as np

from ...ops import dsp
from ...utils.initialization import init_on_cpu
from ..ssl import wav2vec2 as ssl_mod
from .codec import HCodec, HCodecConfig, hcodec10_config, hcodec20_config


class HCodecTokenizer:
    """tokenize(wav (B, T)) -> (acoustic_codes, semantic_codes) each (B, nq, T');
    detokenize(acoustic, semantic) -> wav (B, T). Reference code layout
    (b, nq, t) is kept at this API boundary."""

    def __init__(
        self,
        codec_config: HCodecConfig,
        codec_variables,
        ssl_config: ssl_mod.SSLConfig,
        ssl_variables,
        dtype=None,
    ):
        """``dtype=jnp.bfloat16`` turns on the bf16 SERVING mode: weights
        and activations flow bf16 through the SSL frontend, SEANet/semantic
        encoders and the ConvNeXt decoder, with fp32 islands where accuracy
        demands it — the VQ distance matmuls (ops/quant.py: fp32 HIGHEST
        regardless of input dtype; near-tie argmins flip at lower
        precision) and the ISTFT head's exp/phase/complex math
        (nn/heads.py). bf16 halves the HBM traffic the conv stacks are
        bound by. Token IDs may differ from the fp32 path near codebook
        ties (the features ENTERING the distance islands carry bf16
        rounding); fidelity parity work uses the fp32 default, serving
        throughput uses bf16 (tests/test_hcodec.py pins closeness)."""
        self.config = codec_config
        self.codec = HCodec(codec_config)
        self.dtype = dtype
        if dtype is not None:
            from ...utils.precision import cast_floating

            codec_variables = cast_floating(codec_variables, dtype)
            ssl_variables = cast_floating(ssl_variables, dtype)
        self.codec_variables = codec_variables
        self.ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        self.ssl_variables = ssl_variables
        self.hop_length = codec_config.hop_length

        # variables are jit ARGUMENTS (not closures): closed-over weights get
        # serialized into the HLO, which breaks remote-compile backends and
        # bloats compile time
        in_dtype = dtype if dtype is not None else jnp.float32

        @jax.jit
        def _features(ssl_variables, wav16k):
            # |x|^0.3-compressed all-layer HuBERT mean (audio_tokenizer.py:35-48)
            padded = jnp.pad(wav16k.astype(in_dtype), [(0, 0), (160, 160)])
            hs = self.ssl.apply(ssl_variables, padded)
            return ssl_mod.hubert_features(hs)

        @jax.jit
        def _encode(codec_variables, wav, feats):
            return self.codec.apply(
                codec_variables, wav.astype(in_dtype)[..., None],
                feats.astype(in_dtype), method="encode"
            )

        @jax.jit
        def _decode(codec_variables, acoustic, semantic):
            wav = self.codec.apply(
                codec_variables, acoustic, semantic, method="decode"
            )
            # waveform contract stays fp32 in either mode (the ISTFT island
            # already computes it in fp32)
            return wav.astype(jnp.float32)

        self._features = lambda wav: _features(self.ssl_variables, wav)
        self._encode = lambda wav, feats: _encode(self.codec_variables, wav, feats)
        self._decode = lambda ac, sem: _decode(self.codec_variables, ac, sem)

    @classmethod
    def from_random(cls, key, codec_config=None, ssl_config=None):
        """Randomly initialized tokenizer (tests / benchmarks)."""
        codec_config = codec_config or hcodec10_config()
        ssl_config = ssl_config or ssl_mod.hubert_base_config()
        k1, k2, k3 = jax.random.split(key, 3)
        codec = HCodec(codec_config)
        t = 4 * codec_config.hop_length
        wav = np.zeros((1, t, 1), np.float32)
        feat_rate = codec_config.hop_length // (
            320 if codec_config.version == "1.0" else 960
        )
        # SSL features arrive at 50 Hz (of the 16 kHz stream)
        t16 = t if codec_config.sample_rate == 16000 else t // 3
        feats = np.zeros((1, t16 // 320, codec_config.feat_dim), np.float32)
        codec_vars = init_on_cpu(
            lambda: codec.init({"params": k1, "quant": k2}, wav, feats,
                               train=False)
        )
        ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        ssl_vars = init_on_cpu(lambda: ssl.init(k3, np.zeros((1, 16320), np.float32)))
        return cls(codec_config, codec_vars, ssl_config, ssl_vars)

    def pad_wav(self, wav: jnp.ndarray) -> jnp.ndarray:
        t = wav.shape[-1]
        pad = -(-t // self.hop_length) * self.hop_length - t
        return jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(0, pad)])

    def extract_features(self, wav: jnp.ndarray) -> jnp.ndarray:
        if self.config.sample_rate != 16000:
            wav16 = dsp.resample(wav, self.config.sample_rate, 16000)
        else:
            wav16 = wav
        return self._features(wav16)

    def tokenize(self, wav: jnp.ndarray):
        wav = self.pad_wav(wav)
        feats = self.extract_features(wav)
        acoustic, semantic = self._encode(wav, feats)  # (B, T, nq)
        return jnp.swapaxes(acoustic, -1, -2), jnp.swapaxes(semantic, -1, -2)

    def detokenize(self, acoustic_codes, semantic_codes):
        return self._decode(
            jnp.swapaxes(acoustic_codes, -1, -2),
            jnp.swapaxes(semantic_codes, -1, -2),
        )
