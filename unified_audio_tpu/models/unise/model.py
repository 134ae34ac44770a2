"""UniSE: AR-LM speech enhancement on BiCodec tokens (SE / TSE / SS).

Rebuild of the reference LightningModule glue (UniSE model/model.py:20-353):
frozen BiCodec tokenizer + frozen WavLM conditioner + trainable LLM_SFT. Audio
longer than 5 s is wrap-padded and reshaped into a batch of 5-second segments
(model.py:175-180) — on TPU those segments decode **in parallel** through the
scan-based generator instead of sequentially.

Task flows (model.py:170-291):
  se  — enhance, no enrollment
  tse — target-speaker extraction with an enrollment utterance
  ss  — separation cascade: se -> use output as enrollment -> tse (s1) ->
        rtse (s2)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops import dsp
from ...utils.initialization import init_on_cpu
from ..bicodec.tokenizer import BiCodecTokenizer
from ..lm.llama import LlamaConfig
from ..lm.sft import LLMSFT
from ..ssl import wav2vec2 as ssl_mod

TASK_MAP = {"se": 0, "tse": 1, "rtse": 2}


@dataclass(frozen=True)
class UniSEConfig:
    sample_rate: int = 16000
    segment_seconds: float = 5.0
    # STFT frontend (conf/config.yaml:124-128)
    n_fft: int = 640
    hop_length: int = 320
    win_length: int = 640
    n_mels: int = 80
    feats_dim: int = 768  # WavLM hidden
    global_tokens: int = 32  # speaker token count (BiCodec token_num)
    llm: LlamaConfig = field(default_factory=LlamaConfig)

    @property
    def segment_len(self) -> int:
        return int(self.segment_seconds * self.sample_rate)


class UniSE:
    """Python orchestrator; LM params are the only trainable state (the
    reference excludes tokenizer/WavLM from checkpoints, model.py:82-91)."""

    def __init__(
        self,
        config: UniSEConfig,
        tokenizer: BiCodecTokenizer,
        wavlm_config: ssl_mod.SSLConfig,
        wavlm_variables,
        sft_params=None,
        rng=None,
    ):
        self.config = config
        self.tokenizer = tokenizer
        self.wavlm = ssl_mod.Wav2Vec2Model(wavlm_config)
        self.wavlm_variables = wavlm_variables
        self.sft = LLMSFT(config.llm, num_tasks=len(TASK_MAP),
                          feats_dim=config.feats_dim)
        if sft_params is None:
            assert rng is not None
            t = int(config.segment_seconds * 50)
            dummy_feats = np.zeros((1, t, config.feats_dim), np.float32)
            g = np.zeros((1, config.global_tokens), np.int32)
            s = np.zeros((1, t), np.int32)
            sft_params = init_on_cpu(
                lambda: self.sft.init(rng, 0, None, dummy_feats, g, s)
            )
        self.sft_params = sft_params

        _wavlm_feats = jax.jit(self.wavlm_feats_pure)
        self._wavlm_feats = lambda wav: _wavlm_feats(self.wavlm_variables, wav)

        @partial(jax.jit, static_argnames=("task", "semantic_length", "do_sample"))
        def _generate(params, task, enroll_feats, mix_feats, rng,
                      semantic_length, do_sample):
            return self.sft.apply(
                params, TASK_MAP[task], enroll_feats, mix_feats, rng,
                method="generate", global_length=config.global_tokens,
                semantic_length=semantic_length, do_sample=do_sample,
            )

        self._generate = _generate

    # --- feature frontends (model.py:37-79) ---

    def extract_semantic_features(self, wav: jnp.ndarray) -> jnp.ndarray:
        return self._wavlm_feats(wav)

    def wavlm_feats_pure(self, variables, wav: jnp.ndarray) -> jnp.ndarray:
        """WavLM feature path with variables as explicit arguments (safe to
        trace inside an outer jit — no weight constants in the HLO)."""
        padded = jnp.pad(wav, [(0, 0), (160, 160)])
        return ssl_mod.wavlm_features(self.wavlm.apply(variables, padded))

    def frozen_variables(self):
        """The frozen pytrees the loss needs, for passing through jit
        boundaries as arguments (never as closures — CLAUDE.md #3)."""
        return {
            "wavlm": self.wavlm_variables,
            "bicodec": self.tokenizer.variables,
            "ssl": self.tokenizer.ssl_variables,
        }

    def stft_logmel(self, wav: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        return dsp.stft_logmel(
            wav, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.n_mels,
            cfg.sample_rate,
        )

    # --- training (model.py:96-124) ---

    def loss_fn(self, params, task: str, enroll, mix, target_wav,
                frozen=None, sft_forward=None):
        """Single-task loss; tokenization and feature extraction are frozen.
        For 'rtse' the caller passes the interferer as target (model.py:99-102).

        ``frozen`` (from :meth:`frozen_variables`) must be passed when this
        is traced inside an outer jit (the SPMD train step): the frozen
        weights then enter as program ARGUMENTS. The closure-based path is
        kept for eager/inference use.

        ``sft_forward`` overrides the LM forward
        ``(params, task_id, enroll_feats, mix_feats, g, s) -> (loss, acc)``
        — the hook the pipeline-parallel trainer uses
        (parallel/pipeline.py sft_pipeline_loss).
        """
        if frozen is not None:
            global_tokens, semantic_tokens = self.tokenizer.tokenize_with_vars(
                frozen["bicodec"], frozen["ssl"], target_wav)
            feats = lambda w: self.wavlm_feats_pure(frozen["wavlm"], w)
        else:
            global_tokens, semantic_tokens = self.tokenizer.tokenize(
                target_wav)
            feats = self.extract_semantic_features
        mix_feats = feats(mix)
        enroll_feats = feats(enroll) if enroll is not None else None
        fwd = sft_forward or (lambda p, t, e, m, g, sm:
                              self.sft.apply(p, t, e, m, g, sm))
        return fwd(params, TASK_MAP[task], enroll_feats, mix_feats,
                   global_tokens[:, 0, :], semantic_tokens)

    # --- inference flows (model.py:170-291) ---

    def _segment(self, wav: np.ndarray) -> Tuple[jnp.ndarray, int]:
        """Wrap-pad (B=1, T) to 5-s multiples and reshape to (N, seg_len)."""
        seg = self.config.segment_len
        t = wav.shape[-1]
        pad = -(-t // seg) * seg - t
        seg_src = np.pad(np.asarray(wav), [(0, 0), (0, pad)], mode="wrap")
        return jnp.asarray(seg_src.reshape(-1, seg)), t

    def _decode_tokens(self, global_ids, semantic_ids, orig_len):
        est = self.tokenizer.detokenize(global_ids[:, None, :], semantic_ids)
        return np.asarray(est).reshape(-1)[:orig_len]

    def _semantic_len(self) -> int:
        cfg = self.config
        return -(-cfg.segment_len // cfg.hop_length)  # mel frame count = 250

    def enhance_se(self, wav: np.ndarray, rng=None, do_sample: bool = False):
        """SE flow (model.py:174-198): segment, peak-normalize, generate,
        detokenize, flatten."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        seg_src, t = self._segment(wav)
        peak = jnp.max(jnp.abs(jnp.asarray(wav)), axis=-1, keepdims=True)
        seg_src = seg_src / peak
        mix_feats = self.extract_semantic_features(seg_src)
        g, s = self._generate(self.sft_params, "se", None, mix_feats, rng,
                              self._semantic_len(), do_sample)
        return self._decode_tokens(g, s, t)

    def enhance_tse(self, wav: np.ndarray, enroll: np.ndarray, rng=None,
                    do_sample: bool = False, task: str = "tse"):
        """TSE flow (model.py:199-228): enrollment features broadcast over
        segments."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        seg_src, t = self._segment(wav)
        n = seg_src.shape[0]
        enroll_feats = self.extract_semantic_features(jnp.asarray(enroll))
        enroll_feats = jnp.broadcast_to(
            enroll_feats, (n, *enroll_feats.shape[1:])
        )
        mix_feats = self.extract_semantic_features(seg_src)
        g, s = self._generate(self.sft_params, task, enroll_feats, mix_feats,
                              rng, self._semantic_len(), do_sample)
        return self._decode_tokens(g, s, t)

    def separate_ss(self, wav: np.ndarray, rng=None, do_sample: bool = False):
        """SS cascade (model.py:229-290): SE on the first segment builds an
        enrollment, then TSE extracts s1 and rTSE extracts s2."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        seg = self.config.segment_len
        first = np.asarray(wav)[:, :seg]
        if first.shape[-1] < seg:
            first = np.pad(first, [(0, 0), (0, seg - first.shape[-1])],
                           mode="wrap")
        enroll = self.enhance_se(first, k1, do_sample)[None, :seg]
        enroll = enroll / (np.max(np.abs(enroll)) + 1e-5) * 0.99
        s1 = self.enhance_tse(wav, enroll, k2, do_sample, task="tse")
        s2 = self.enhance_tse(wav, enroll, k3, do_sample, task="rtse")
        return s1, s2
