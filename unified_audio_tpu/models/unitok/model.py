"""UniTok-audio: multitask AR audio generation over interleaved
acoustic+semantic H-Codec tokens with a delay pattern.

The reference ships only the architecture spec (UniTok-audio/index.html:305 +
Figure/UniTok_audio_05.png, task table in README.md): decoder-only LM; prompt
``[T task][C][caption emb][R][reference audio emb][I][input audio emb][S]
[delayed codec tokens][E]``; frozen H-Codec encoder/decoder; frozen text /
audio encoders feeding linear adapters; tasks SR / TSE / SS / VC / LASS /
CODEC / AE. This module realizes that spec TPU-natively:

* K = 2*nq codebooks (acoustic nq ‖ semantic nq) embedded by summation and
  predicted by K parallel heads — one decode step per 25 Hz frame, all tasks
  share one batched token pipeline (mixed-task batches differ only in the task
  embedding row, so they saturate the MXU together).
* Delay pattern across the RVQ layers (delay.py).
* Generation is a single lax.scan over a static KV cache (reusing the
  LlamaBackbone from models/lm).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..lm.llama import LlamaBackbone, LlamaConfig, init_cache, sample_logits

UNITOK_TASKS: Dict[str, int] = {
    "sr": 0, "tse": 1, "ss": 2, "vc": 3, "lass": 4, "codec": 5, "ae": 6,
}


@dataclass(frozen=True)
class UniTokConfig:
    codebook_size: int = 1024
    num_quantizers: int = 4  # per stream
    num_streams: int = 2  # acoustic + semantic
    hidden_size: int = 512
    num_layers: int = 12
    num_heads: int = 8
    text_dim: int = 768
    audio_dim: int = 768
    num_tasks: int = len(UNITOK_TASKS)
    max_positions: int = 4096

    @property
    def num_codebooks(self) -> int:
        return self.num_streams * self.num_quantizers

    # per-codebook vocab: codes + BOS + PAD(delay hole) + EOS
    @property
    def bos(self) -> int:
        return self.codebook_size

    @property
    def pad(self) -> int:
        return self.codebook_size + 1

    @property
    def eos(self) -> int:
        return self.codebook_size + 2

    @property
    def layer_vocab(self) -> int:
        return self.codebook_size + 3

    @property
    def llama_config(self) -> "LlamaConfig":
        """Backbone geometry. Single source of truth shared by
        UniTokLM.setup and the paged serving engine — a drifted copy on
        either side would make paged decode RoPE mismatch prefill."""
        return LlamaConfig(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            num_heads=self.num_heads,
            max_position_embeddings=self.max_positions,
        )


class UniTokLM(nn.Module):
    cfg: UniTokConfig = UniTokConfig()

    def setup(self):
        cfg = self.cfg
        lcfg = cfg.llama_config
        self.backbone = LlamaBackbone(lcfg, name="backbone")
        self.lcfg = lcfg
        self.task_embedding = nn.Embed(cfg.num_tasks, cfg.hidden_size,
                                       name="task_embedding")
        # separator tokens [C], [R], [I], [S] (index 0..3)
        self.sep_embedding = nn.Embed(4, cfg.hidden_size, name="sep_embedding")
        self.text_adapter = nn.Dense(cfg.hidden_size, name="text_adapter")
        self.audio_adapter = nn.Dense(cfg.hidden_size, name="audio_adapter")
        self.code_embeddings = [
            nn.Embed(cfg.layer_vocab, cfg.hidden_size, name=f"code_embed_{k}")
            for k in range(cfg.num_codebooks)
        ]
        self.heads = [
            nn.Dense(cfg.layer_vocab, use_bias=False, name=f"head_{k}")
            for k in range(cfg.num_codebooks)
        ]

    def embed_codes(self, codes):
        """codes (B, T, K) -> summed embeddings (B, T, D)."""
        out = 0.0
        for k in range(self.cfg.num_codebooks):
            out = out + self.code_embeddings[k](codes[..., k])
        return out

    def _sep(self, b, idx):
        return self.sep_embedding(jnp.full((b, 1), idx, jnp.int32))

    def build_prompt(self, task_id, caption_feats, ref_audio_feats,
                     input_audio_feats, batch: int):
        """[T][C][caption][R][ref audio][I][input audio][S]; absent conditions
        are skipped (e.g. CODEC/AE have no caption)."""
        parts = [self.task_embedding(jnp.full((batch, 1), task_id, jnp.int32))]
        if caption_feats is not None:
            parts += [self._sep(batch, 0), self.text_adapter(caption_feats)]
        if ref_audio_feats is not None:
            parts += [self._sep(batch, 1), self.audio_adapter(ref_audio_feats)]
        if input_audio_feats is not None:
            parts += [self._sep(batch, 2), self.audio_adapter(input_audio_feats)]
        parts += [self._sep(batch, 3)]
        return jnp.concatenate(parts, axis=1)

    def __call__(self, task_id, caption_feats, ref_audio_feats,
                 input_audio_feats, codes):
        """Teacher-forced training loss over the delayed code sequence.

        codes: (B, T, K) raw codec tokens (acoustic ‖ semantic layers).
        """
        from .delay import apply_delay

        cfg = self.cfg
        b, t, k = codes.shape
        delayed = apply_delay(codes, cfg.pad)  # (B, T+K-1, K)
        bos = jnp.full((b, 1, k), cfg.bos, delayed.dtype)
        eos = jnp.full((b, 1, k), cfg.eos, delayed.dtype)
        inputs = jnp.concatenate([bos, delayed], axis=1)[:, :-1]
        targets = jnp.concatenate([delayed, eos], axis=1)[:, :-1]

        prompt = self.build_prompt(task_id, caption_feats, ref_audio_feats,
                                   input_audio_feats, b)
        embeds = jnp.concatenate([prompt, self.embed_codes(inputs)], axis=1)
        hidden = self.backbone(embeds)[:, -targets.shape[1]:]

        loss = 0.0
        acc = 0.0
        for kk in range(cfg.num_codebooks):
            logits = self.heads[kk](hidden)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = targets[..., kk]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            mask = (tgt != cfg.pad).astype(jnp.float32)
            loss += jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            acc += jnp.sum(
                (jnp.argmax(logits, -1) == tgt).astype(jnp.float32) * mask
            ) / jnp.maximum(jnp.sum(mask), 1.0)
        return loss / cfg.num_codebooks, acc / cfg.num_codebooks

    def generate(self, task_id, caption_feats, ref_audio_feats,
                 input_audio_feats, num_frames: int, rng,
                 temperature: float = 0.8, top_k: int = 50,
                 top_p: float = 0.95, do_sample: bool = True,
                 batch: int = 1):
        """AR decode of num_frames codec frames -> codes (B, T, K).

        One scan step per delayed position; the delay pattern is undone at the
        end. Code-range masking keeps samples inside the real codebook.
        """
        from .delay import undo_delay

        cfg = self.cfg
        k = cfg.num_codebooks
        steps = num_frames + k - 1
        prompt = self.build_prompt(task_id, caption_feats, ref_audio_feats,
                                   input_audio_feats, batch)
        b, prompt_len, _ = prompt.shape
        cache = init_cache(self.lcfg, b, prompt_len + steps + 1,
                           dtype=prompt.dtype)
        _, cache = self.backbone.prefill(prompt, cache)

        # per-layer additive masks: before layer k's stream starts (step < k)
        # or after it ends (step >= k + T), the token must be PAD.
        vocab_ids = jnp.arange(cfg.layer_vocab)
        code_mask = jnp.where(vocab_ids < cfg.codebook_size, 0.0, -1e9)
        pad_only = jnp.where(vocab_ids == cfg.pad, 0.0, -1e9)

        def step_fn(carry, inp):
            ids, cache = carry  # ids (B, K) previous tokens
            step_idx, key = inp
            embeds = 0.0
            for kk in range(k):
                embeds = embeds + self.code_embeddings[kk](ids[:, kk : kk + 1])
            hidden, cache = self.backbone.decode_step(embeds, cache)
            keys = jax.random.split(key, k)
            outs = []
            for kk in range(k):
                logits = self.heads[kk](hidden[:, -1])
                in_range = (step_idx >= kk) & (step_idx < kk + num_frames)
                mask = jnp.where(in_range, code_mask, pad_only)
                outs.append(sample_logits(
                    keys[kk], logits + mask[None], temperature=temperature,
                    top_k=top_k, top_p=top_p, do_sample=do_sample,
                ))
            nxt = jnp.stack(outs, axis=-1)  # (B, K)
            return (nxt, cache), nxt

        init_ids = jnp.full((b, k), cfg.bos, jnp.int32)
        keys = jax.random.split(rng, steps)
        (_, cache), tokens = jax.lax.scan(
            step_fn, (init_ids, cache), (jnp.arange(steps), keys)
        )
        delayed = jnp.swapaxes(tokens, 0, 1)  # (B, steps, K)
        codes = undo_delay(delayed)
        return jnp.clip(codes, 0, cfg.codebook_size - 1)
