"""UniSE task-conditioned LM head (LLM_SFT, model/llm/llm_sft.py:13-195).

Prompt layout: [task][enroll_sos][enroll feats][mix_sos][mix feats][codec ids].
Generation is two lax.scan phases over a static KV cache:

* phase 1 — ``global_length + 1`` steps restricted to the global-token vocab
  range; the final sample is discarded but its KV stays in cache, exactly
  reproducing the reference quirk at llm_sft.py:139-164.
* phase 2 — ``semantic_length`` steps restricted to the semantic range.

The whole decode (prefill + 33 + T steps) is one compiled XLA program; batch
dimension carries the 5-second segments the reference reshapes into a batch
(model/model.py:176-180), which maps 1:1 onto TPU batching.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .llama import CodecLM, LlamaConfig, init_cache, range_mask, sample_logits


class LLMSFT(nn.Module):
    cfg: LlamaConfig
    num_tasks: int = 3
    feats_dim: int = 768

    def setup(self):
        self.lm = CodecLM(self.cfg, name="lm")
        self.task_embedding = nn.Embed(
            self.num_tasks, self.cfg.hidden_size, name="task_embedding"
        )
        self.enroll_sos_embedding = self.param(
            "enroll_sos_embedding", nn.initializers.normal(1.0),
            (1, self.cfg.hidden_size),
        )
        self.mix_sos_embedding = self.param(
            "mix_sos_embedding", nn.initializers.normal(1.0),
            (1, self.cfg.hidden_size),
        )
        self.adapter = nn.Dense(self.cfg.hidden_size, name="adapter")

    def _prompt(self, task_id, enroll_feats, mix_feats):
        b = mix_feats.shape[0]
        # task_id: scalar (one task for the whole batch) or (B,) array
        # (mixed-task batched admission in the serving engine)
        task_ids = jnp.asarray(task_id, jnp.int32)
        if task_ids.ndim == 0:
            task_ids = jnp.full((b,), task_ids, jnp.int32)
        task = self.task_embedding(task_ids.reshape(b, 1))
        mix = self.adapter(mix_feats)
        mix_sos = jnp.broadcast_to(
            self.mix_sos_embedding[None], (b, 1, self.cfg.hidden_size)
        )
        parts = [task]
        if enroll_feats is not None:
            enroll = self.adapter(enroll_feats)
            enroll_sos = jnp.broadcast_to(
                self.enroll_sos_embedding[None], (b, 1, self.cfg.hidden_size)
            )
            parts += [enroll_sos, enroll]
        parts += [mix_sos, mix]
        return jnp.concatenate(parts, axis=1)

    def __call__(self, task_id, enroll_feats, mix_feats, global_ids, semantic_ids):
        """SFT loss (llm_sft.py:37-89). Unlike pretraining, the semantic EOS
        target is kept (the mixture is given, so termination is learnable)."""
        cfg = self.cfg
        b = global_ids.shape[0]
        g = global_ids.astype(jnp.int32) + cfg.global_offset
        s = semantic_ids.astype(jnp.int32) + cfg.semantic_offset
        gsos = jnp.full((b, 1), cfg.global_sos, jnp.int32)
        ssos = jnp.full((b, 1), cfg.semantic_sos, jnp.int32)
        seos = jnp.full((b, 1), cfg.semantic_eos, jnp.int32)
        input_ids = jnp.concatenate([gsos, g, ssos, s], axis=1)
        target_ids = jnp.concatenate([g, ssos, s, seos], axis=1)

        prompt = self._prompt(task_id, enroll_feats, mix_feats)
        embeds = jnp.concatenate(
            [prompt, self.lm.embed_codes(input_ids)], axis=1
        )
        return self.lm.forward_embeds(embeds, target_ids)

    def generate(
        self,
        task_id,
        enroll_feats,
        mix_feats,
        rng,
        global_length: int = 32,
        semantic_length: Optional[int] = None,
        temperature: float = 0.8,
        top_k: int = 50,
        top_p: float = 0.95,
        do_sample: bool = True,
    ):
        """Two-phase AR decode -> (global_ids (B, 32), semantic_ids (B, T))."""
        cfg = self.cfg
        if semantic_length is None:
            semantic_length = mix_feats.shape[1]
        prompt = self._prompt(task_id, enroll_feats, mix_feats)
        b, prompt_len, _ = prompt.shape
        max_len = prompt_len + (global_length + 1) + semantic_length + 1

        cache = init_cache(cfg, b, max_len, dtype=prompt.dtype)
        _, cache = self.lm.prefill(prompt, cache)

        gmask = range_mask(cfg, cfg.global_offset, cfg.global_size)
        smask = range_mask(cfg, cfg.semantic_offset, cfg.semantic_size)

        def make_step(mask):
            def step(carry, key):
                ids, cache = carry
                logits, cache = self.lm.decode_ids(ids, cache)
                nxt = sample_logits(
                    key, logits + mask[None],
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    do_sample=do_sample,
                )
                return (nxt, cache), nxt

            return step

        k1, k2 = jax.random.split(rng)
        # phase 1: 33 steps, last sample discarded but cached (llm_sft.py:139-164)
        init_ids = jnp.full((b,), cfg.global_sos, jnp.int32)
        (_, cache), g_tokens = jax.lax.scan(
            make_step(gmask), (init_ids, cache),
            jax.random.split(k1, global_length + 1),
        )
        global_ids = jnp.swapaxes(g_tokens[:global_length], 0, 1) - cfg.global_offset

        # phase 2: semantic decode from semantic_sos
        init_ids = jnp.full((b,), cfg.semantic_sos, jnp.int32)
        (_, cache), s_tokens = jax.lax.scan(
            make_step(smask), (init_ids, cache),
            jax.random.split(k2, semantic_length),
        )
        semantic_ids = jnp.swapaxes(s_tokens, 0, 1) - cfg.semantic_offset
        return global_ids, semantic_ids
