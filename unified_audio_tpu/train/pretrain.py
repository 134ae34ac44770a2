"""CodecLM pretraining loop: next-token modeling over (global, semantic)
BiCodec token sequences with optional mel conditioning — the objective behind
CustomLlamaModel.forward (llm.py:107-147), for which the reference ships the
model but no training driver.

The semantic-EOS target is dropped (pretraining clips may be mid-utterance
truncations, llm.py:124-127); batches come from any iterator yielding
(global_ids (B, 32), semantic_ids (B, T), cond or None).
"""
from __future__ import annotations

from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.lm.llama import CodecLM, LlamaConfig
from ..parallel import mesh as mesh_lib
from .optim import make_optimizer


class PretrainTrainer:
    def __init__(self, cfg: LlamaConfig, rng, optimizer=None, mesh=None,
                 example=None):
        self.cfg = cfg
        self.model = CodecLM(cfg)
        self.optimizer = optimizer or make_optimizer()
        self.mesh = mesh

        g, s = example if example is not None else (
            jnp.zeros((1, 32), jnp.int32), jnp.zeros((1, 50), jnp.int32)
        )
        self.params = self.model.init(rng, g, s)
        if mesh is not None:
            shardings = mesh_lib.param_shardings(self.params, mesh)
            self.params = jax.device_put(self.params, shardings)
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

        @partial(jax.jit, donate_argnums=(0, 1))
        def _step(params, opt_state, g, s, cond):
            def loss_fn(p):
                return self.model.apply(p, g, s, cond_embeds=cond)

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss, acc

        self._step = _step

    def train_step(self, global_ids, semantic_ids, cond=None):
        if self.mesh is not None:
            sh = mesh_lib.batch_sharding(self.mesh)
            global_ids = jax.device_put(global_ids, sh)
            semantic_ids = jax.device_put(semantic_ids, sh)
            if cond is not None:
                cond = jax.device_put(cond, sh)
        self.params, self.opt_state, loss, acc = self._step(
            self.params, self.opt_state, global_ids, semantic_ids, cond
        )
        self.step += 1
        return float(loss), float(acc)

    def fit(self, data: Iterator, max_steps: Optional[int] = None,
            log_every: int = 50):
        import json

        for batch in data:
            g, s, cond = (batch if len(batch) == 3 else (*batch, None))
            loss, acc = self.train_step(g, s, cond)
            if self.step % log_every == 0:
                print(json.dumps({"step": self.step, "loss": loss, "acc": acc}))
            if max_steps and self.step >= max_steps:
                break
