"""UniSE SFT training: one jitted SPMD step (tokenize + features + LM loss +
AdamW) over a (dp, tp) mesh.

Replaces the reference's Lightning DDP loop (train.py, model.py:96-124,
configure_optimizers model.py:327-353): the batch is dp-sharded, LM params are
tp-sharded by the rules in parallel/mesh.py, and XLA inserts the gradient
psum — no explicit collectives in user code.
"""
from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp

from ..models.unise.model import TASK_MAP, UniSE
from ..parallel import mesh as mesh_lib
from .optim import make_optimizer


class SFTTrainer:
    def __init__(self, unise: UniSE, mesh=None, optimizer=None,
                 pp_mesh=None, pp_microbatches: int = 2):
        """``pp_mesh``: a mesh with a "pp" axis — the LM backbone then runs
        through the differentiable GPipe schedule
        (parallel/pipeline.py sft_pipeline_loss; grads == dense is pinned
        through the TRAINER in tests/test_parallel.py). Mutually exclusive
        with ``mesh`` (dp/tp GSPMD)."""
        self.unise = unise
        self.mesh = mesh
        self.pp_mesh = pp_mesh
        if mesh is not None and pp_mesh is not None:
            raise ValueError("pass either mesh (dp/tp) or pp_mesh, not both")
        sft_forward = None
        if pp_mesh is not None:
            from ..parallel.pipeline import sft_pipeline_loss

            sft_forward = lambda p, t, e, m, g, sm: sft_pipeline_loss(
                self.unise.sft, p, t, e, m, g, sm, pp_mesh,
                pp_microbatches)
        self._sft_forward = sft_forward
        self.optimizer = optimizer or make_optimizer()
        self.opt_state = self.optimizer.init(unise.sft_params)
        self.params = unise.sft_params
        # frozen tokenizer/SSL weights ride the step as ARGUMENTS: closures
        # would serialize them into the HLO as constants — hundreds of MB
        # that remote compilers reject or take tens of minutes on
        # (CLAUDE.md #3; bit us at full size, tiny test models hid it)
        self.frozen = unise.frozen_variables()
        self.step = 0

        if mesh is not None:
            shardings = mesh_lib.param_shardings(self.params, mesh)
            self.params = jax.device_put(self.params, shardings)
            opt_shardings = jax.tree_util.tree_map(
                lambda x: mesh_lib.replicated(mesh), self.opt_state
            )
            # moment buffers follow the param shardings where shapes match
            self.opt_state = jax.device_put(self.opt_state, opt_shardings)
            self.frozen = jax.device_put(
                self.frozen,
                jax.tree_util.tree_map(
                    lambda x: mesh_lib.replicated(mesh), self.frozen),
            )

        @partial(jax.jit, static_argnames=("task",), donate_argnums=(0, 1))
        def _train_step(params, opt_state, frozen, task, enroll, mix, target):
            def loss_fn(p):
                loss, acc = self.unise.loss_fn(
                    p, task, enroll, mix, target, frozen=frozen,
                    sft_forward=self._sft_forward)
                return loss, acc

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = self.optimizer.update(grads, opt_state, params)
            new_params = jax.tree_util.tree_map(
                lambda p, u: p + u, params, updates
            )
            return new_params, new_opt, loss, acc

        self._train_step = _train_step

    def train_step(self, task: str, enroll, mix, target):
        """task in {se, tse, rtse}; enroll None for se. Arrays (B, T)."""
        if self.mesh is not None:
            put = lambda x: (
                jax.device_put(x, mesh_lib.batch_sharding(self.mesh))
                if x is not None else None
            )
            enroll, mix, target = put(enroll), put(mix), put(target)
        self.params, self.opt_state, loss, acc = self._train_step(
            self.params, self.opt_state, self.frozen, task, enroll, mix,
            target
        )
        self.unise.sft_params = self.params
        self.step += 1
        # one fetch for both scalars (each float() is its own ~25 ms round
        # trip on tunnel-attached chips)
        loss, acc = jax.device_get((loss, acc))
        return float(loss), float(acc)


class Validator:
    """Validation pass (model.py:134-160 equivalent): averaged loss/acc over a
    val iterator, no parameter updates."""

    def __init__(self, unise: UniSE):
        self.unise = unise
        self.frozen = unise.frozen_variables()

        @partial(jax.jit, static_argnames=("task",))
        def _eval(params, frozen, task, enroll, mix, target):
            return self.unise.loss_fn(params, task, enroll, mix, target,
                                      frozen=frozen)

        self._eval = _eval

    def run(self, params, batches):
        losses, accs, n = 0.0, 0.0, 0
        for batch in batches:
            mode, enroll, mix, speech, interf, fs, lens, names = batch
            target = interf if mode == "rtse" else speech
            loss, acc = self._eval(params, self.frozen, mode, enroll, mix,
                                   target)
            losses += float(loss)
            accs += float(acc)
            n += 1
        return {"valid_loss": losses / max(n, 1),
                "valid_acc": accs / max(n, 1), "num_batches": n}
