"""Codec GAN trainer: the training loop the reference configures but does not
ship (HCodec-1.0 conf/config.yaml:49-109).

Loss recipe: multi-scale mel L1 + commit (VQ) + semantic-feature
reconstruction + adversarial (LSGAN) + feature matching, with the adversarial
terms gated on ``perceptual_start_step`` (400k in the reference config).
Generator and discriminator each get AdamW @ 2e-4. One jitted SPMD step over a
dp mesh; VQ EMA stats psum over "dp" via the codec's vq_axis_name.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial


import jax
import jax.numpy as jnp
import optax

from ..models.hcodec.codec import HCodec, HCodecConfig
from ..parallel import mesh as mesh_lib
from .discriminators import (
    CodecDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    multiscale_mel_loss,
)


@dataclass
class CodecTrainConfig:
    lr: float = 2e-4
    perceptual_start_step: int = 400_000
    mel_weight: float = 15.0
    commit_weight: float = 1.0
    semantic_weight: float = 1.0
    adv_weight: float = 1.0
    fm_weight: float = 2.0
    grad_clip: float = 5.0
    max_steps: int = 1_000_000


class CodecGANTrainer:
    def __init__(
        self,
        codec_config: HCodecConfig,
        train_config: CodecTrainConfig = CodecTrainConfig(),
        mesh=None,
        rng=None,
        example_batch=None,
    ):
        self.cfg = train_config
        self.codec_config = codec_config
        # dp-SPMD: params replicated, batch sharded over dp; XLA inserts the
        # gradient psum. VQ EMA stats need no explicit axis under GSPMD —
        # the stats reductions inside the jitted step are already global
        # over the sharded batch (the torch all_reduce equivalent).
        self.codec = HCodec(codec_config, vq_axis_name=None)
        self.disc = CodecDiscriminator()
        self.mesh = mesh

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        wav, feat = example_batch
        # jitted CPU init + one bulk transfer: eager flax init over a
        # tunnel-attached device is one round trip PER op (utils.initialization)
        from ..utils.initialization import init_on_cpu

        wav0 = jnp.zeros(jnp.shape(wav), jnp.float32)
        feat0 = jnp.zeros(jnp.shape(feat), jnp.float32)
        self.gen_vars = init_on_cpu(lambda: self.codec.init(
            {"params": k1, "quant": k2}, wav0[..., None], feat0, train=False
        ))
        self.disc_params = init_on_cpu(
            lambda: self.disc.init(k3, wav0[..., None]))

        if mesh is not None:
            rep = lambda tree: jax.device_put(
                tree, jax.tree_util.tree_map(
                    lambda _: mesh_lib.replicated(mesh), tree
                )
            )
            self.gen_vars = rep(self.gen_vars)
            self.disc_params = rep(self.disc_params)

        self.gen_opt = optax.chain(
            optax.clip_by_global_norm(train_config.grad_clip),
            optax.adamw(train_config.lr),
        )
        self.disc_opt = optax.chain(
            optax.clip_by_global_norm(train_config.grad_clip),
            optax.adamw(train_config.lr),
        )
        # one jitted program on the default device (eager optax init is
        # per-leaf dispatches); params stay put, no host round trips
        self.gen_opt_state = jax.jit(self.gen_opt.init)(
            self.gen_vars["params"])
        self.disc_opt_state = jax.jit(self.disc_opt.init)(self.disc_params)
        self.step = 0

        cfg = self.cfg
        sr = codec_config.sample_rate

        @partial(jax.jit, static_argnames=("use_adv",), donate_argnums=(0, 1))
        def _gen_step(gen_vars, gen_opt_state, disc_params, wav, feat, rng,
                      use_adv):
            params = gen_vars["params"]
            codebook = gen_vars["codebook"]

            def loss_fn(p):
                (recon, pred_feat, commit), mutated = self.codec.apply(
                    {"params": p, "codebook": codebook},
                    wav[..., None], feat, train=True,
                    mutable=["codebook"], rngs={"quant": rng},
                )
                target = wav[:, : recon.shape[-1]]
                mel = multiscale_mel_loss(target, recon, sr)
                semantic = jnp.mean(jnp.abs(pred_feat - feat))
                loss = (
                    cfg.mel_weight * mel
                    + cfg.commit_weight * commit
                    + cfg.semantic_weight * semantic
                )
                adv = jnp.zeros(())
                fm = jnp.zeros(())
                if use_adv:
                    fake_scores, fake_feats = self.disc.apply(
                        disc_params, recon[..., None]
                    )
                    real_scores, real_feats = self.disc.apply(
                        disc_params, target[..., None]
                    )
                    adv = generator_adversarial_loss(fake_scores)
                    fm = feature_matching_loss(real_feats, fake_feats)
                    loss = loss + cfg.adv_weight * adv + cfg.fm_weight * fm
                metrics = {"mel": mel, "commit": commit, "semantic": semantic,
                           "adv": adv, "fm": fm, "recon": recon}
                return loss, (metrics, mutated["codebook"])

            (loss, (metrics, new_codebook)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = self.gen_opt.update(grads, gen_opt_state, params)
            new_params = optax.apply_updates(params, updates)
            recon = metrics.pop("recon")
            return (
                {"params": new_params, "codebook": new_codebook},
                new_opt, loss, metrics, recon,
            )

        @partial(jax.jit, donate_argnums=(0, 1))
        def _disc_step(disc_params, disc_opt_state, wav, recon):
            target = wav[:, : recon.shape[-1]]

            def loss_fn(dp):
                real_scores, _ = self.disc.apply(dp, target[..., None])
                fake_scores, _ = self.disc.apply(
                    dp, jax.lax.stop_gradient(recon)[..., None]
                )
                return discriminator_loss(real_scores, fake_scores)

            loss, grads = jax.value_and_grad(loss_fn)(disc_params)
            updates, new_opt = self.disc_opt.update(
                grads, disc_opt_state, disc_params
            )
            return optax.apply_updates(disc_params, updates), new_opt, loss

        self._gen_step = _gen_step
        self._disc_step = _disc_step

    def train_step(self, wav: jnp.ndarray, feat: jnp.ndarray, rng):
        """wav (B, T), feat (B, T', D) -> metrics dict."""
        if self.mesh is not None:
            sharding = mesh_lib.batch_sharding(self.mesh)
            wav = jax.device_put(wav, sharding)
            feat = jax.device_put(feat, sharding)
        use_adv = self.step >= self.cfg.perceptual_start_step
        self.gen_vars, self.gen_opt_state, g_loss, metrics, recon = (
            self._gen_step(self.gen_vars, self.gen_opt_state,
                           self.disc_params, wav, feat, rng, use_adv)
        )
        d_loss = jnp.zeros(())
        if use_adv:
            self.disc_params, self.disc_opt_state, d_loss = self._disc_step(
                self.disc_params, self.disc_opt_state, wav, recon
            )
        self.step += 1
        # ONE device_get for every scalar: per-metric float() costs a
        # full fetch round trip each on tunnel-attached chips (~25 ms RTT,
        # CLAUDE.md) — 6+ metrics made the host loop dominate the step
        fetched = jax.device_get(
            {**metrics, "gen_loss": g_loss, "disc_loss": d_loss})
        return {k: float(v) for k, v in fetched.items()}
