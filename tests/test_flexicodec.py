"""FlexiCodec (DAC + FSQ dual stream) tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.hcodec.flexicodec import (
    DACEncoder, FlexiCodec, FlexiCodecConfig,
)


def tiny_cfg():
    return FlexiCodecConfig(
        d_model=4, latent_dim=32, codebook_size=32, num_quantizers=2,
        n_mels=24, semantic_dim=32, fsq_levels=(4, 4, 4),
    )


class TestDACEncoder:
    def test_downsample_rate(self, key, rng):
        m = DACEncoder(d_model=4, rates=(2, 4, 5, 8), latent_dim=16)
        x = jnp.asarray(rng.standard_normal((1, 3200, 1)).astype(np.float32))
        z = m.apply(m.init(key, x), x)
        assert z.shape == (1, 10, 16)  # 3200 / 320


class TestFlexiCodec:
    def test_roundtrip(self, rng):
        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 320 * 20)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        variables = m.init(rngs, wav, train=False)

        out = m.apply(variables, wav, train=False)
        assert out["recons"].shape[0] == 1
        ac, sem = m.apply(variables, wav, method="encode")
        assert ac.shape[-1] == cfg.num_quantizers
        assert int(sem.max()) < 4 ** 3
        rec = m.apply(variables, ac, sem, method="decode")
        np.testing.assert_allclose(
            np.asarray(out["recons"]), np.asarray(rec), atol=1e-4
        )

    def test_fbank_rate(self, rng):
        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        variables = m.init(rngs, wav, train=False)
        fb = m.apply(variables, wav, method="fbank")
        assert fb.shape[-1] == cfg.n_mels
        assert abs(fb.shape[1] - 50) <= 1  # ~50 Hz


class TestDistillation:
    """Frozen-teacher supervision of the semantic branch
    (modeling_flexicodec.py:786-789: lambda * MSE(teacher.detach(), head(sq)))."""

    def _setup(self, rng):
        cfg = FlexiCodecConfig(
            d_model=4, latent_dim=32, codebook_size=32, num_quantizers=2,
            n_mels=24, semantic_dim=32, fsq_levels=(4, 4, 4),
            teacher_dim=16, lambda_distill=15.0, distill_head_layers=1,
        )
        m = FlexiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        teacher = jnp.asarray(
            rng.standard_normal((1, 10, 16)).astype(np.float32))
        variables = m.init(rngs, wav, teacher_feats=teacher, train=False)
        return cfg, m, variables, wav, teacher

    def test_distill_loss_present_and_finite(self, rng):
        cfg, m, variables, wav, teacher = self._setup(rng)
        out = m.apply(variables, wav, teacher_feats=teacher, train=False,
                      rngs={"quant": jax.random.PRNGKey(2)})
        assert "distill_loss" in out
        assert np.isfinite(float(out["distill_loss"]))
        # without a teacher the key is absent (inference path unchanged)
        out2 = m.apply(variables, wav, train=False,
                       rngs={"quant": jax.random.PRNGKey(2)})
        assert "distill_loss" not in out2

    def test_gradients_reach_semantic_branch_only_via_head(self, rng):
        cfg, m, variables, wav, teacher = self._setup(rng)

        def loss_fn(params):
            out = m.apply({**variables, "params": params}, wav,
                          teacher_feats=teacher, train=False,
                          rngs={"quant": jax.random.PRNGKey(2)})
            return out["distill_loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        g_head = np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(grads["distill_proj"])])
        g_sem = np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(grads["semantic_quantizer"])])
        g_dec = np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(grads["decoder"])])
        assert np.abs(g_head).max() > 0        # head learns
        assert np.abs(g_sem).max() > 0         # supervision reaches branch
        assert np.abs(g_dec).max() == 0        # decoder untouched by distill

    def test_train_step_with_distill(self, rng):
        """One optax step over recon + commit + distill decreases nothing
        catastrophically and keeps params finite (training-step smoke)."""
        import optax

        cfg, m, variables, wav, teacher = self._setup(rng)
        opt = optax.adam(1e-3)
        params = variables["params"]
        opt_state = opt.init(params)

        def loss_fn(p):
            out = m.apply({"params": p, "codebook": variables["codebook"]},
                          wav, teacher_feats=teacher, train=False,
                          rngs={"quant": jax.random.PRNGKey(2)})
            recon = out["recons"][..., : wav.shape[-1]]
            l = (jnp.mean(jnp.square(recon - wav[..., : recon.shape[-1]]))
                 + out["commit_loss"] + out["distill_loss"])
            return l

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        assert np.isfinite(float(loss))
        for leaf in jax.tree_util.tree_leaves(new_params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_teacher_features_helper(self, rng):
        from unified_audio_tpu.models.hcodec.flexicodec import teacher_features
        from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod

        tiny = ssl_mod.SSLConfig(
            hidden_size=16, num_layers=2, num_heads=4, intermediate_size=16,
            conv_dim=(8,) * 7, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )
        ssl = ssl_mod.Wav2Vec2Model(tiny)
        wav = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
        vars_ = ssl.init(jax.random.PRNGKey(0), wav)
        feats = teacher_features(ssl, vars_, wav)
        assert feats.ndim == 3 and feats.shape[-1] == 16
        assert np.isfinite(np.asarray(feats)).all()
