"""HCodec-1.5 adaptive codec tests: segmentation, length injection,
degrouping, end-to-end round trip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.hcodec import adaptive
from unified_audio_tpu.models.hcodec.adaptive import (
    AdaptiveConfig, AdaptiveHCodec, extract_length, group_ids_from_lengths,
    group_lengths, inject_length, similarity_group_ids, degroup,
)
from tests.test_hcodec import small10


class TestSegmentation:
    def test_identical_frames_one_group(self):
        emb = jnp.ones((1, 6, 4))
        gid = similarity_group_ids(emb, threshold=0.9, max_group_len=8)
        np.testing.assert_array_equal(np.asarray(gid), [[0] * 6])

    def test_alternating_frames_all_boundaries(self):
        a, b = jnp.ones((4,)), -jnp.ones((4,))
        emb = jnp.stack([a, b, a, b], axis=0)[None]
        gid = similarity_group_ids(emb, threshold=0.5, max_group_len=8)
        np.testing.assert_array_equal(np.asarray(gid), [[0, 1, 2, 3]])

    def test_max_group_len(self):
        emb = jnp.ones((1, 10, 4))
        gid = similarity_group_ids(emb, threshold=0.5, max_group_len=4)
        np.testing.assert_array_equal(
            np.asarray(gid), [[0, 0, 0, 0, 1, 1, 1, 1, 2, 2]]
        )

    def test_lengths_roundtrip(self, rng):
        emb = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
        gid = similarity_group_ids(emb, threshold=0.3, max_group_len=4)
        lens = group_lengths(gid, 12)
        assert (np.asarray(lens).sum(-1) == 12).all()
        gid2 = group_ids_from_lengths(lens, 12)
        np.testing.assert_array_equal(np.asarray(gid), np.asarray(gid2))


class TestLengthInjection:
    def test_inject_extract(self, rng):
        codes = jnp.asarray(rng.integers(0, 1024, (2, 5, 4)))
        lengths = jnp.asarray([[1, 3, 8, 2, 0], [4, 4, 4, 0, 0]])
        injected = inject_length(codes, lengths, 1024)
        assert (np.asarray(injected[0, -1]) == -1).all()  # padding group
        plain, lens = extract_length(injected, 1024)
        np.testing.assert_array_equal(np.asarray(lens), np.asarray(lengths))
        valid = np.asarray(lengths) > 0
        np.testing.assert_array_equal(
            np.asarray(plain)[valid], np.asarray(codes)[valid]
        )


class TestDegroup:
    def test_gather(self):
        groups = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
        gid = jnp.asarray([[0, 0, 1, 2, 2, 2]])
        out = np.asarray(degroup(groups, gid))
        np.testing.assert_array_equal(out[0, 0], out[0, 1])
        np.testing.assert_array_equal(out[0, 3], out[0, 5])
        assert not (out[0, 0] == out[0, 2]).all()


class TestAdaptiveHCodec:
    def test_roundtrip(self, rng):
        cfg = AdaptiveConfig(base=small10(), similarity_threshold=0.5,
                             max_group_len=4, bottleneck_layers=1,
                             aggregator_layers=1)
        m = AdaptiveHCodec(cfg)
        L = 640 * 8
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, L // 320, cfg.base.feat_dim)).astype(np.float32)
        )
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        variables = m.init(rngs, wav, feat, train=False)

        ac, sem = m.apply(variables, wav, feat, method="encode")
        assert ac.shape == (1, 8, 2)
        # injected codes either -1 (pad) or encode a length in [1, max]
        a = np.asarray(ac)
        valid = a >= 0
        assert ((a[valid] // cfg.base.codebook_size + 1) <= 4).all()

        recon = m.apply(variables, ac, sem, method="decode")
        assert recon.shape == (1, L)

        fwd, pred_feat, commit = m.apply(variables, wav, feat, train=False)
        np.testing.assert_allclose(np.asarray(fwd), np.asarray(recon), atol=1e-4)

    def test_token_rate_adaptive(self, rng):
        cfg = AdaptiveConfig(base=small10(), similarity_threshold=0.99,
                             max_group_len=8, bottleneck_layers=1,
                             aggregator_layers=1)
        m = AdaptiveHCodec(cfg)
        L = 640 * 8
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        feat_shape = (1, L // 320, cfg.base.feat_dim)
        noise_wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        noise_feat = jnp.asarray(rng.standard_normal(feat_shape).astype(np.float32))
        variables = m.init(rngs, noise_wav, noise_feat, train=False)
        rate_noise = float(m.apply(variables, noise_wav, noise_feat,
                                   method="token_rate")[0])
        const_wav = jnp.ones((1, L, 1), jnp.float32) * 0.1
        const_feat = jnp.ones(feat_shape, jnp.float32)
        rate_const = float(m.apply(variables, const_wav, const_feat,
                                   method="token_rate")[0])
        # steady content -> fewer groups than noisy content
        assert rate_const <= rate_noise


class TestThresholdModes:
    """fixed / dynamic / manual threshold selection
    (modeling_flexicodec_new.py:351-367, 828-925)."""

    def _model(self, rng, mode="fixed", **kw):
        cfg = AdaptiveConfig(base=small10(), similarity_threshold=0.5,
                             max_group_len=8, bottleneck_layers=1,
                             aggregator_layers=1, threshold_mode=mode, **kw)
        m = AdaptiveHCodec(cfg)
        L = 640 * 8
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, L // 320, cfg.base.feat_dim)).astype(np.float32)
        )
        rngs = {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)}
        if mode == "dynamic":
            rngs["threshold"] = jax.random.PRNGKey(2)
        variables = m.init(rngs, wav, feat, train=False)
        return m, variables, wav, feat

    def test_manual_override_changes_rate(self, rng):
        m, variables, wav, feat = self._model(rng)
        r_low = float(m.apply(variables, wav, feat, method="token_rate",
                              threshold=-1.0)[0])  # nothing splits
        r_high = float(m.apply(variables, wav, feat, method="token_rate",
                               threshold=1.0)[0])  # everything splits
        assert r_low < r_high

    def test_manual_threshold_traced(self, rng):
        """threshold can be a traced scalar (jit without recompiles)."""
        m, variables, wav, feat = self._model(rng)
        f = jax.jit(lambda th: m.apply(variables, wav, feat,
                                       method="token_rate", threshold=th))
        r1 = float(f(jnp.float32(-1.0))[0])
        r2 = float(f(jnp.float32(1.0))[0])
        assert r1 < r2

    def test_dynamic_mode_samples_threshold(self, rng):
        m, variables, wav, feat = self._model(
            rng, mode="dynamic", threshold_lower=-1.5, threshold_upper=1.0)
        rates = {
            float(m.apply(variables, wav, feat, method="token_rate",
                          rngs={"threshold": jax.random.PRNGKey(s)})[0])
            for s in range(6)
        }
        assert len(rates) > 1  # different draws -> different rates

    def test_projected_bottleneck_used(self, rng):
        """The decode path runs the Mimi bottleneck transformer
        (reference-weight-compatible layout: layer_scale, in_proj, linears
        under bottleneck/transformer/layers)."""
        m, variables, wav, feat = self._model(rng)
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        names = {"/".join(str(k.key) for k in p) for p, _ in flat}
        assert any("bottleneck/transformer/layers" in n for n in names)
        assert any("layer_scale_1" in n for n in names)
        assert any(
            n.endswith("in_proj/kernel") and "bottleneck" in n for n in names)
