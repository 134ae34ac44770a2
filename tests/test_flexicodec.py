"""FlexiCodec / DualCodec tests (reference-compatible architecture:
DAC enc/RVQ/dec + ConvNeXt semantic adapters + FSQ; optional similarity
alignment mode). Weight-level parity vs the reference's own torch code is in
test_reference_golden.py; these cover shapes, round-trip consistency and the
distillation objective at tiny size."""
import numpy as np
import pytest
# whole-file slow tier: 264s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.models.hcodec.flexicodec import (
    DACEncoder, FlexiCodec, FlexiCodecConfig, fbank_semantic,
)


def tiny_cfg(**kw):
    base = dict(
        encoder_dim=4, encoder_rates=(2, 4, 8, 8), latent_dim=32,
        decoder_dim=32, decoder_rates=(8, 8, 4, 2), n_codebooks=2,
        codebook_size=32, codebook_dim=4, ssl_dim=32, convnext_dim=16,
        convnext_layers=2, fsq_levels=(4, 4, 4),
    )
    base.update(kw)
    return FlexiCodecConfig(**base)


def _sem(rng, b, t, d):
    return jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))


class TestDACEncoder:
    def test_downsample_rate(self, key, rng):
        m = DACEncoder(d_model=4, rates=(2, 4, 5, 8), latent_dim=16)
        x = jnp.asarray(rng.standard_normal((1, 3200, 1)).astype(np.float32))
        z = m.apply(m.init(key, x), x)
        assert z.shape == (1, 10, 16)  # 3200 / 320


class TestDualCodecMode:
    def test_roundtrip(self, rng):
        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        T = 6
        wav = jnp.asarray(
            rng.standard_normal((1, cfg.hop_length * T)).astype(np.float32))
        # semantic repr at 2x the latent rate (downsample factor 2)
        sem = _sem(rng, 1, 2 * T, cfg.ssl_dim)
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)

        out = m.apply(variables, wav, sem, train=False)
        assert out["recons"].shape[0] == 1
        ac, sq = m.apply(variables, wav, sem, method="encode")
        assert ac.shape == (1, T, cfg.n_codebooks)
        assert sq.shape == (1, T, 1)
        assert int(sq.max()) < np.prod(cfg.fsq_levels)
        rec = m.apply(variables, ac, sq, method="decode")
        # forward carries the STE value z + sg(q - z) (float-drifts ~ulp
        # from the exact codebook point decode reconstructs — same property
        # as the torch reference); tolerance covers the amplification
        np.testing.assert_allclose(
            np.asarray(out["recons"]), np.asarray(rec), atol=3e-3, rtol=0)

    def test_acoustic_rvq_quantizes_residual(self, rng):
        """DualCodec coupling: the acoustic RVQ input is
        encoder(x) - decoded_semantic, so full-encode acoustic codes differ
        from quantizing the raw encoder latents."""
        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        T = 6
        # quiet wav keeps encoder latents comparable in norm to the
        # decoded-semantic stream so the subtraction visibly flips codes
        wav = jnp.asarray(
            rng.standard_normal((1, cfg.hop_length * T)).astype(np.float32)
        ) * 1e-3
        sem = _sem(rng, 1, 2 * T, cfg.ssl_dim)
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)
        ac_full, _ = m.apply(variables, wav, sem, method="encode")
        ac_raw = m.apply(
            variables, wav,
            method=lambda mm, w: mm.quantizer.encode(mm.encoder(w[..., None])))
        assert np.any(np.asarray(ac_full) != np.asarray(ac_raw))


class TestAlignedMode:
    def test_roundtrip_with_lengths(self, rng):
        cfg = tiny_cfg(use_similarity_alignment=True,
                       use_query_token_aggregator=True,
                       use_bottleneck_transformer=True,
                       agg_layers=1, bottleneck_layers=1,
                       similarity_threshold=0.5)
        m = FlexiCodec(cfg)
        T = 8
        wav = jnp.asarray(
            rng.standard_normal((1, cfg.hop_length * T)).astype(np.float32))
        sem = _sem(rng, 1, 2 * T, cfg.ssl_dim)
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)
        ac, sq = m.apply(variables, wav, sem, method="encode")
        assert ac.shape == (1, T, cfg.n_codebooks)
        # padding groups are -1; valid codes carry injected lengths
        valid = np.asarray(ac[0, :, 0]) >= 0
        assert 0 < valid.sum() <= T
        lengths = np.asarray(ac[0, valid, 0]) // cfg.codebook_size + 1
        assert lengths.sum() == T
        rec = m.apply(variables, ac, sq, method="decode")
        assert rec.shape == (1, cfg.hop_length * T)
        # decode(encode(x)) must match the forward pass: encode's padding
        # groups carry data-dependent codes, decode's carry the -1 sentinel
        # — both sides must feed the semantic ConvNeXt decoder the SAME
        # (zeroed) tail context or the final receptive field diverges.
        # Tolerance covers the STE-vs-codebook-point drift (see DualCodec
        # roundtrip test).
        out = m.apply(variables, wav, sem, train=False)
        np.testing.assert_allclose(
            np.asarray(out["recons"]), np.asarray(rec), atol=3e-3, rtol=0)

    def test_low_threshold_fewer_groups(self, rng):
        cfg_hi = tiny_cfg(use_similarity_alignment=True,
                          use_query_token_aggregator=True,
                          agg_layers=1, similarity_threshold=0.999)
        m = FlexiCodec(cfg_hi)
        T = 8
        wav = jnp.asarray(
            rng.standard_normal((1, cfg_hi.hop_length * T)).astype(np.float32))
        sem = jnp.ones((1, 2 * T, cfg_hi.ssl_dim), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)
        # identical semantic frames: low threshold merges them all
        ac_lo, _ = m.apply(variables, wav, sem, 0.5, method="encode")
        ac_hi, _ = m.apply(variables, wav, sem, 1.0, method="encode")
        n_lo = int((np.asarray(ac_lo[0, :, 0]) >= 0).sum())
        n_hi = int((np.asarray(ac_hi[0, :, 0]) >= 0).sum())
        assert n_lo < n_hi


class TestDistillation:
    def _setup(self, rng):
        cfg = tiny_cfg(lambda_distill=15.0)
        m = FlexiCodec(cfg)
        T = 6
        wav = jnp.asarray(
            rng.standard_normal((1, cfg.hop_length * T)).astype(np.float32))
        sem = _sem(rng, 1, 2 * T, cfg.ssl_dim)
        teacher = _sem(rng, 1, 2 * T, cfg.convnext_dim)
        variables = m.init(jax.random.PRNGKey(0), wav, sem,
                           teacher_feats=teacher, train=False)
        return cfg, m, variables, wav, sem, teacher

    def test_distill_loss_present_and_finite(self, rng):
        cfg, m, variables, wav, sem, teacher = self._setup(rng)
        out = m.apply(variables, wav, sem, teacher_feats=teacher, train=False)
        assert "distill_loss" in out
        assert np.isfinite(float(out["distill_loss"]))
        out2 = m.apply(variables, wav, sem, train=False)
        assert "distill_loss" not in out2

    def test_gradients_reach_semantic_branch_not_decoder(self, rng):
        cfg, m, variables, wav, sem, teacher = self._setup(rng)

        def loss_fn(params):
            out = m.apply({"params": params}, wav, sem,
                          teacher_feats=teacher, train=False)
            return out["distill_loss"]

        grads = jax.grad(loss_fn)(variables["params"])
        g_sem = np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(grads["convnext_encoder"])])
        g_dec = np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree_util.tree_leaves(grads["decoder"])])
        assert np.abs(g_sem).max() > 0   # supervision reaches the branch
        assert np.abs(g_dec).max() == 0  # decoder untouched by distill

    def test_teacher_features_helper(self, rng):
        from unified_audio_tpu.models.hcodec.flexicodec import (
            teacher_features)
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

    def test_fbank_fallback_shape(self, rng):
        wav = jnp.asarray(rng.standard_normal((1, 16000)).astype(np.float32))
        f = fbank_semantic(wav, out_dim=96)
        assert f.shape[-1] == 96 and f.ndim == 3


class TestFlexiConverterRoundtrip:
    def test_roundtrip_dualcodec(self, rng):
        from unified_audio_tpu.utils.convert_hcodec import (
            convert_flexicodec, export_flexicodec_state_dict)

        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        T = 6
        wav = jnp.asarray(
            rng.standard_normal((1, cfg.hop_length * T)).astype(np.float32))
        sem = _sem(rng, 1, 2 * T, cfg.ssl_dim)
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)
        sd = export_flexicodec_state_dict(variables, cfg)
        back = convert_flexicodec(sd, cfg)
        ac1, s1 = m.apply(variables, wav, sem, method="encode")
        ac2, s2 = m.apply(back, wav, sem, method="encode")
        np.testing.assert_array_equal(np.asarray(ac1), np.asarray(ac2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        r1 = m.apply(variables, ac1, s1, method="decode")
        r2 = m.apply(back, ac1, s1, method="decode")
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_roundtrip_aligned(self, rng):
        from unified_audio_tpu.utils.convert_hcodec import (
            convert_flexicodec, export_flexicodec_state_dict)

        cfg = tiny_cfg(use_similarity_alignment=True,
                       use_query_token_aggregator=True,
                       use_bottleneck_transformer=True,
                       agg_layers=1, bottleneck_layers=1,
                       similarity_threshold=0.5)
        m = FlexiCodec(cfg)
        T = 8
        wav = jnp.asarray(
            rng.standard_normal((1, cfg.hop_length * T)).astype(np.float32))
        sem = _sem(rng, 1, 2 * T, cfg.ssl_dim)
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)
        sd = export_flexicodec_state_dict(variables, cfg)
        back = convert_flexicodec(sd, cfg)
        ac1, s1 = m.apply(variables, wav, sem, method="encode")
        ac2, s2 = m.apply(back, wav, sem, method="encode")
        np.testing.assert_array_equal(np.asarray(ac1), np.asarray(ac2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


class TestMatchFrameRate:
    """CLI-level rate adapter: the model consumes the semantic stream at 2x
    the acoustic frame rate; teacher frontends run at their own rates
    (SenseVoice LFR 16.67 Hz, fbank 100 Hz) and must be resampled or the
    model's min-trim truncates the reconstruction to the shorter stream."""

    def test_identity_and_endpoints(self, rng):
        from unified_audio_tpu.models.hcodec.flexicodec import (
            match_frame_rate)

        x = _sem(rng, 2, 10, 4)
        np.testing.assert_array_equal(np.asarray(match_frame_rate(x, 10)),
                                      np.asarray(x))
        up = np.asarray(match_frame_rate(x, 37))
        assert up.shape == (2, 37, 4)
        np.testing.assert_allclose(up[:, 0], np.asarray(x)[:, 0], atol=1e-6)
        np.testing.assert_allclose(up[:, -1], np.asarray(x)[:, -1],
                                   atol=1e-6)
        down = np.asarray(match_frame_rate(x, 5))
        assert down.shape == (2, 5, 4)

    def test_linear_between_frames(self, rng):
        from unified_audio_tpu.models.hcodec.flexicodec import (
            match_frame_rate)

        # ramp in time: linear resampling must reproduce the ramp exactly
        t = 8
        ramp = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.float32)[None, :, None], (1, t, 3))
        up = np.asarray(match_frame_rate(ramp, 15))
        np.testing.assert_allclose(
            up[0, :, 0], np.linspace(0, t - 1, 15), atol=1e-5)

    def test_frontend_rate_mismatch_no_truncation(self, rng):
        """fbank (100 Hz) rate-matched to 2x the acoustic rate encodes the
        FULL utterance: acoustic codes cover samples//hop frames."""
        from unified_audio_tpu.models.hcodec.flexicodec import (
            match_frame_rate)

        cfg = tiny_cfg()
        m = FlexiCodec(cfg)
        T = 6
        n = cfg.hop_length * T
        wav = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32))
        sem = fbank_semantic(wav, sample_rate=16000, out_dim=cfg.ssl_dim)
        assert sem.shape[1] != 2 * T  # the mismatch being fixed
        sem = match_frame_rate(sem, 2 * (n // cfg.hop_length))
        variables = m.init(jax.random.PRNGKey(0), wav, sem, train=False)
        ac, sq = m.apply(variables, wav, sem, method="encode")
        assert ac.shape[1] == T  # full-length, nothing trimmed away
        rec = m.apply(variables, ac, sq, method="decode")
        assert rec.shape[-1] == n
