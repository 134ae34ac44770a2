"""AR-LM tests: KV-cache correctness (the reference's llm.py:384-396 checks,
made into real tests), sampling-rule goldens vs torch, SFT generate contracts."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.lm.llama import (
    CodecLM, LlamaBackbone, LlamaConfig, init_cache, range_mask, sample_logits,
)
from unified_audio_tpu.models.lm.sft import LLMSFT


def tiny_cfg():
    return LlamaConfig(
        global_size=16, semantic_size=32, hidden_size=32, num_layers=2,
        num_heads=4,
    )


class TestKVCache:
    def test_cached_decode_matches_full_forward(self, key, rng):
        """Replay token-by-token through the cache == full forward
        (the commented check at llm.py:384-396)."""
        cfg = tiny_cfg()
        m = LlamaBackbone(cfg)
        t = 9
        embeds = jnp.asarray(
            rng.standard_normal((2, t, cfg.hidden_size)).astype(np.float32)
        )
        variables = m.init(key, embeds)
        full = m.apply(variables, embeds)

        cache = init_cache(cfg, 2, t)
        outs = []
        for i in range(t):
            h, cache = m.apply(
                variables, embeds[:, i : i + 1], cache, method="decode_step"
            )
            outs.append(h)
        stepped = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(stepped), atol=1e-4
        )

    def test_prefill_then_decode_matches_full(self, key, rng):
        cfg = tiny_cfg()
        m = LlamaBackbone(cfg)
        embeds = jnp.asarray(
            rng.standard_normal((1, 8, cfg.hidden_size)).astype(np.float32)
        )
        variables = m.init(key, embeds)
        full = m.apply(variables, embeds)
        cache = init_cache(cfg, 1, 8)
        h1, cache = m.apply(variables, embeds[:, :5], cache, method="prefill")
        h2, cache = m.apply(variables, embeds[:, 5:], cache, method="decode_step")
        np.testing.assert_allclose(np.asarray(full[:, :5]), np.asarray(h1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(full[:, 5:]), np.asarray(h2), atol=1e-4)

    def test_prefix_invariance(self, key, rng):
        """Changing the future does not change past hidden states (llm.py:387-390)."""
        cfg = tiny_cfg()
        m = LlamaBackbone(cfg)
        a = jnp.asarray(rng.standard_normal((1, 10, cfg.hidden_size)).astype(np.float32))
        variables = m.init(key, a)
        b = a.at[:, 6:].set(0.0)
        np.testing.assert_allclose(
            np.asarray(m.apply(variables, a)[:, :6]),
            np.asarray(m.apply(variables, b)[:, :6]),
            atol=1e-5,
        )


class TestSampling:
    def _torch_filter(self, logits, top_k, top_p):
        """Reference top-k/top-p filtering (llm.py:261-276)."""
        logits = torch.from_numpy(logits.copy())
        if top_k > 0:
            remove = logits < torch.topk(logits, top_k)[0][..., -1, None]
            logits[remove] = float("-inf")
        if top_p < 1.0:
            sorted_logits, sorted_idx = torch.sort(logits, descending=True)
            cum = torch.cumsum(torch.softmax(sorted_logits, dim=-1), dim=-1)
            rm = cum > top_p
            rm[..., 1:] = rm[..., :-1].clone()
            rm[..., 0] = 0
            remove = rm.scatter(-1, sorted_idx, rm)
            logits[remove] = float("-inf")
        return logits.numpy()

    @pytest.mark.parametrize("top_k,top_p", [(5, 0.9), (0, 0.5), (3, 1.0)])
    def test_allowed_set_matches_reference(self, rng, top_k, top_p):
        logits = rng.standard_normal((4, 20)).astype(np.float32) * 3
        ref = self._torch_filter(logits, top_k, top_p)
        allowed_ref = np.isfinite(ref)

        # greedy over many sampled draws must stay within the reference set
        key = jax.random.PRNGKey(0)
        for i in range(20):
            key, sub = jax.random.split(key)
            toks = np.asarray(
                sample_logits(sub, jnp.asarray(logits), temperature=1.0,
                              top_k=top_k, top_p=top_p)
            )
            for b in range(4):
                assert allowed_ref[b, toks[b]], (b, toks[b])

    def test_greedy(self, rng):
        logits = rng.standard_normal((3, 11)).astype(np.float32)
        toks = np.asarray(
            sample_logits(jax.random.PRNGKey(0), jnp.asarray(logits),
                          do_sample=False)
        )
        np.testing.assert_array_equal(toks, logits.argmax(-1))


class TestCodecLM:
    def test_loss_matches_torch_kldiv(self, key, rng):
        """Label-smoothed KL == torch kl_div(batchmean) on smoothed dist."""
        cfg = tiny_cfg()
        m = CodecLM(cfg)
        logits = rng.standard_normal((6, cfg.vocab_size)).astype(np.float32)
        targets = rng.integers(0, cfg.vocab_size, (6,))

        ours = CodecLM.loss_function(m, jnp.asarray(logits), jnp.asarray(targets))

        lt = torch.from_numpy(logits)
        conf = 1.0 - cfg.label_smoothing
        true = torch.full_like(lt, cfg.label_smoothing / (cfg.vocab_size - 1))
        true.scatter_(1, torch.from_numpy(targets)[:, None], conf)
        ref = torch.nn.functional.kl_div(
            torch.log_softmax(lt, dim=-1), true, reduction="batchmean"
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_pretrain_forward(self, key, rng):
        cfg = tiny_cfg()
        m = CodecLM(cfg)
        g = jnp.asarray(rng.integers(0, cfg.global_size, (2, 4)))
        s = jnp.asarray(rng.integers(0, cfg.semantic_size, (2, 10)))
        variables = m.init(key, g, s)
        loss, acc = m.apply(variables, g, s)
        assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0


class TestLLMSFT:
    def _model_and_vars(self, key, rng, with_enroll):
        cfg = tiny_cfg()
        m = LLMSFT(cfg, num_tasks=3, feats_dim=12)
        mix = jnp.asarray(rng.standard_normal((2, 20, 12)).astype(np.float32))
        enroll = (
            jnp.asarray(rng.standard_normal((2, 20, 12)).astype(np.float32))
            if with_enroll else None
        )
        g = jnp.asarray(rng.integers(0, cfg.global_size, (2, 4)))
        s = jnp.asarray(rng.integers(0, cfg.semantic_size, (2, 20)))
        variables = m.init(key, 0, enroll, mix, g, s)
        return cfg, m, variables, enroll, mix, g, s

    @pytest.mark.parametrize("with_enroll", [False, True])
    def test_forward_and_generate(self, key, rng, with_enroll):
        cfg, m, variables, enroll, mix, g, s = self._model_and_vars(
            key, rng, with_enroll
        )
        loss, acc = m.apply(variables, 0, enroll, mix, g, s)
        assert np.isfinite(float(loss))

        gids, sids = m.apply(
            variables, 1 if with_enroll else 0, enroll, mix,
            jax.random.PRNGKey(5), method="generate",
            global_length=4, semantic_length=6,
        )
        assert gids.shape == (2, 4) and sids.shape == (2, 6)
        assert 0 <= int(gids.min()) and int(gids.max()) < cfg.global_size
        assert 0 <= int(sids.min()) and int(sids.max()) < cfg.semantic_size

    def test_generate_deterministic_greedy(self, key, rng):
        cfg, m, variables, enroll, mix, g, s = self._model_and_vars(key, rng, False)
        out1 = m.apply(variables, 0, None, mix, jax.random.PRNGKey(1),
                       method="generate", global_length=4, semantic_length=6,
                       do_sample=False)
        out2 = m.apply(variables, 0, None, mix, jax.random.PRNGKey(2),
                       method="generate", global_length=4, semantic_length=6,
                       do_sample=False)
        np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
        np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


class TestConformer:
    def test_forward(self, key, rng):
        from unified_audio_tpu.models.lm.conformer import ConformerEncoder

        m = ConformerEncoder(num_layers=2, dim=32, heads=4, dim_head=8)
        x = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
        y = m.apply(m.init(key, x), x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_joint_attention(self, key, rng):
        """MM-DiT joint attention (conformer.py:192-302): both streams
        out, padded sample positions zeroed, context never masked."""
        from unified_audio_tpu.models.lm.conformer import JointAttention
        from unified_audio_tpu.nn.transformer import rope_cos_sin

        m = JointAttention(dim=32, heads=4, dim_head=8)
        x = jnp.asarray(rng.standard_normal((2, 6, 32)).astype(np.float32))
        c = jnp.asarray(rng.standard_normal((2, 4, 32)).astype(np.float32))
        rope = rope_cos_sin(jnp.arange(6), 8)
        c_rope = rope_cos_sin(jnp.arange(4), 8)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1] * 6], bool)
        params = m.init(key, x, c, mask, rope, c_rope)
        xo, co = m.apply(params, x, c, mask, rope, c_rope)
        assert xo.shape == x.shape and co.shape == c.shape
        # masked sample rows are zeroed
        np.testing.assert_array_equal(np.asarray(xo[0, 4:]), 0.0)
        assert np.abs(np.asarray(xo[1])).min() > 0
        # masked positions do not influence other rows: perturb a padded row
        x2 = x.at[0, 5].set(7.0)
        xo2, co2 = m.apply(params, x2, c, mask, rope, c_rope)
        np.testing.assert_allclose(np.asarray(xo[0, :4]),
                                   np.asarray(xo2[0, :4]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(co), np.asarray(co2),
                                   atol=1e-6)

    def test_joint_attention_context_pre_only(self, key, rng):
        from unified_audio_tpu.models.lm.conformer import JointAttention

        m = JointAttention(dim=16, heads=2, dim_head=8, context_pre_only=True)
        x = jnp.zeros((1, 3, 16))
        c = jnp.zeros((1, 2, 16))
        xo, co = m.apply(m.init(key, x, c), x, c)
        assert co is None and xo.shape == x.shape
