"""Continuous-batching engine tests: greedy equivalence with sft.generate,
mixed-task pools, slot reuse."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.lm.llama import LlamaConfig
from unified_audio_tpu.models.lm.sft import LLMSFT
from unified_audio_tpu.serve.engine import ContinuousBatchingEngine, Request


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                      num_layers=2, num_heads=4)
    sft = LLMSFT(cfg, num_tasks=3, feats_dim=12)
    rng = np.random.default_rng(0)
    mix = rng.standard_normal((1, 10, 12)).astype(np.float32)
    g = jnp.zeros((1, 4), jnp.int32)
    s = jnp.zeros((1, 10), jnp.int32)
    params = sft.init(jax.random.PRNGKey(0), 0, None, jnp.asarray(mix), g, s)
    return cfg, sft, params, rng


class TestEngine:
    def test_greedy_matches_generate(self, setup):
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((10, 12)).astype(np.float32)

        ref_g, ref_s = sft.apply(
            params, 0, None, jnp.asarray(mix)[None], jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False,
        )

        eng = ContinuousBatchingEngine(sft, params, num_slots=2,
                                       max_cache_len=64, max_global=8,
                                       max_semantic=16)
        req = Request(task_id=0, mix_feats=mix, global_length=4,
                      semantic_length=6, do_sample=False, uid=1)
        results = eng.run([req], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[1].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[1].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_mixed_task_pool(self, setup):
        cfg, sft, params, rng = setup
        reqs = []
        for uid, task in enumerate(["se", "tse", "rtse", "se", "tse"]):
            tid = {"se": 0, "tse": 1, "rtse": 2}[task]
            enroll = (rng.standard_normal((8, 12)).astype(np.float32)
                      if task != "se" else None)
            reqs.append(Request(
                task_id=tid,
                mix_feats=rng.standard_normal((10, 12)).astype(np.float32),
                enroll_feats=enroll, global_length=4, semantic_length=6,
                do_sample=True, uid=uid,
            ))
        eng = ContinuousBatchingEngine(sft, params, num_slots=2,
                                       max_cache_len=64, max_global=8,
                                       max_semantic=16)
        results = eng.run(reqs, jax.random.PRNGKey(3))
        assert sorted(results) == [0, 1, 2, 3, 4]
        for r in results.values():
            assert r.global_ids.shape == (4,) and r.semantic_ids.shape == (6,)
            assert 0 <= r.global_ids.min() and r.global_ids.max() < cfg.global_size
            assert 0 <= r.semantic_ids.min() and r.semantic_ids.max() < cfg.semantic_size

    def test_isolation_between_slots(self, setup):
        """A request's greedy result is the same whether decoded alone or
        alongside other traffic (slot isolation)."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((10, 12)).astype(np.float32)
        alone = ContinuousBatchingEngine(sft, params, num_slots=2,
                                         max_cache_len=64, max_global=8,
                                         max_semantic=16)
        r_alone = alone.run(
            [Request(task_id=0, mix_feats=mix, global_length=4,
                     semantic_length=6, do_sample=False, uid=7)],
            jax.random.PRNGKey(0),
        )[7]

        busy = ContinuousBatchingEngine(sft, params, num_slots=2,
                                        max_cache_len=64, max_global=8,
                                        max_semantic=16)
        other = Request(task_id=1,
                        mix_feats=rng.standard_normal((10, 12)).astype(np.float32),
                        enroll_feats=rng.standard_normal((8, 12)).astype(np.float32),
                        global_length=4, semantic_length=10, do_sample=True,
                        uid=8)
        mine = Request(task_id=0, mix_feats=mix, global_length=4,
                       semantic_length=6, do_sample=False, uid=7)
        r_busy = busy.run([other, mine], jax.random.PRNGKey(1))[7]
        np.testing.assert_array_equal(r_alone.global_ids, r_busy.global_ids)
        np.testing.assert_array_equal(r_alone.semantic_ids, r_busy.semantic_ids)


class TestPagedKV:
    def test_matches_dense_cache(self, setup):
        """Paged decode over a block pool == the dense static-cache path."""
        from unified_audio_tpu.models.lm.llama import LlamaBackbone, init_cache
        from unified_audio_tpu.serve.paged import (
            BlockAllocator, init_pool, paged_decode_step,
        )

        cfg, sft, params, rng = setup
        backbone = LlamaBackbone(cfg)
        bb_params = params["params"]["lm"]["backbone"]

        t = 10
        embeds = jnp.asarray(
            rng.standard_normal((1, t, cfg.hidden_size)).astype(np.float32)
        )

        # dense reference: token-by-token through the static cache
        cache = init_cache(cfg, 1, 16)
        dense_out = []
        for i in range(t):
            h, cache = backbone.apply(
                {"params": bb_params}, embeds[:, i : i + 1], cache,
                method="decode_step",
            )
            dense_out.append(h)
        dense = jnp.concatenate(dense_out, axis=1)

        # paged: block size 4, blocks allocated on demand
        block_size, max_blocks = 4, 4
        alloc = BlockAllocator(num_blocks=8)
        pool = init_pool(cfg, num_blocks=8, block_size=block_size)
        table = np.zeros(max_blocks, np.int32)
        n_alloc = 0
        paged_out = []
        for i in range(t):
            if i // block_size >= n_alloc:
                table[n_alloc] = alloc.alloc(1)[0]
                n_alloc += 1
            h, pool = paged_decode_step(
                cfg, bb_params, pool, jnp.asarray(table), jnp.asarray(i),
                embeds[:, i : i + 1], block_size=block_size,
            )
            paged_out.append(h)
        paged = jnp.concatenate(paged_out, axis=1)

        np.testing.assert_allclose(
            np.asarray(dense), np.asarray(paged), atol=2e-4
        )

    def test_allocator(self):
        from unified_audio_tpu.serve.paged import BlockAllocator

        a = BlockAllocator(4)
        b1 = a.alloc(3)
        assert len(b1) == 3 and len(a.free) == 1
        a.release(b1[:2])
        assert len(a.free) == 3
        import pytest as _pytest
        with _pytest.raises(RuntimeError):
            a.alloc(5)
