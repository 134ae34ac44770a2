"""Dispatch-overshoot decomposition (serve/engine.py _segment_chunks):
minimizing dispatch count with bounded pow2 round-up must be token-exact
(PHASE_DONE rows no-op into the trash block) while issuing strictly fewer
step dispatches than the exact popcount decomposition."""
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


def make_engine(sft, params, **kw):
    kw.setdefault("num_slots", 2)
    kw.setdefault("block_size", 8)
    kw.setdefault("max_global", 8)
    kw.setdefault("max_semantic", 64)
    kw.setdefault("mix_buckets", (10,))
    return ContinuousBatchingEngine(sft, params, **kw)


class TestSegmentChunks:
    """Pure decomposition math (no device work)."""

    def _chunks(self, eng, rem, mx, pi=256, coarse=False):
        return eng._segment_chunks(rem, mx, pi, coarse)

    def test_pow2_within_poll_interval(self, setup):
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params)
        for rem in (1, 7, 33, 130, 250, 283, 511):
            for pi in (64, 256):
                ch = self._chunks(eng, rem, rem, pi)
                assert sum(ch) >= rem
                assert all(c & (c - 1) == 0 and 1 <= c <= pi for c in ch)
                # waste bounded by the overshoot fraction
                assert sum(ch) - rem <= max(0, int(
                    rem * eng.dispatch_overshoot))

    def test_fewer_dispatches_than_popcount(self, setup):
        """The serving-size segment (283 = 33 global + 250 semantic) must
        drop from 5 exact-popcount dispatches to 2."""
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params)
        assert self._chunks(eng, 283, 283) == [256, 32]
        assert self._chunks(eng, 250, 250) == [256]

    def test_zero_overshoot_restores_exact(self, setup):
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params, dispatch_overshoot=0.0)
        ch = self._chunks(eng, 283, 283)
        assert sum(ch) == 283  # exact popcount decomposition
        assert ch == [256, 16, 8, 2, 1]

    def test_coarse_spends_other_slots_work(self, setup):
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params)
        # another slot still needs 283: rounding 130 -> 256 is productive
        assert self._chunks(eng, 130, 283, coarse=True) == [256]
        assert self._chunks(eng, 130, 283, coarse=False) == [128, 2]


class TestOvershootEndToEnd:
    def test_overshoot_token_exact_with_fewer_dispatches(self, setup):
        """run() with the default overshoot == run() with the exact
        decomposition, token for token, across displacing waves of
        popcount-heavy lengths — while dispatching strictly less."""
        cfg, sft, params, rng = setup
        lengths = [(4, 55), (3, 59), (4, 45), (2, 61), (4, 53), (3, 47)]
        feats = [rng.standard_normal((10, 12)).astype(np.float32)
                 for _ in lengths]

        def reqs():
            return [Request(task_id=i % 3, mix_feats=feats[i],
                            enroll_feats=feats[i] if i % 3 else None,
                            global_length=g, semantic_length=s,
                            do_sample=False, uid=700 + i)
                    for i, (g, s) in enumerate(lengths)]

        exact_eng = make_engine(sft, params, dispatch_overshoot=0.0)
        exact = exact_eng.run(reqs(), jax.random.PRNGKey(0))
        over_eng = make_engine(sft, params)  # default 0.05
        over = over_eng.run(reqs(), jax.random.PRNGKey(0))

        assert set(exact) == set(over)
        for uid in exact:
            np.testing.assert_array_equal(
                np.asarray(exact[uid].global_ids),
                np.asarray(over[uid].global_ids))
            np.testing.assert_array_equal(
                np.asarray(exact[uid].semantic_ids),
                np.asarray(over[uid].semantic_ids))
        assert (over_eng.stats()["step_dispatches"]
                < exact_eng.stats()["step_dispatches"])

    def test_sampled_decode_overshoot_deterministic(self, setup):
        """Sampled decode: overshoot must not consume extra per-slot RNG —
        the same request sampled through exact and overshot decompositions
        draws identical tokens (per-position key folding)."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((10, 12)).astype(np.float32)

        def one(overshoot):
            eng = make_engine(sft, params, dispatch_overshoot=overshoot)
            res = eng.run([Request(task_id=0, mix_feats=mix,
                                   global_length=4, semantic_length=55,
                                   do_sample=True, temperature=1.0,
                                   uid=11)], jax.random.PRNGKey(3))
            return (np.asarray(res[11].global_ids),
                    np.asarray(res[11].semantic_ids))

        g0, s0 = one(0.0)
        g1, s1 = one(0.05)
        np.testing.assert_array_equal(g0, g1)
        np.testing.assert_array_equal(s0, s1)
