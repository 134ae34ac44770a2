"""Continuous-batching paged-KV engine tests: greedy equivalence with
sft.generate, mixed-task pools, slot isolation, per-request sampling params,
bucketed prompt padding, block-pool recycling, admit validation."""
import numpy as np
import pytest
# whole-file slow tier: 773s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.models.lm.llama import (
    LlamaConfig, sample_logits, sample_logits_vec,
)
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
    kw.setdefault("max_semantic", 16)
    kw.setdefault("mix_buckets", (10, 16))
    return ContinuousBatchingEngine(sft, params, **kw)


class TestEngine:
    def test_greedy_matches_generate(self, setup):
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((10, 12)).astype(np.float32)

        ref_g, ref_s = sft.apply(
            params, 0, None, jnp.asarray(mix)[None], jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False,
        )

        eng = make_engine(sft, params)
        req = Request(task_id=0, mix_feats=mix, global_length=4,
                      semantic_length=6, do_sample=False, uid=1)
        results = eng.run([req], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[1].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[1].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_greedy_matches_generate_padded_bucket(self, setup):
        """A prompt shorter than its bucket must decode identically to the
        unpadded generate (right-pad safety of the paged prefill)."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((7, 12)).astype(np.float32)  # bucket 10

        ref_g, ref_s = sft.apply(
            params, 1, None, jnp.asarray(mix)[None], jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False,
        )
        eng = make_engine(sft, params)
        results = eng.run(
            [Request(task_id=1, mix_feats=mix, global_length=4,
                     semantic_length=6, do_sample=False, uid=5)],
            jax.random.PRNGKey(0),
        )
        np.testing.assert_array_equal(results[5].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[5].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_greedy_with_enroll_padded(self, setup):
        """Enroll pad sits mid-prompt: the in-graph compaction must keep the
        result identical to the unpadded generate."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((9, 12)).astype(np.float32)
        enroll = rng.standard_normal((6, 12)).astype(np.float32)  # bucket 10

        ref_g, ref_s = sft.apply(
            params, 1, jnp.asarray(enroll)[None], jnp.asarray(mix)[None],
            jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False,
        )
        eng = make_engine(sft, params)
        results = eng.run(
            [Request(task_id=1, mix_feats=mix, enroll_feats=enroll,
                     global_length=4, semantic_length=6, do_sample=False,
                     uid=2)],
            jax.random.PRNGKey(0),
        )
        np.testing.assert_array_equal(results[2].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[2].semantic_ids,
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
        eng = make_engine(sft, params)
        results = eng.run(reqs, jax.random.PRNGKey(3))
        assert sorted(results) == [0, 1, 2, 3, 4]
        for r in results.values():
            assert r.global_ids.shape == (4,) and r.semantic_ids.shape == (6,)
            assert 0 <= r.global_ids.min() and r.global_ids.max() < cfg.global_size
            assert 0 <= r.semantic_ids.min() and r.semantic_ids.max() < cfg.semantic_size

    def test_isolation_between_slots(self, setup):
        """A request's greedy result is the same whether decoded alone or
        alongside other traffic (slot isolation over the shared block pool)."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((10, 12)).astype(np.float32)
        alone = make_engine(sft, params)
        r_alone = alone.run(
            [Request(task_id=0, mix_feats=mix, global_length=4,
                     semantic_length=6, do_sample=False, uid=7)],
            jax.random.PRNGKey(0),
        )[7]

        busy = make_engine(sft, params)
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

    def test_per_request_sampling_params(self, setup):
        """top_k=1 sampling is argmax: a do_sample request with top_k=1 must
        reproduce the greedy result even while a co-tenant samples with
        different per-slot params (the round-1 engine hardcoded
        temperature=0.8/top_k=50/top_p=0.95 for every slot)."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal((10, 12)).astype(np.float32)

        eng = make_engine(sft, params)
        greedy = eng.run(
            [Request(task_id=0, mix_feats=mix, global_length=4,
                     semantic_length=6, do_sample=False, uid=1)],
            jax.random.PRNGKey(0),
        )[1]

        eng2 = make_engine(sft, params)
        reqs = [
            Request(task_id=0, mix_feats=mix, global_length=4,
                    semantic_length=6, do_sample=True, top_k=1,
                    temperature=2.5, top_p=0.3, uid=1),
            Request(task_id=2,
                    mix_feats=rng.standard_normal((10, 12)).astype(np.float32),
                    enroll_feats=rng.standard_normal((8, 12)).astype(np.float32),
                    global_length=4, semantic_length=6, do_sample=True,
                    temperature=1.3, top_k=5, top_p=0.9, uid=2),
        ]
        results = eng2.run(reqs, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(results[1].global_ids, greedy.global_ids)
        np.testing.assert_array_equal(results[1].semantic_ids,
                                      greedy.semantic_ids)

    def test_block_pool_recycling(self, setup):
        """A pool with blocks for only ~one request still completes a longer
        stream: blocks are released at harvest and reused."""
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params, num_blocks=8)  # 7 usable blocks
        reqs = [Request(task_id=0,
                        mix_feats=rng.standard_normal((10, 12)).astype(np.float32),
                        global_length=4, semantic_length=6, do_sample=False,
                        uid=u) for u in range(4)]
        results = eng.run(reqs, jax.random.PRNGKey(0))
        assert sorted(results) == [0, 1, 2, 3]
        assert len(eng.allocator.free) == 7

    def test_staggered_lengths_match_solo_runs(self, setup):
        """Mixed decode lengths => completions interleave mid-wave; the
        deterministic reap/displace scheduler must produce EXACTLY the
        tokens each request gets when run alone (greedy)."""
        cfg, sft, params, rng = setup
        lengths = [(2, 3), (4, 9), (1, 6), (3, 12), (2, 5), (4, 4)]
        feats = [rng.standard_normal((10, 12)).astype(np.float32)
                 for _ in lengths]

        def req(i):
            g, s = lengths[i]
            return Request(task_id=i % 3, mix_feats=feats[i],
                           enroll_feats=feats[i] if i % 3 else None,
                           global_length=g, semantic_length=s,
                           do_sample=False, uid=100 + i)

        solo = {}
        for i in range(len(lengths)):
            eng = make_engine(sft, params)
            solo[100 + i] = eng.run([req(i)], jax.random.PRNGKey(0))[100 + i]

        eng = make_engine(sft, params)
        mixed = eng.run([req(i) for i in range(len(lengths))],
                        jax.random.PRNGKey(1))
        assert set(mixed) == set(solo)
        for uid in solo:
            np.testing.assert_array_equal(
                np.asarray(mixed[uid].global_ids),
                np.asarray(solo[uid].global_ids), err_msg=f"uid {uid} global")
            np.testing.assert_array_equal(
                np.asarray(mixed[uid].semantic_ids),
                np.asarray(solo[uid].semantic_ids),
                err_msg=f"uid {uid} semantic")

    def test_deferred_drain_matches_eager(self, setup):
        """eager_drain=False batches every stashed-output fetch into one
        end-of-run device_get; tokens must be identical to the per-wave
        eager drain (only fetch timing may differ)."""
        cfg, sft, params, rng = setup
        lengths = [(2, 3), (4, 9), (1, 6), (3, 12), (2, 5), (4, 4)]
        feats = [rng.standard_normal((10, 12)).astype(np.float32)
                 for _ in lengths]

        def reqs():
            return [Request(task_id=i % 3, mix_feats=feats[i],
                            enroll_feats=feats[i] if i % 3 else None,
                            global_length=g, semantic_length=s,
                            do_sample=False, uid=200 + i)
                    for i, (g, s) in enumerate(lengths)]

        eager = make_engine(sft, params, eager_drain=True).run(
            reqs(), jax.random.PRNGKey(0))
        deferred_eng = make_engine(sft, params, eager_drain=False)
        deferred = deferred_eng.run(reqs(), jax.random.PRNGKey(0))
        # 6 requests through 2 slots => multiple displacing waves, but all
        # stashes must have drained in (at most) one batched fetch
        assert deferred_eng.stats()["stash_fetches"] <= 1
        assert set(eager) == set(deferred)
        for uid in eager:
            np.testing.assert_array_equal(
                np.asarray(eager[uid].global_ids),
                np.asarray(deferred[uid].global_ids))
            np.testing.assert_array_equal(
                np.asarray(eager[uid].semantic_ids),
                np.asarray(deferred[uid].semantic_ids))

    def test_link_degradation_detector(self, setup):
        """_link_degraded flips once the rolling median dispatch wall passes
        the threshold, and stats() exposes the diagnostic."""
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params, degraded_dispatch_ms=25.0)
        assert not eng._link_degraded()  # empty window
        eng._dispatch_walls.extend([0.001] * 8)
        assert not eng._link_degraded()  # healthy: ~1 ms enqueue
        assert eng.stats()["link_degraded"] is False
        eng._dispatch_walls.extend([0.07] * 32)  # relay stopped pipelining
        assert eng._link_degraded()
        st = eng.stats()
        assert st["link_degraded"] is True
        assert st["dispatch_ms_median"] > 25.0
        eng2 = make_engine(sft, params, link_adapt=False)
        eng2._dispatch_walls.extend([0.07] * 32)
        assert not eng2._link_degraded()

    def test_throttled_link_coarse_mode(self, setup):
        """Degraded-link adaptation (docs/PERFORMANCE.md "third failure
        mode"): with every step dispatch sleep-throttled (the relay's
        stopped-pipelining signature), the coarse decomposition must (a)
        produce token-identical results, (b) issue strictly fewer step
        dispatches, (c) keep >=60% of the un-throttled throughput where
        the un-adapted engine falls well below it."""
        import time as _time

        cfg, sft, params, rng = setup
        # popcount-heavy decode lengths: exact decomposition needs several
        # dispatches per completion segment. Lengths are sized so device
        # work per dispatch is realistic relative to the injected RTT —
        # the real failure mode is ~70 ms blocking dispatches against
        # hundreds of ms of decode work.
        lengths = [(4, 55), (3, 59), (4, 45), (2, 61), (4, 53), (3, 47),
                   (4, 57), (2, 51)]
        feats = [rng.standard_normal((10, 12)).astype(np.float32)
                 for _ in lengths]

        def reqs(base):
            return [Request(task_id=0, mix_feats=feats[i],
                            global_length=g, semantic_length=s,
                            do_sample=False, uid=base + i)
                    for i, (g, s) in enumerate(lengths)]

        def toks(res, base):
            return [(np.asarray(res[base + i].global_ids),
                     np.asarray(res[base + i].semantic_ids))
                    for i in range(len(lengths))]

        def throttle(eng, seconds):
            orig = eng._step_n

            def slow(*a, **kw):
                _time.sleep(seconds)
                return orig(*a, **kw)

            eng._step_n = slow

        def timed_run(eng, base):
            eng.run(reqs(base), jax.random.PRNGKey(0))  # warm compile
            d0 = eng.stats()["step_dispatches"]
            t0 = _time.perf_counter()
            res = eng.run(reqs(base + 50), jax.random.PRNGKey(0))
            wall = _time.perf_counter() - t0
            return (toks(res, base + 50), wall,
                    eng.stats()["step_dispatches"] - d0)

        kw = dict(max_semantic=64)
        # idle control
        eng_idle = make_engine(sft, params, **kw)
        tok_idle, wall_idle, disp_idle = timed_run(eng_idle, 300)
        # Injected RTT scaled to the measured idle wall, not a fixed
        # constant: the >=60%-of-idle claim holds when the per-dispatch
        # link cost is a bounded FRACTION of the decode work (on chip:
        # ~70 ms RTT vs hundreds of ms of decode per coarse chunk). A
        # fixed sleep against this tiny CPU model's ~microsecond steps
        # made the bar unreachable regardless of adaptation quality and
        # load-dependent (first seen flaking under a concurrent bench).
        # 4% of idle per dispatch => unadapted pays ~26 x 4% (= 2x wall),
        # adapted's floor of ~9 dispatches pays ~36%.
        sleep = max(0.002, wall_idle * 0.04)
        # throttled, adaptation ON. Threshold 0 + a primed window => coarse
        # from the first wave, so the warm run compiles the SAME coarse
        # chunk programs the timed run uses.
        eng_ad = make_engine(sft, params, degraded_dispatch_ms=0.0, **kw)
        eng_ad._dispatch_walls.extend([1.0] * 8)
        throttle(eng_ad, sleep)
        tok_ad, wall_ad, disp_ad = timed_run(eng_ad, 400)
        # throttled, adaptation OFF
        eng_off = make_engine(sft, params, link_adapt=False, **kw)
        throttle(eng_off, sleep)
        tok_off, wall_off, disp_off = timed_run(eng_off, 500)

        # (a) token-identical across all three
        for (gi, si), (ga, sa), (go, so) in zip(tok_idle, tok_ad, tok_off):
            np.testing.assert_array_equal(gi, ga)
            np.testing.assert_array_equal(si, sa)
            np.testing.assert_array_equal(gi, go)
            np.testing.assert_array_equal(si, so)
        # (b) coarse mode fired and cut dispatches
        assert eng_ad.stats()["coarse_chunks"] > 0
        assert disp_ad < disp_off
        assert disp_off == disp_idle  # un-adapted decomposition unchanged
        # (c) throughput: same tokens, so walls compare directly. The
        # adapted run must stay >=60% of idle where the un-adapted run
        # pays sleep * popcount-many dispatches.
        assert wall_ad < wall_off
        assert wall_idle / wall_ad >= 0.6, (wall_idle, wall_ad, wall_off)

    def test_cancel_mid_flight(self, setup):
        """Cancelling one request frees its slot/blocks and does not perturb
        the surviving request's greedy output."""
        cfg, sft, params, rng = setup
        feats = rng.standard_normal((10, 12)).astype(np.float32)
        keep = Request(task_id=0, mix_feats=feats, global_length=3,
                       semantic_length=8, do_sample=False, uid=1)
        solo = make_engine(sft, params).run([keep], jax.random.PRNGKey(0))[1]

        eng = make_engine(sft, params)
        victim = Request(task_id=0,
                         mix_feats=rng.standard_normal((10, 12)).astype(
                             np.float32),
                         global_length=8, semantic_length=16,
                         do_sample=False, uid=2)
        eng.admit_many([keep, victim], jax.random.PRNGKey(0))
        eng.step(n=4)
        assert eng.cancel(2)
        assert not eng.cancel(99)
        blocks_free = len(eng.allocator.free)
        # drive the survivor to completion
        res = None
        for _ in range(40):
            eng.step(n=4)
            out = eng.harvest()
            if out:
                res = out[0]
                break
        assert res is not None and res.uid == 1
        np.testing.assert_array_equal(np.asarray(res.global_ids),
                                      np.asarray(solo.global_ids))
        np.testing.assert_array_equal(np.asarray(res.semantic_ids),
                                      np.asarray(solo.semantic_ids))
        assert len(eng.allocator.free) > blocks_free  # survivor's too, now
        assert eng.stats()["requests_cancelled"] == 1

    def test_stats_counters(self, setup):
        """Serving observability: counters agree with the request stream and
        the pool is fully released after the run."""
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params)
        reqs = [Request(task_id=0,
                        mix_feats=rng.standard_normal((10, 12)).astype(
                            np.float32),
                        global_length=2, semantic_length=4,
                        do_sample=False, uid=i) for i in range(5)]
        results = eng.run(reqs, jax.random.PRNGKey(0))
        st = eng.stats()
        assert st["requests_admitted"] == 5
        assert st["requests_completed"] == 5
        assert st["tokens_generated"] == 5 * (2 + 1 + 4)
        assert st["decode_steps"] >= 3 * (2 + 1 + 4)  # >= 3 sequential waves
        assert st["prefill_waves"] >= 3
        assert st["blocks_held"] == 0 and st["active_slots"] == 0
        assert len(results) == 5

    def test_admit_validation(self, setup):
        cfg, sft, params, rng = setup
        eng = make_engine(sft, params)
        mix = rng.standard_normal((10, 12)).astype(np.float32)
        base = dict(task_id=0, mix_feats=mix, uid=0)
        key = jax.random.PRNGKey(0)
        with pytest.raises(ValueError):
            eng.admit(Request(global_length=99, **base), key)
        with pytest.raises(ValueError):
            eng.admit(Request(semantic_length=99, **base), key)
        with pytest.raises(ValueError):
            eng.admit(Request(temperature=0.0, **base), key)
        with pytest.raises(ValueError):
            eng.admit(Request(top_p=0.0, **base), key)
        with pytest.raises(ValueError):
            eng.admit(Request(top_k=0, **base), key)
        with pytest.raises(ValueError):
            eng.admit(Request(
                task_id=0, uid=0,
                mix_feats=rng.standard_normal((99, 12)).astype(np.float32)),
                key)


class TestInt8FeatureWire:
    """feats_wire="int8": symmetric int8 feature staging with per-frame
    power-of-two exponents packed into the row (engine.py
    _quantize_feats_row/_dequant_feats) — half the staged bytes on links
    that serialize transfers with compute."""

    def test_quantize_dequant_error_bound(self):
        from unified_audio_tpu.serve.engine import (_dequant_feats,
                                                    _quantize_feats_row)

        rng = np.random.default_rng(3)
        x = (rng.standard_normal((20, 12)).astype(np.float32)
             * rng.uniform(1e-3, 1e3, (20, 1)).astype(np.float32))
        wire = _quantize_feats_row(x)
        assert wire.dtype == np.int8 and wire.shape == (20, 13)
        back = np.asarray(_dequant_feats(wire[None], jnp.float32))[0]
        # per-frame: |err| <= 0.5 * 2^e and 2^e <= 2 * maxabs / 127
        bound = np.abs(x).max(axis=-1, keepdims=True) / 126.0
        assert (np.abs(back - x) <= bound + 1e-12).all()
        # zero rows (padding / zero template) must round-trip to exact zero
        z = _quantize_feats_row(np.zeros((4, 12), np.float32))
        assert (np.asarray(_dequant_feats(z[None], jnp.float32)) == 0).all()

    def test_int8_wire_exact_for_pow2_features(self, setup):
        """Features already of the form q * 2^e (q int8) cross the int8
        wire losslessly — greedy tokens must equal the bf16-wire engine's
        exactly, including enroll rows and displacing waves."""
        cfg, sft, params, rng = setup
        feats = []
        for i in range(5):
            q = rng.integers(-127, 128, (10, 12)).astype(np.float32)
            q[0, 0] = 127.0  # pin the frame scale so e is stable
            feats.append((q * 0.25).astype(np.float32))

        def reqs():
            return [Request(task_id=i % 3, mix_feats=feats[i],
                            enroll_feats=feats[(i + 1) % 5] if i % 3 else None,
                            global_length=3, semantic_length=5 + i,
                            do_sample=False, uid=400 + i)
                    for i in range(5)]

        ref = make_engine(sft, params).run(reqs(), jax.random.PRNGKey(0))
        got = make_engine(sft, params, feats_wire="int8").run(
            reqs(), jax.random.PRNGKey(0))
        assert set(ref) == set(got)
        for uid in ref:
            np.testing.assert_array_equal(np.asarray(ref[uid].global_ids),
                                          np.asarray(got[uid].global_ids))
            np.testing.assert_array_equal(np.asarray(ref[uid].semantic_ids),
                                          np.asarray(got[uid].semantic_ids))

    def test_int8_wire_deterministic_and_close(self, setup):
        """Arbitrary features: the int8 wire is lossy but deterministic;
        two identical runs agree token-for-token, and sampling params
        still validate."""
        cfg, sft, params, rng = setup
        feats = [rng.standard_normal((10, 12)).astype(np.float32)
                 for _ in range(4)]

        def reqs():
            return [Request(task_id=i % 3, mix_feats=feats[i],
                            enroll_feats=feats[i] if i % 3 else None,
                            global_length=4, semantic_length=6,
                            do_sample=False, uid=500 + i)
                    for i in range(4)]

        a = make_engine(sft, params, feats_wire="int8").run(
            reqs(), jax.random.PRNGKey(1))
        b = make_engine(sft, params, feats_wire="int8").run(
            reqs(), jax.random.PRNGKey(1))
        for uid in a:
            np.testing.assert_array_equal(np.asarray(a[uid].semantic_ids),
                                          np.asarray(b[uid].semantic_ids))
        with pytest.raises(ValueError):
            make_engine(sft, params, feats_wire="fp4")


class TestSampleLogitsVec:
    def test_matches_scalar_path(self):
        """Per-row sampler == the scalar sampler when every row shares the
        same params and key."""
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((4, 51)).astype(np.float32))
        key = jax.random.PRNGKey(5)
        for temp, k, p in [(0.8, 50, 0.95), (1.0, 5, 0.5), (2.0, 1, 1.0)]:
            want = jax.vmap(
                lambda kk, l: sample_logits(kk, l[None], temperature=temp,
                                            top_k=k, top_p=p)[0]
            )(jnp.stack([key] * 4), logits)
            got = sample_logits_vec(
                jnp.stack([key] * 4), logits,
                jnp.full((4,), temp), jnp.full((4,), k, jnp.int32),
                jnp.full((4,), p), jnp.ones((4,), bool), max_top_k=64,
            )
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_greedy_rows(self):
        rng = np.random.default_rng(2)
        logits = jnp.asarray(rng.standard_normal((3, 20)).astype(np.float32))
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(3)])
        got = sample_logits_vec(
            keys, logits, jnp.full((3,), 0.7),
            jnp.full((3,), 5, jnp.int32), jnp.full((3,), 0.9),
            jnp.zeros((3,), bool),
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.argmax(np.asarray(logits), -1))


class TestPagedKV:
    def test_paged_decode_matches_dense(self, setup):
        """paged_decode_ids over a block pool == the dense static-cache
        decode path, token by token with per-slot positions."""
        from unified_audio_tpu.serve.paged import (
            BlockAllocator, init_pool, paged_decode_ids,
        )

        cfg, sft, params, rng = setup
        lm_params = params["params"]["lm"]
        from unified_audio_tpu.models.lm.llama import CodecLM, init_cache

        lm = CodecLM(cfg)
        n_slots, bs, max_blocks = 3, 4, 4
        ids0 = jnp.asarray(rng.integers(0, cfg.vocab_size, (n_slots,)),
                           jnp.int32)

        # dense reference with per-slot positions
        cache = init_cache(cfg, n_slots, bs * max_blocks)
        cache["index"] = jnp.zeros((n_slots,), jnp.int32)
        dense_logits = []
        ids = ids0
        for i in range(6):
            logits, cache = lm.apply({"params": lm_params}, ids, cache,
                                     method="decode_ids_multi")
            ids = jnp.argmax(logits, -1).astype(jnp.int32)
            dense_logits.append(logits)

        alloc = BlockAllocator(1 + n_slots * max_blocks)
        pool = init_pool(cfg, 1 + n_slots * max_blocks, bs)
        tables = jnp.asarray(
            np.stack([alloc.alloc(max_blocks) for _ in range(n_slots)]),
            jnp.int32)
        index = jnp.zeros((n_slots,), jnp.int32)
        active = jnp.ones((n_slots,), bool)
        ids = ids0
        for i in range(6):
            logits, pool = paged_decode_ids(cfg, lm_params, pool, tables,
                                            index, active, ids, bs)
            ids = jnp.argmax(logits, -1).astype(jnp.int32)
            index = index + 1
            np.testing.assert_allclose(np.asarray(dense_logits[i]),
                                       np.asarray(logits), atol=2e-4)

    def test_inactive_slot_writes_trash_only(self, setup):
        """An inactive slot with a stale table must not corrupt live blocks."""
        from unified_audio_tpu.serve.paged import init_pool, paged_decode_ids

        cfg, sft, params, rng = setup
        lm_params = params["params"]["lm"]
        bs = 4
        pool = init_pool(cfg, 6, bs)
        index = jnp.asarray([0, 0], jnp.int32)
        active = jnp.asarray([True, False])
        ids = jnp.asarray([1, 2], jnp.int32)
        # (a) inactive slot 1 holds a STALE table pointing at slot 0's block 3
        _, pool_a = paged_decode_ids(
            cfg, lm_params, pool, jnp.asarray([[3, 4], [3, 5]], jnp.int32),
            index, active, ids, bs)
        # (b) inactive slot 1 points at trash
        _, pool_b = paged_decode_ids(
            cfg, lm_params, pool, jnp.asarray([[3, 4], [0, 0]], jnp.int32),
            index, active, ids, bs)
        # all live blocks identical regardless of the stale table
        np.testing.assert_array_equal(np.asarray(pool_a["k"][:, 1:]),
                                      np.asarray(pool_b["k"][:, 1:]))
        np.testing.assert_array_equal(np.asarray(pool_a["v"][:, 1:]),
                                      np.asarray(pool_b["v"][:, 1:]))

    def test_allocator(self):
        from unified_audio_tpu.serve.paged import BlockAllocator

        a = BlockAllocator(5)  # block 0 reserved
        b1 = a.alloc(3)
        assert 0 not in b1
        assert len(b1) == 3 and len(a.free) == 1
        a.release(b1[:2])
        assert len(a.free) == 3
        with pytest.raises(RuntimeError):
            a.alloc(5)


class TestBoundedPoolRead:
    """paged_decode with num_active_blocks (the O(allocated)-read bound) is
    numerically identical to the full-pool read whenever the bound covers
    every allocated block."""

    def test_bounded_equals_full(self, rng):
        import jax
        import jax.numpy as jnp

        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.paged import (
            TRASH_BLOCK, init_pool, paged_decode_ids, scatter_prefill)

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, feats_dim=8)
        mix0 = jnp.zeros((1, 4, 8), jnp.float32)
        variables = sft.init(
            jax.random.PRNGKey(0), 0, None, mix0,
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32))
        lm_params = variables["params"]["lm"]

        bs, nb_total, s_slots, mb = 8, 40, 2, 3
        pool = init_pool(cfg, nb_total, bs)
        # slots own low blocks 1..6 (low-first allocator invariant)
        tables = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
        prompt = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (s_slots, 10, cfg.hidden_size)).astype(np.float32))
        from unified_audio_tpu.models.lm.llama import init_cache

        cache = init_cache(cfg, s_slots, 10)
        _, cache = sft.apply(variables, prompt, cache,
                             method=lambda m, p, c: m.lm.prefill(p, c))
        pool = scatter_prefill(pool, tables, cache["k"], cache["v"], bs)

        index = jnp.asarray([10, 10], jnp.int32)
        active = jnp.asarray([True, True])
        ids = jnp.asarray([3, 4], jnp.int32)
        full, pool_f = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                        active, ids, bs)
        bounded, pool_b = paged_decode_ids(cfg, lm_params, pool, tables,
                                           index, active, ids, bs,
                                           num_active_blocks=8)
        np.testing.assert_allclose(np.asarray(full), np.asarray(bounded),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(pool_f["k"]),
                                      np.asarray(pool_b["k"]))

    def test_allocator_low_first_high_water(self):
        from unified_audio_tpu.serve.paged import BlockAllocator

        a = BlockAllocator(64)
        b1 = a.alloc(8)
        assert b1 == list(range(1, 9))
        b2 = a.alloc(4)
        assert a.high_water() == 13
        a.release(b1)
        assert a.high_water() == 13  # b2 still holds 9..12
        b3 = a.alloc(6)
        assert max(b3) <= 8  # reuses the freed low blocks first
        a.release(b2)
        a.release(b3)
        assert a.high_water() == 1


class TestUnifiedWaves:
    def test_se_and_tse_share_one_wave(self, setup):
        """With unify_waves (default), an enroll-less request and an
        enroll-ful request admit in ONE prefill program (se rows ride the
        with-enroll program, zero enroll compacted out at n_head=1) and
        both still match their solo raw generates exactly."""
        cfg, sft, params, rng = setup
        mix_a = rng.standard_normal((10, 12)).astype(np.float32)
        mix_b = rng.standard_normal((9, 12)).astype(np.float32)
        enroll_b = rng.standard_normal((6, 12)).astype(np.float32)

        ref_a = sft.apply(
            params, 0, None, jnp.asarray(mix_a)[None], jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False)
        ref_b = sft.apply(
            params, 1, jnp.asarray(enroll_b)[None], jnp.asarray(mix_b)[None],
            jax.random.PRNGKey(9), method="generate", global_length=3,
            semantic_length=8, do_sample=False)

        # single enroll bucket so the enroll-less request lands in the same
        # (mix, enroll) signature group as the enroll-ful one
        eng = make_engine(sft, params, enroll_buckets=(10,))
        assert eng.unify_waves
        reqs = [
            Request(task_id=0, mix_feats=mix_a, global_length=4,
                    semantic_length=6, do_sample=False, uid=1),
            Request(task_id=1, mix_feats=mix_b, enroll_feats=enroll_b,
                    global_length=3, semantic_length=8, do_sample=False,
                    uid=2),
        ]
        # same signature group => one wave, one prefill program
        assert eng._signature(reqs[0]) == eng._signature(reqs[1])
        results = eng.run(reqs, jax.random.PRNGKey(0))
        assert eng.stats()["prefill_waves"] == 1
        np.testing.assert_array_equal(results[1].global_ids,
                                      np.asarray(ref_a[0][0]))
        np.testing.assert_array_equal(results[1].semantic_ids,
                                      np.asarray(ref_a[1][0]))
        np.testing.assert_array_equal(results[2].global_ids,
                                      np.asarray(ref_b[0][0]))
        np.testing.assert_array_equal(results[2].semantic_ids,
                                      np.asarray(ref_b[1][0]))


def _toy_frontend(fparams, wav):
    """Deterministic toy SSL frontend: frame at hop 4, project to 12 dims.
    (B, N) -> (B, N//4, 12). Stands in for wavlm_feats_pure (same calling
    convention: params as explicit argument, traceable under jit)."""
    b, n = wav.shape
    frames = wav.reshape(b, n // 4, 4)
    return jnp.einsum("btk,kd->btd", frames, fparams["proj"])


@pytest.fixture(scope="module")
def frontend_params():
    rng = np.random.default_rng(7)
    return {"proj": jnp.asarray(
        rng.standard_normal((4, 12)).astype(np.float32))}


class TestWaveformAdmission:
    """Waveform admission: the SSL frontend runs on device inside the
    prefill program; raw samples (int16/fp16 wire) cross the host->device
    link instead of feature frames (~2.5x fewer bytes, measured link
    bandwidth ~70 MB/s — benchmarks/probe_staging.py)."""

    def _engine(self, sft, params, fparams, **kw):
        kw.setdefault("wav_buckets", (40, 64))
        kw.setdefault("enroll_wav_buckets", (40,))
        return make_engine(sft, params, feature_fn=_toy_frontend,
                           feature_params=fparams, **kw)

    def test_frames_for_matches_frontend(self, setup, frontend_params):
        cfg, sft, params, rng = setup
        eng = self._engine(sft, params, frontend_params)
        assert eng._frames_for(40) == 10
        assert eng._frames_for(64) == 16
        # frame buckets derived from wav buckets joined the mix buckets
        assert set((10, 16)) <= set(eng.mix_buckets)

    def test_wav_greedy_matches_generate(self, setup, frontend_params):
        """fp32 wire: engine(wav) == sft.generate(frontend(wav)) exactly."""
        cfg, sft, params, rng = setup
        wav = rng.standard_normal(40).astype(np.float32) * 0.5
        feats = _toy_frontend(frontend_params, jnp.asarray(wav)[None])
        ref_g, ref_s = sft.apply(
            params, 0, None, feats, jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False)

        eng = self._engine(sft, params, frontend_params,
                           wav_wire="float32")
        req = Request(task_id=0, mix_wav=wav, global_length=4,
                      semantic_length=6, do_sample=False, uid=1)
        results = eng.run([req], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[1].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[1].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_wav_int16_wire_matches_quantized_reference(
            self, setup, frontend_params):
        """int16 wire: engine(wav) == generate over features of the SAME
        int16-quantized waveform (the wire transform is the only
        difference, and it is exact for 16-bit PCM sources)."""
        cfg, sft, params, rng = setup
        wav = (rng.integers(-2**15, 2**15, size=40)
               .astype(np.float32) / 32768.0)  # exact 16-bit PCM
        feats = _toy_frontend(frontend_params, jnp.asarray(wav)[None])
        ref_g, ref_s = sft.apply(
            params, 1, None, feats, jax.random.PRNGKey(9),
            method="generate", global_length=4, semantic_length=6,
            do_sample=False)

        eng = self._engine(sft, params, frontend_params)  # int16 default
        req = Request(task_id=1, mix_wav=wav, global_length=4,
                      semantic_length=6, do_sample=False, uid=5)
        results = eng.run([req], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[5].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[5].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_wav_with_enroll_and_padded_bucket(self, setup, frontend_params):
        """tse waveform request with a mix shorter than its sample bucket:
        compaction + padding semantics carry over from the feats path."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal(56).astype(np.float32) * 0.5  # bucket 64
        enr = rng.standard_normal(36).astype(np.float32) * 0.5  # bucket 40
        mf = _toy_frontend(frontend_params, jnp.asarray(mix)[None])
        ef = _toy_frontend(frontend_params, jnp.asarray(enr)[None])
        ref_g, ref_s = sft.apply(
            params, 1, ef, mf, jax.random.PRNGKey(9), method="generate",
            global_length=3, semantic_length=7, do_sample=False)

        eng = self._engine(sft, params, frontend_params,
                           wav_wire="float32")
        req = Request(task_id=1, mix_wav=mix, enroll_wav=enr,
                      global_length=3, semantic_length=7, do_sample=False,
                      uid=2)
        results = eng.run([req], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[2].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[2].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_hybrid_wav_mix_feats_enroll(self, setup, frontend_params):
        """Hybrid request: mix as waveform (cheap wire), enroll as
        EXACT-LENGTH precomputed features — the serve-CLI shape for
        frontends with global attention, where bucket-padding the enroll
        audio would change its features."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal(64).astype(np.float32) * 0.5
        ef = rng.standard_normal((6, 12)).astype(np.float32)
        mf = _toy_frontend(frontend_params, jnp.asarray(mix)[None])
        ref_g, ref_s = sft.apply(
            params, 1, jnp.asarray(ef)[None], mf, jax.random.PRNGKey(9),
            method="generate", global_length=3, semantic_length=7,
            do_sample=False)

        eng = self._engine(sft, params, frontend_params,
                           wav_wire="float32", enroll_buckets=(6, 10))
        req = Request(task_id=1, mix_wav=mix, enroll_feats=ef,
                      global_length=3, semantic_length=7, do_sample=False,
                      uid=3)
        assert eng._signature(req)[0] == "w"
        assert eng._signature(req)[2] == "f"
        results = eng.run([req], jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[3].global_ids,
                                      np.asarray(ref_g[0]))
        np.testing.assert_array_equal(results[3].semantic_ids,
                                      np.asarray(ref_s[0]))

    def test_mixed_wav_and_feats_requests_one_pool(self, setup,
                                                   frontend_params):
        """A waveform request and a precomputed-features request decode
        side by side in one pool; each matches its solo generate."""
        cfg, sft, params, rng = setup
        wav = rng.standard_normal(40).astype(np.float32) * 0.5
        mixf = rng.standard_normal((10, 12)).astype(np.float32)
        wf = _toy_frontend(frontend_params, jnp.asarray(wav)[None])
        ref_w = sft.apply(params, 0, None, wf, jax.random.PRNGKey(9),
                          method="generate", global_length=4,
                          semantic_length=6, do_sample=False)
        ref_f = sft.apply(params, 2, None, jnp.asarray(mixf)[None],
                          jax.random.PRNGKey(9), method="generate",
                          global_length=4, semantic_length=6,
                          do_sample=False)

        eng = self._engine(sft, params, frontend_params,
                           wav_wire="float32")
        reqs = [Request(task_id=0, mix_wav=wav, global_length=4,
                        semantic_length=6, do_sample=False, uid=1),
                Request(task_id=2, mix_feats=mixf, global_length=4,
                        semantic_length=6, do_sample=False, uid=2)]
        results = eng.run(reqs, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(results[1].global_ids,
                                      np.asarray(ref_w[0][0]))
        np.testing.assert_array_equal(results[1].semantic_ids,
                                      np.asarray(ref_w[1][0]))
        np.testing.assert_array_equal(results[2].global_ids,
                                      np.asarray(ref_f[0][0]))
        np.testing.assert_array_equal(results[2].semantic_ids,
                                      np.asarray(ref_f[1][0]))

    def test_fused_frontend_matches_split(self, setup, frontend_params):
        """fuse_frontend=True (frontend traced into the prefill program)
        and the default split mode (separate jitted frontend program)
        produce bit-identical tokens — same math, different program
        boundaries (split exists because the fused HLO compiled >40 min
        on the remote-compile deployment)."""
        cfg, sft, params, rng = setup
        mix = rng.standard_normal(56).astype(np.float32) * 0.5
        enr = rng.standard_normal(36).astype(np.float32) * 0.5
        reqs = lambda: [  # noqa: E731 - fresh Request objects per engine
            Request(task_id=1, mix_wav=mix, enroll_wav=enr,
                    global_length=3, semantic_length=7, do_sample=False,
                    uid=2),
            Request(task_id=0, mix_wav=mix[:40], global_length=4,
                    semantic_length=6, do_sample=False, uid=3)]
        outs = []
        for fused in (False, True):
            eng = self._engine(sft, params, frontend_params,
                               wav_wire="float32", fuse_frontend=fused)
            assert eng.fuse_frontend is fused
            outs.append(eng.run(reqs(), jax.random.PRNGKey(0)))
        for uid in (2, 3):
            np.testing.assert_array_equal(outs[0][uid].global_ids,
                                          outs[1][uid].global_ids)
            np.testing.assert_array_equal(outs[0][uid].semantic_ids,
                                          outs[1][uid].semantic_ids)

    def test_wav_validation(self, setup, frontend_params):
        cfg, sft, params, rng = setup
        plain = make_engine(sft, params)  # no feature_fn
        wav = np.zeros(40, np.float32)
        short = dict(global_length=4, semantic_length=6, uid=1)
        with pytest.raises(ValueError, match="feature_fn"):
            plain.validate(Request(task_id=0, mix_wav=wav, **short))
        eng = self._engine(sft, params, frontend_params)
        with pytest.raises(ValueError, match="exactly one"):
            eng.validate(Request(task_id=0, mix_wav=wav,
                                 mix_feats=np.zeros((10, 12), np.float32),
                                 **short))
        with pytest.raises(ValueError, match="exactly one"):
            eng.validate(Request(task_id=0, **short))
        with pytest.raises(ValueError, match="both enroll"):
            eng.validate(Request(
                task_id=0, mix_wav=wav,
                enroll_wav=np.zeros(36, np.float32),
                enroll_feats=np.zeros((6, 12), np.float32), **short))
        with pytest.raises(ValueError):  # over the largest wav bucket
            eng.validate(Request(task_id=0,
                                 mix_wav=np.zeros(100, np.float32),
                                 **short))


class TestInt8KVPool:
    """kv_quant="int8" end-to-end: the engine serves from an int8 block
    pool; the Pallas q8 stream kernel and the XLA dequant path produce
    token-identical results (same quantized pool, same fp32 dequant)."""

    def test_int8_engine_kernel_equals_xla(self, setup):
        cfg, sft, params, rng = setup

        def run(use_kernel):
            eng = make_engine(sft, params, kv_quant="int8",
                              use_flash_kernel=use_kernel)
            assert "k_scale" in eng.pool
            reqs = [
                Request(task_id=i % 3,
                        mix_feats=np.random.default_rng(i).standard_normal(
                            (10, 12)).astype(np.float32),
                        enroll_feats=(
                            np.random.default_rng(100 + i).standard_normal(
                                (10, 12)).astype(np.float32)
                            if i % 3 else None),
                        global_length=4, semantic_length=6,
                        do_sample=False, uid=i)
                for i in range(5)
            ]
            return eng.run(reqs, jax.random.PRNGKey(0))

        a, b = run(False), run(True)
        assert set(a) == set(b) == set(range(5))
        for u in a:
            np.testing.assert_array_equal(a[u].global_ids, b[u].global_ids)
            np.testing.assert_array_equal(a[u].semantic_ids,
                                          b[u].semantic_ids)

    def test_shared_pool_quant_mismatch_rejected(self, setup):
        cfg, sft, params, rng = setup
        base = make_engine(sft, params)  # bf16/fp pool
        with pytest.raises(ValueError, match="conflicts"):
            make_engine(sft, params, pool_ref=base._pool_ref,
                        allocator=base.allocator, kv_quant="int8")
        # kv_quant=None means "infer from the shared pool"
        eng = make_engine(sft, params, kv_quant="int8")
        eng2 = make_engine(sft, params, pool_ref=eng._pool_ref,
                           allocator=eng.allocator)
        assert eng2.kv_quant == "int8"


class TestRegionAllocator:
    def test_contiguous_aligned_low_first(self):
        from unified_audio_tpu.serve.paged import RegionAllocator

        a = RegionAllocator(64, 8)
        b0 = a.alloc(5)
        b1 = a.alloc(8)
        assert b0 == list(range(8, 13))      # region 1 (region 0 reserved)
        assert b1 == list(range(16, 24))
        assert a.high_water() == 3 * 8
        a.release(b0)
        assert a.alloc(3) == [8, 9, 10]      # low-first region reuse
        assert a.block_cost(1) == 8 == a.block_cost(8)

    def test_exhaustion_and_validation(self):
        from unified_audio_tpu.serve.paged import RegionAllocator

        a = RegionAllocator(24, 8)           # regions 1, 2 usable
        with pytest.raises(ValueError, match="exceeds the region"):
            a.alloc(9)
        a.alloc(8)
        a.alloc(4)
        assert len(a.free) == 0
        with pytest.raises(RuntimeError, match="exhausted"):
            a.alloc(1)
        with pytest.raises(ValueError, match="unallocated"):
            a.release([1])
        with pytest.raises(ValueError):
            RegionAllocator(8, 8)            # only the reserved region fits


class TestOwnerKernelEngine:
    """Owner-mode serving (RegionAllocator + ownership-aware kernel): runs
    must be token-identical to the XLA-attention engine, including slot
    displacement / region recycling."""

    def _run(self, sft, params, use_kernel, n_req=5):
        eng = make_engine(sft, params, use_flash_kernel=use_kernel)
        reqs = [
            Request(task_id=i % 3,
                    mix_feats=np.random.default_rng(i).standard_normal(
                        (10, 12)).astype(np.float32),
                    enroll_feats=(
                        np.random.default_rng(100 + i).standard_normal(
                            (10, 12)).astype(np.float32) if i % 3 else None),
                    global_length=4, semantic_length=6,
                    do_sample=False, uid=i)
            for i in range(n_req)
        ]
        return eng, eng.run(reqs, jax.random.PRNGKey(0))

    def test_owner_engine_equals_xla(self, setup):
        from unified_audio_tpu.serve.paged import RegionAllocator

        cfg, sft, params, rng = setup
        eng_o, a = self._run(sft, params, "owner")
        assert isinstance(eng_o.allocator, RegionAllocator)
        # one program per step count: the bound is constant in owner mode
        assert eng_o._block_bound() == eng_o.num_blocks
        _, b = self._run(sft, params, False)
        assert set(a) == set(b) == set(range(5))
        for u in a:
            np.testing.assert_array_equal(a[u].global_ids, b[u].global_ids)
            np.testing.assert_array_equal(a[u].semantic_ids,
                                          b[u].semantic_ids)

    def test_owner_requires_region_allocator(self, setup):
        from unified_audio_tpu.serve.paged import BlockAllocator

        cfg, sft, params, rng = setup
        with pytest.raises(ValueError, match="RegionAllocator"):
            make_engine(sft, params, use_flash_kernel="owner",
                        num_blocks=64, allocator=BlockAllocator(64))

    def test_owner_region_size_validated(self, setup):
        from unified_audio_tpu.serve.paged import RegionAllocator

        cfg, sft, params, rng = setup
        with pytest.raises(ValueError, match="multiple of owner_chunk"):
            make_engine(sft, params, use_flash_kernel="owner",
                        num_blocks=64, allocator=RegionAllocator(64, 9),
                        owner_chunk_blocks=8)

    def test_owner_sampled_run_displaces_regions(self, setup):
        """Sampled traffic through owner mode exercises region recycling
        with displacing admissions; the same seeds through the XLA engine
        must reproduce every token (sampling consumes identical logits)."""
        cfg, sft, params, rng = setup

        def run(uk):
            eng = make_engine(sft, params, use_flash_kernel=uk)
            reqs = [
                Request(task_id=0,
                        mix_feats=np.random.default_rng(i).standard_normal(
                            (10, 12)).astype(np.float32),
                        global_length=3, semantic_length=5,
                        do_sample=True, temperature=0.9, top_k=8,
                        uid=i)
                for i in range(6)
            ]
            return eng.run(reqs, jax.random.PRNGKey(7))

        a, b = run("owner"), run(False)
        assert set(a) == set(b)
        for u in a:
            np.testing.assert_array_equal(a[u].global_ids, b[u].global_ids)
            np.testing.assert_array_equal(a[u].semantic_ids,
                                          b[u].semantic_ids)

    def test_owner_int8_pool_engine_equals_xla(self, setup):
        """int8 KV pool served through the owner kernel == the XLA int8
        dequant engine, token-identical (the DMA-bound owner formulation
        makes int8 a SPEED lever, not just capacity)."""
        cfg, sft, params, rng = setup

        def run(uk):
            eng = make_engine(sft, params, kv_quant="int8",
                              use_flash_kernel=uk)
            assert "k_scale" in eng.pool
            reqs = [
                Request(task_id=i % 3,
                        mix_feats=np.random.default_rng(i).standard_normal(
                            (10, 12)).astype(np.float32),
                        enroll_feats=(
                            np.random.default_rng(100 + i).standard_normal(
                                (10, 12)).astype(np.float32) if i % 3
                            else None),
                        global_length=4, semantic_length=6,
                        do_sample=False, uid=i)
                for i in range(5)
            ]
            return eng.run(reqs, jax.random.PRNGKey(0))

        a, b = run("owner"), run(False)
        assert set(a) == set(b) == set(range(5))
        for u in a:
            np.testing.assert_array_equal(a[u].global_ids, b[u].global_ids)
            np.testing.assert_array_equal(a[u].semantic_ids,
                                          b[u].semantic_ids)
