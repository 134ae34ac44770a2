"""UniTok continuous-batching engine: paged delay-pattern decode, and mixed
UniSE + UniTok serving from ONE shared block pool."""
import numpy as np
import pytest
# whole-file slow tier: 150s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.models.unitok.model import UniTokConfig, UniTokLM
from unified_audio_tpu.serve.unitok_engine import UniTokEngine, UniTokRequest


def tiny_cfg():
    return UniTokConfig(
        codebook_size=17, num_quantizers=2, num_streams=2, hidden_size=32,
        num_layers=2, num_heads=4, text_dim=8, audio_dim=8,
        max_positions=512,
    )


@pytest.fixture(scope="module")
def lm_setup():
    cfg = tiny_cfg()
    lm = UniTokLM(cfg)
    cap = jnp.zeros((1, 3, cfg.text_dim), jnp.float32)
    feats = jnp.zeros((1, 4, cfg.audio_dim), jnp.float32)
    params = lm.init(jax.random.PRNGKey(0), 0, cap, feats, feats,
                     jnp.zeros((1, 6, cfg.num_codebooks), jnp.int32))
    return cfg, lm, params


def _engine(cfg, lm, params, **kw):
    base = dict(num_slots=4, block_size=16, max_frames=32,
                feat_buckets=(8, 16))
    base.update(kw)
    return UniTokEngine(lm, params, **base)


class TestUniTokEngine:
    def test_greedy_matches_solo(self, lm_setup, rng):
        cfg, lm, params = lm_setup
        feats = rng.standard_normal((5, cfg.audio_dim)).astype(np.float32)
        nf = 7
        solo = np.asarray(lm.apply(
            params, 3, None, None, jnp.asarray(feats[None]), nf,
            jax.random.PRNGKey(1), do_sample=False, method="generate"))[0]
        eng = _engine(cfg, lm, params)
        req = UniTokRequest(task_id=3, num_frames=nf, input_feats=feats,
                            do_sample=False, uid=11)
        res = eng.run([req], jax.random.PRNGKey(2))
        np.testing.assert_array_equal(res[11].codes, solo)

    def test_mixed_tasks_and_lengths(self, lm_setup, rng):
        cfg, lm, params = lm_setup
        reqs, solos = [], {}
        for uid, (task, nf, tl) in enumerate(
                [(0, 5, 4), (3, 9, 6), (5, 7, 3), (1, 9, 8)]):
            feats = rng.standard_normal((tl, cfg.audio_dim)).astype(
                np.float32)
            reqs.append(UniTokRequest(task_id=task, num_frames=nf,
                                      input_feats=feats, do_sample=False,
                                      uid=uid))
            solos[uid] = np.asarray(lm.apply(
                params, task, None, None, jnp.asarray(feats[None]), nf,
                jax.random.PRNGKey(1), do_sample=False,
                method="generate"))[0]
        eng = _engine(cfg, lm, params)
        res = eng.run(reqs, jax.random.PRNGKey(2))
        assert set(res) == set(solos)
        for uid in solos:
            np.testing.assert_array_equal(res[uid].codes, solos[uid])

    def test_caption_and_ref_segments(self, lm_setup, rng):
        """Prompt compaction with all three optional segments present."""
        cfg, lm, params = lm_setup
        cap = rng.standard_normal((3, cfg.text_dim)).astype(np.float32)
        ref = rng.standard_normal((6, cfg.audio_dim)).astype(np.float32)
        inp = rng.standard_normal((5, cfg.audio_dim)).astype(np.float32)
        nf = 6
        solo = np.asarray(lm.apply(
            params, 4, jnp.asarray(cap[None]), jnp.asarray(ref[None]),
            jnp.asarray(inp[None]), nf, jax.random.PRNGKey(1),
            do_sample=False, method="generate"))[0]
        eng = _engine(cfg, lm, params)
        req = UniTokRequest(task_id=4, num_frames=nf, caption_feats=cap,
                            ref_feats=ref, input_feats=inp,
                            do_sample=False, uid=7)
        res = eng.run([req], jax.random.PRNGKey(2))
        np.testing.assert_array_equal(res[7].codes, solo)

    def test_more_requests_than_slots(self, lm_setup, rng):
        cfg, lm, params = lm_setup
        reqs, solos = [], {}
        for uid in range(7):  # 7 requests, 4 slots
            feats = rng.standard_normal((4, cfg.audio_dim)).astype(
                np.float32)
            nf = 4 + uid % 3
            reqs.append(UniTokRequest(task_id=uid % 6, num_frames=nf,
                                      input_feats=feats, do_sample=False,
                                      uid=uid))
            solos[uid] = np.asarray(lm.apply(
                params, uid % 6, None, None, jnp.asarray(feats[None]), nf,
                jax.random.PRNGKey(1), do_sample=False,
                method="generate"))[0]
        eng = _engine(cfg, lm, params)
        res = eng.run(reqs, jax.random.PRNGKey(2))
        assert set(res) == set(solos)
        for uid in solos:
            np.testing.assert_array_equal(res[uid].codes, solos[uid])

    def test_validation_rejects_bad_requests(self, lm_setup, rng):
        cfg, lm, params = lm_setup
        eng = _engine(cfg, lm, params)
        feats = rng.standard_normal((4, cfg.audio_dim)).astype(np.float32)

        def req(**kw):
            base = dict(task_id=0, num_frames=4, input_feats=feats, uid=1)
            base.update(kw)
            return UniTokRequest(**base)

        for bad in (req(temperature=0.0), req(top_p=0.0), req(top_p=1.5),
                    req(top_k=0), req(num_frames=0), req(num_frames=999),
                    req(input_feats=rng.standard_normal(
                        (99, cfg.audio_dim)).astype(np.float32))):
            with pytest.raises(ValueError):
                eng.admit_wave([bad], jax.random.PRNGKey(0))

    def test_failed_admission_mutates_nothing(self, lm_setup, rng):
        """A raise from admit_wave (e.g. an over-long segment later in the
        wave) must leave NO slot occupied and NO block allocated — a
        half-admitted wave would strand a ghost slot that later harvests a
        bogus result."""
        cfg, lm, params = lm_setup
        eng = _engine(cfg, lm, params)
        ok = UniTokRequest(
            task_id=0, num_frames=4, uid=1,
            input_feats=rng.standard_normal(
                (4, cfg.audio_dim)).astype(np.float32))
        oversize = UniTokRequest(
            task_id=0, num_frames=4, uid=2,
            input_feats=rng.standard_normal(
                (99, cfg.audio_dim)).astype(np.float32))
        free_before = len(eng.allocator.free)
        with pytest.raises(ValueError):
            eng.admit_wave([ok, oversize], jax.random.PRNGKey(0))
        assert eng._uids == [None] * eng.num_slots
        assert len(eng.allocator.free) == free_before

    def test_wave_shape_is_fixed(self, lm_setup, rng):
        """Same-signature waves of different sizes must reuse ONE compiled
        prefill program (variable wave shapes = a multi-second remote
        recompile per wave on the real chip)."""
        cfg, lm, params = lm_setup
        eng = _engine(cfg, lm, params)

        def mk(uid):
            return UniTokRequest(
                task_id=0, num_frames=3, uid=uid,
                input_feats=rng.standard_normal(
                    (4, cfg.audio_dim)).astype(np.float32))

        eng.admit_wave([mk(1)], jax.random.PRNGKey(0))          # wave of 1
        n_after_first = eng._prefill_insert._cache_size()
        eng.admit_wave([mk(2), mk(3)], jax.random.PRNGKey(0))   # wave of 2
        assert eng._prefill_insert._cache_size() == n_after_first


    def test_displacing_deferred_drain(self, lm_setup, rng):
        """The round-4 scheduler: 9 requests through 4 slots displace
        finished slots without device syncs; deferred mode drains every
        stash in (at most) ONE batched fetch, eager mode matches it
        token-for-token."""
        cfg, lm, params = lm_setup
        feats = [rng.standard_normal((4, cfg.audio_dim)).astype(np.float32)
                 for _ in range(9)]

        def reqs():
            return [UniTokRequest(task_id=i % 6, num_frames=4 + i % 3,
                                  input_feats=feats[i], do_sample=False,
                                  uid=700 + i)
                    for i in range(9)]

        deferred_eng = _engine(cfg, lm, params)
        deferred = deferred_eng.run(reqs(), jax.random.PRNGKey(3))
        assert deferred_eng.stats()["stash_fetches"] <= 1
        assert deferred_eng.stats()["prefill_waves"] >= 2
        eager = _engine(cfg, lm, params, eager_drain=True).run(
            reqs(), jax.random.PRNGKey(3))
        assert set(deferred) == set(eager) == {700 + i for i in range(9)}
        for uid in deferred:
            np.testing.assert_array_equal(deferred[uid].codes,
                                          eager[uid].codes)


class TestSharedPool:
    def test_mixed_unise_unitok_one_pool(self, rng):
        """A UniSE engine and a UniTok engine serve interleaved from ONE
        physical block pool + allocator; both outputs equal their solo
        generates (the paged "multitask heads share one batched token
        pipeline" claim at serving time)."""
        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.engine import (
            ContinuousBatchingEngine, Request)
        from unified_audio_tpu.serve.paged import (
            BlockAllocator, PoolRef, init_pool)

        # identical backbone geometry -> pool-compatible KV blocks
        ucfg = tiny_cfg()
        lcfg = LlamaConfig(
            global_size=32, semantic_size=64, hidden_size=32, num_layers=2,
            num_heads=4, max_position_embeddings=512)
        sft = LLMSFT(lcfg, feats_dim=8)
        mix0 = jnp.zeros((1, 4, 8), jnp.float32)
        sft_params = sft.init(
            jax.random.PRNGKey(0), 0, None, mix0,
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32))
        utok = UniTokLM(ucfg)
        utok_params = utok.init(
            jax.random.PRNGKey(1), 0, None, None,
            jnp.zeros((1, 4, ucfg.audio_dim), jnp.float32),
            jnp.zeros((1, 6, ucfg.num_codebooks), jnp.int32))

        bs = 16
        num_blocks = 1 + 40
        pool_ref = PoolRef(init_pool(lcfg, num_blocks, bs))
        alloc = BlockAllocator(num_blocks)

        eng_u = ContinuousBatchingEngine(
            sft, sft_params, num_slots=2, block_size=bs,
            max_global=4, max_semantic=16, mix_buckets=(8,),
            pool_ref=pool_ref, allocator=alloc)
        eng_t = UniTokEngine(
            utok, utok_params, num_slots=2, block_size=bs, max_frames=16,
            feat_buckets=(8,), pool_ref=pool_ref, allocator=alloc)

        mixf = rng.standard_normal((5, 8)).astype(np.float32)
        solo_u = sft.apply(
            sft_params, 0, None, jnp.asarray(mixf[None]),
            jax.random.PRNGKey(3), global_length=4, semantic_length=6,
            do_sample=False, method="generate")
        solo_ug = np.asarray(solo_u[0])[0]
        solo_us = np.asarray(solo_u[1])[0]

        tokf = rng.standard_normal((4, ucfg.audio_dim)).astype(np.float32)
        nf = 6
        solo_t = np.asarray(utok.apply(
            utok_params, 2, None, None, jnp.asarray(tokf[None]), nf,
            jax.random.PRNGKey(4), do_sample=False, method="generate"))[0]

        # admit both, then interleave decode dispatches on the shared pool
        req_u = Request(task_id=0, mix_feats=mixf, global_length=4,
                        semantic_length=6, do_sample=False, uid=100)
        req_t = UniTokRequest(task_id=2, num_frames=nf, input_feats=tokf,
                              do_sample=False, uid=200)
        eng_u.admit_many([req_u], jax.random.PRNGKey(5))
        eng_t.admit_wave([req_t], jax.random.PRNGKey(6))
        assert len(set(b for bl in eng_u._slot_blocks for b in bl)
                   & set(b for bl in eng_t._slot_blocks for b in bl)) == 0

        for _ in range(20):
            eng_u.step(n=1)
            eng_t.step(n=1)

        res_u = {r.uid: r for r in eng_u.harvest()}
        res_t = {r.uid: r for r in eng_t.harvest()}
        np.testing.assert_array_equal(res_u[100].global_ids, solo_ug)
        np.testing.assert_array_equal(res_u[100].semantic_ids, solo_us)
        np.testing.assert_array_equal(res_t[200].codes, solo_t)


class TestUniTokInt8Pool:
    def test_int8_kernel_equals_xla(self, lm_setup, rng):
        """UniTok serving from an int8 KV pool: the q8 stream kernel and the
        XLA dequant path produce code-identical results."""
        cfg, lm, params = lm_setup
        feats = rng.standard_normal((5, cfg.audio_dim)).astype(np.float32)

        def run(use_kernel):
            eng = _engine(cfg, lm, params, kv_quant="int8",
                          use_flash_kernel=use_kernel)
            assert eng.kv_quant == "int8" and "k_scale" in eng.pool
            reqs = [UniTokRequest(task_id=i % 7, num_frames=5 + i,
                                  input_feats=feats, do_sample=False, uid=i)
                    for i in range(3)]
            return eng.run(reqs, jax.random.PRNGKey(2))

        a, b = run(False), run(True)
        for u in a:
            np.testing.assert_array_equal(a[u].codes, b[u].codes)


class TestUniTokOwnerKernel:
    def test_owner_equals_xla(self, lm_setup, rng):
        """UniTok serving through the ownership-aware kernel (Region-
        Allocator contiguous ranges) == the XLA paged path, mixed lengths
        with slot displacement."""
        from unified_audio_tpu.serve.paged import RegionAllocator

        cfg, lm, params = lm_setup

        def run(use_kernel):
            eng = _engine(cfg, lm, params, num_slots=2,
                          use_flash_kernel=use_kernel)
            if use_kernel == "owner":
                assert isinstance(eng.allocator, RegionAllocator)
            reqs = [UniTokRequest(task_id=i % 7, num_frames=4 + i,
                                  input_feats=rng.standard_normal(
                                      (5, cfg.audio_dim)).astype(np.float32),
                                  do_sample=False, uid=i)
                    for i in range(4)]
            return eng.run(reqs, jax.random.PRNGKey(2))

        rng = np.random.default_rng(3)
        a = run("owner")
        rng = np.random.default_rng(3)
        b = run(False)
        assert set(a) == set(b)
        for u in a:
            np.testing.assert_array_equal(a[u].codes, b[u].codes)


class TestUniTokOvershoot:
    def test_overshoot_token_exact_with_fewer_dispatches(self, lm_setup):
        """run() with the default dispatch overshoot == the exact popcount
        decomposition, code for code, across displacing waves of
        popcount-heavy lengths — while dispatching strictly fewer step
        programs. Sampled decode included: rng chains split once per
        device step for every occupied row regardless of activity, so a
        slot's sampling chain position stays equal to its token index
        through overshot (fully masked) steps."""
        cfg, lm, params = lm_setup
        rng = np.random.default_rng(5)
        # nf + K - 1 = 13-step segments: exact [8,4,1] vs rounded [8,8]
        lengths = [10, 14, 10, 12, 10, 14]
        feats = [rng.standard_normal((5, cfg.audio_dim)).astype(np.float32)
                 for _ in lengths]

        def reqs():
            return [UniTokRequest(task_id=i % 7, num_frames=nf,
                                  input_feats=feats[i],
                                  do_sample=bool(i % 2), uid=900 + i)
                    for i, nf in enumerate(lengths)]

        exact = _engine(cfg, lm, params, num_slots=2, dispatch_overshoot=0.0)
        a = exact.run(reqs(), jax.random.PRNGKey(4), poll_interval=8)
        # 0.3 (not the 0.05 default) so the tiny test segments (8-14
        # steps) get a non-zero round-up budget; at production sizes
        # (133-step segments) the default 5% already buys the round-up
        over = _engine(cfg, lm, params, num_slots=2, dispatch_overshoot=0.3)
        b = over.run(reqs(), jax.random.PRNGKey(4), poll_interval=8)

        assert set(a) == set(b)
        for u in a:
            np.testing.assert_array_equal(a[u].codes, b[u].codes)
        assert (over.stats()["step_dispatches"]
                < exact.stats()["step_dispatches"])
