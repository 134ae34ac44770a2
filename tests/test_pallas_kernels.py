import pytest

# whole-file slow tier: 132s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow
"""Pallas kernels vs XLA reference paths (interpret mode on the CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from unified_audio_tpu.ops import quant
from unified_audio_tpu.ops.pallas import vq_kernel


class TestVQKernel:
    def test_matches_xla_path(self, rng):
        x = rng.standard_normal((700, 64)).astype(np.float32)
        cb = rng.standard_normal((256, 64)).astype(np.float32)
        ref = np.asarray(quant.nearest_code(jnp.asarray(x), jnp.asarray(cb)))
        ours = np.asarray(
            vq_kernel.nearest_code_pallas(
                jnp.asarray(x), jnp.asarray(cb), tile_m=1024, interpret=True
            )
        )
        np.testing.assert_array_equal(ours, ref)

    def test_batched_shape(self, rng):
        x = rng.standard_normal((2, 50, 32)).astype(np.float32)
        cb = rng.standard_normal((128, 32)).astype(np.float32)
        idx = vq_kernel.nearest_code_pallas(
            jnp.asarray(x), jnp.asarray(cb), tile_m=1024, interpret=True
        )
        assert idx.shape == (2, 50)

    def test_rvq_encode(self, key, rng):
        """Pallas RVQ encode == module encode on the same codebooks."""
        m = quant.ResidualVQ(dim=16, codebook_size=32, num_quantizers=3,
                             kmeans_init=False)
        x = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
        import jax
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "quant": jax.random.PRNGKey(1)}, x, train=False)
        ref = np.asarray(m.apply(variables, x, method="encode"))
        cbs = jnp.stack(
            [variables["codebook"][f"layers_{i}"]["embed"] for i in range(3)]
        )
        ours = np.asarray(
            vq_kernel.rvq_encode_pallas(x, cbs, tile_m=1024, interpret=True)
        )
        np.testing.assert_array_equal(ours, ref)

    def test_rvq_fused(self, key, rng):
        """Fully fused multi-layer kernel == module encode."""
        m = quant.ResidualVQ(dim=16, codebook_size=32, num_quantizers=4,
                             kmeans_init=False)
        x = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
        import jax
        variables = m.init({"params": jax.random.PRNGKey(0),
                            "quant": jax.random.PRNGKey(1)}, x, train=False)
        ref = np.asarray(m.apply(variables, x, method="encode"))
        cbs = jnp.stack(
            [variables["codebook"][f"layers_{i}"]["embed"] for i in range(4)]
        )
        ours = np.asarray(
            vq_kernel.rvq_encode_fused_pallas(x, cbs, interpret=True)
        )
        np.testing.assert_array_equal(ours, ref)


class TestPagedFlashDecode:
    """Paged flash-decode kernel == the XLA full-pool attention math."""

    def test_matches_xla_paged_attention(self, rng):
        from unified_audio_tpu.ops.pallas.paged_attention import (
            paged_flash_decode,
        )

        L, NB, BS, H, hd = 2, 7, 8, 4, 16
        S, MB = 3, 3
        kpool = jnp.asarray(rng.standard_normal((L, NB, BS, H, hd)),
                            jnp.float32)
        vpool = jnp.asarray(rng.standard_normal((L, NB, BS, H, hd)),
                            jnp.float32)
        tables = jnp.asarray([[1, 2, 0], [3, 4, 5], [6, 0, 0]], jnp.int32)
        index = jnp.asarray([11, 20, 3], jnp.int32)
        q = jnp.asarray(rng.standard_normal((S, H, hd)), jnp.float32)

        for li in range(L):
            got = paged_flash_decode(q, kpool, vpool, tables, index, li,
                                     interpret=True)
            # reference: gather each slot's logical view, mask, softmax
            view_k = kpool[li][tables].reshape(S, MB * BS, H, hd)
            view_v = vpool[li][tables].reshape(S, MB * BS, H, hd)
            pos = np.arange(MB * BS)[None]
            mask = np.where(pos <= np.asarray(index)[:, None], 0.0, -1e30)
            logits = jnp.einsum("shd,skhd->shk", q, view_k) * hd**-0.5
            logits = logits + mask[:, None]
            probs = jax.nn.softmax(logits, axis=-1)
            want = jnp.einsum("shk,skhd->shd", probs, view_v)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, err_msg=f"layer {li}")

    def test_unallocated_blocks_masked(self, rng):
        """Entries pointing at the trash block beyond the slot's length must
        contribute nothing even if the trash block holds garbage."""
        from unified_audio_tpu.ops.pallas.paged_attention import (
            paged_flash_decode,
        )

        L, NB, BS, H, hd = 1, 4, 8, 4, 16
        kpool = jnp.asarray(rng.standard_normal((L, NB, BS, H, hd)) * 100,
                            jnp.float32)
        vpool = jnp.asarray(rng.standard_normal((L, NB, BS, H, hd)) * 100,
                            jnp.float32)
        q = jnp.asarray(rng.standard_normal((1, H, hd)), jnp.float32)
        # slot owns block 1 only (positions 0..7), index 5
        t_trash = jnp.asarray([[1, 0, 0]], jnp.int32)
        t_other = jnp.asarray([[1, 2, 3]], jnp.int32)  # same masked positions
        idx = jnp.asarray([5], jnp.int32)
        a = paged_flash_decode(q, kpool, vpool, t_trash, idx, 0,
                               interpret=True)
        b = paged_flash_decode(q, kpool, vpool, t_other, idx, 0,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestStreamFlashDecode:
    """Round-3 full-stream kernel (flat pool layout): kernel-backed decode
    step == the XLA formulation, end to end through paged_decode_ids."""

    def _setup(self, rng):
        from unified_audio_tpu.models.lm.llama import LlamaConfig, init_cache
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.paged import init_pool, scatter_prefill

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, feats_dim=8)
        mix0 = jnp.zeros((1, 4, 8), jnp.float32)
        variables = sft.init(
            jax.random.PRNGKey(0), 0, None, mix0,
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32))
        lm_params = variables["params"]["lm"]

        bs, nb_total, s_slots = 8, 40, 2
        pool = init_pool(cfg, nb_total, bs)
        tables = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
        prompt = jnp.asarray(
            rng.standard_normal((s_slots, 10, cfg.hidden_size)).astype(
                np.float32))
        cache = init_cache(cfg, s_slots, 10)
        _, cache = sft.apply(variables, prompt, cache,
                             method=lambda m, p, c: m.lm.prefill(p, c))
        pool = scatter_prefill(pool, tables, cache["k"], cache["v"], bs)
        return cfg, lm_params, pool, tables, bs

    def test_kernel_step_equals_xla_step(self, rng):
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs = self._setup(rng)
        index = jnp.asarray([10, 10], jnp.int32)
        active = jnp.asarray([True, True])
        ids = jnp.asarray([3, 4], jnp.int32)
        ref, pool_r = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                       active, ids, bs,
                                       num_active_blocks=8)
        got, pool_k = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                       active, ids, bs,
                                       num_active_blocks=8, use_kernel=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)
        # layer-2 scattered K derives from layer-1's attention output, so
        # the pools agree to fp tolerance, not bitwise
        np.testing.assert_allclose(np.asarray(pool_r["k"]),
                                   np.asarray(pool_k["k"]), atol=3e-5)

    def test_kernel_multi_step_trajectory(self, rng):
        """Greedy multi-step decode trajectories are identical: the kernel
        sees each step's freshly scattered K/V."""
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs = self._setup(rng)
        for use_kernel in (False, True):
            p = {"k": pool["k"], "v": pool["v"]}
            idx = jnp.asarray([10, 10], jnp.int32)
            ids = jnp.asarray([3, 4], jnp.int32)
            active = jnp.asarray([True, True])
            toks = []
            for _ in range(5):
                logits, p = paged_decode_ids(
                    cfg, lm_params, p, tables, idx, active, ids, bs,
                    num_active_blocks=8, use_kernel=use_kernel)
                ids = jnp.argmax(logits, -1).astype(jnp.int32)
                idx = idx + 1
                toks.append(np.asarray(ids))
            if use_kernel:
                np.testing.assert_array_equal(np.stack(toks), ref_toks)
            else:
                ref_toks = np.stack(toks)


class TestInt8PoolStreamDecode:
    """Round-4 int8 KV pool: the q8 stream kernel == the XLA int8-dequant
    path exactly (same quantized values, same fp32 dequant math), and the
    int8 pool tracks the fp pool closely."""

    def _setup(self, rng, quant):
        from unified_audio_tpu.models.lm.llama import LlamaConfig, init_cache
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.paged import init_pool, scatter_prefill

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, feats_dim=8)
        mix0 = jnp.zeros((1, 4, 8), jnp.float32)
        variables = sft.init(
            jax.random.PRNGKey(0), 0, None, mix0,
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32))
        lm_params = variables["params"]["lm"]

        bs, nb_total, s_slots = 8, 40, 2
        pool = init_pool(cfg, nb_total, bs, quant=quant)
        tables = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
        prompt = jnp.asarray(
            rng.standard_normal((s_slots, 10, cfg.hidden_size)).astype(
                np.float32))
        cache = init_cache(cfg, s_slots, 10)
        _, cache = sft.apply(variables, prompt, cache,
                             method=lambda m, p, c: m.lm.prefill(p, c))
        pool = scatter_prefill(pool, tables, cache["k"], cache["v"], bs)
        return cfg, lm_params, pool, tables, bs

    def test_quantize_kv_bounds(self, rng):
        from unified_audio_tpu.serve.paged import quantize_kv

        x = jnp.asarray(rng.standard_normal((5, 64)), jnp.float32)
        q, sc = quantize_kv(x)
        assert q.dtype == jnp.int8 and sc.shape == (5,)
        deq = np.asarray(q, np.float32) * np.asarray(sc)[:, None]
        err = np.abs(deq - np.asarray(x))
        # symmetric int8: error bounded by half a quantization step
        assert (err <= np.asarray(sc)[:, None] * 0.5 + 1e-7).all()
        # exactly representable rows round-trip bit-identically
        row = (jnp.arange(64, dtype=jnp.float32) - 32.0) * 2.0  # n * amax/127?
        row = row.at[0].set(127.0)  # amax 127 -> scale 1.0 -> integers exact
        q2, sc2 = quantize_kv(row[None])
        deq2 = np.asarray(q2, np.float32)[0] * float(sc2[0])
        np.testing.assert_array_equal(deq2, np.asarray(row))

    def test_q8_kernel_equals_q8_xla(self, rng):
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs = self._setup(rng, quant="int8")
        index = jnp.asarray([10, 10], jnp.int32)
        active = jnp.asarray([True, True])
        ids = jnp.asarray([3, 4], jnp.int32)
        ref, pool_r = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                       active, ids, bs,
                                       num_active_blocks=8)
        got, pool_k = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                       active, ids, bs,
                                       num_active_blocks=8, use_kernel=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(pool_r["k"], np.float32),
            np.asarray(pool_k["k"], np.float32), atol=1)
        np.testing.assert_allclose(np.asarray(pool_r["k_scale"]),
                                   np.asarray(pool_k["k_scale"]), atol=3e-5)

    def test_q8_multi_step_trajectory(self, rng):
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs = self._setup(rng, quant="int8")
        ref_toks = None
        for use_kernel in (False, True):
            p = dict(pool)
            idx = jnp.asarray([10, 10], jnp.int32)
            ids = jnp.asarray([3, 4], jnp.int32)
            active = jnp.asarray([True, True])
            toks = []
            for _ in range(5):
                logits, p = paged_decode_ids(
                    cfg, lm_params, p, tables, idx, active, ids, bs,
                    num_active_blocks=8, use_kernel=use_kernel)
                ids = jnp.argmax(logits, -1).astype(jnp.int32)
                idx = idx + 1
                toks.append(np.asarray(ids))
            if use_kernel:
                np.testing.assert_array_equal(np.stack(toks), ref_toks)
            else:
                ref_toks = np.stack(toks)

    def test_q8_close_to_fp_pool(self, rng):
        """int8 KV rounding stays a small perturbation of the fp path."""
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool8, tables, bs = self._setup(
            np.random.default_rng(7), quant="int8")
        _, lm_params2, pool32, _, _ = self._setup(
            np.random.default_rng(7), quant=None)
        index = jnp.asarray([10, 10], jnp.int32)
        active = jnp.asarray([True, True])
        ids = jnp.asarray([3, 4], jnp.int32)
        l8, _ = paged_decode_ids(cfg, lm_params, pool8, tables, index,
                                 active, ids, bs, num_active_blocks=8)
        l32, _ = paged_decode_ids(cfg, lm_params2, pool32, tables, index,
                                  active, ids, bs, num_active_blocks=8)
        a, b = np.asarray(l8), np.asarray(l32)
        denom = np.abs(b).max() + 1e-9
        assert np.abs(a - b).max() / denom < 0.05, np.abs(a - b).max() / denom


class TestOwnerFlashDecode:
    """Round-4 ownership-aware kernel: grid (slot, owned-chunk) over
    contiguous RegionAllocator ranges == the XLA paged formulation, end to
    end through paged_decode_ids (interpret mode on CPU)."""

    def _setup(self, rng, region_blocks=4, chunk=2):
        from unified_audio_tpu.models.lm.llama import LlamaConfig, init_cache
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.paged import (RegionAllocator, init_pool,
                                                   scatter_prefill)

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, feats_dim=8)
        variables = sft.init(
            jax.random.PRNGKey(0), 0, None, jnp.zeros((1, 4, 8), jnp.float32),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32))
        lm_params = variables["params"]["lm"]

        bs, nb_total, s_slots = 8, 40, 3
        alloc = RegionAllocator(nb_total, region_blocks)
        pool = init_pool(cfg, nb_total, bs)
        tables_np = np.zeros((s_slots, 3), np.int32)
        for s, n in enumerate((3, 2, 3)):
            blocks = alloc.alloc(n)
            assert blocks[0] % chunk == 0  # chunk-aligned contiguous start
            tables_np[s, :n] = blocks
        tables = jnp.asarray(tables_np)
        prompt = jnp.asarray(rng.standard_normal(
            (s_slots, 10, cfg.hidden_size)).astype(np.float32))
        cache = init_cache(cfg, s_slots, 10)
        _, cache = sft.apply(variables, prompt, cache,
                             method=lambda m, p, c: m.lm.prefill(p, c))
        pool = scatter_prefill(pool, tables, cache["k"], cache["v"], bs)
        return cfg, lm_params, pool, tables, bs, chunk

    def test_owner_step_equals_xla_step(self, rng):
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs, chunk = self._setup(rng)
        # slot 1's live prefix ends inside chunk 0 (index 7 < 2*8):
        # exercises the clamped dead-chunk DMA + j < nc compute gate
        index = jnp.asarray([10, 7, 10], jnp.int32)
        active = jnp.asarray([True, True, True])
        ids = jnp.asarray([3, 4, 5], jnp.int32)
        ref, pool_r = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                       active, ids, bs)
        got, pool_k = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                       active, ids, bs, use_kernel="owner",
                                       owner_chunk_blocks=chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)
        np.testing.assert_allclose(np.asarray(pool_r["k"]),
                                   np.asarray(pool_k["k"]), atol=3e-5)

    def test_owner_multi_step_trajectory_with_inactive(self, rng):
        """Greedy trajectories identical across the XLA and owner paths,
        with an inactive slot in the batch (owner emits zeros for it; its
        sampled garbage never feeds back because active gates the engine's
        state updates — here we only compare active rows)."""
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs, chunk = self._setup(rng)
        active = jnp.asarray([True, False, True])
        ref_toks = None
        for uk in (False, "owner"):
            p = {"k": pool["k"], "v": pool["v"]}
            idx = jnp.asarray([10, 7, 10], jnp.int32)
            ids = jnp.asarray([3, 4, 5], jnp.int32)
            toks = []
            for _ in range(6):
                logits, p = paged_decode_ids(
                    cfg, lm_params, p, tables, idx, active, ids, bs,
                    use_kernel=uk, owner_chunk_blocks=chunk)
                ids = jnp.argmax(logits, -1).astype(jnp.int32)
                idx = idx + 1
                toks.append(np.asarray(ids))
            t = np.stack(toks)[:, [0, 2]]
            if uk:
                np.testing.assert_array_equal(t, ref_toks)
            else:
                ref_toks = t

    def test_owner_single_chunk_region(self, rng):
        """chunk == region (max_chunks == 1): the whole-region-in-one-DMA
        configuration the serving engine uses on TPU."""
        from unified_audio_tpu.serve.paged import paged_decode_ids

        cfg, lm_params, pool, tables, bs, _ = self._setup(
            rng, region_blocks=4, chunk=4)
        index = jnp.asarray([10, 7, 10], jnp.int32)
        active = jnp.asarray([True, True, True])
        ids = jnp.asarray([3, 4, 5], jnp.int32)
        ref, _ = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                  active, ids, bs)
        got, _ = paged_decode_ids(cfg, lm_params, pool, tables, index,
                                  active, ids, bs, use_kernel="owner",
                                  owner_chunk_blocks=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)

    def test_owner_q8_equals_q8_xla(self, rng):
        """int8-pool owner kernel == the XLA int8-dequant path: same
        quantized pool, same row-wise fp32 scale folds — greedy multi-step
        trajectories must be token-identical."""
        from unified_audio_tpu.models.lm.llama import LlamaConfig, init_cache
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.serve.paged import (RegionAllocator, init_pool,
                                                   paged_decode_ids,
                                                   scatter_prefill)

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, feats_dim=8)
        variables = sft.init(
            jax.random.PRNGKey(0), 0, None, jnp.zeros((1, 4, 8), jnp.float32),
            jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32))
        lm_params = variables["params"]["lm"]

        bs, nb_total, s_slots, chunk = 8, 40, 2, 2
        alloc = RegionAllocator(nb_total, 4)
        tables_np = np.zeros((s_slots, 3), np.int32)
        for s, n in enumerate((3, 2)):
            tables_np[s, :n] = alloc.alloc(n)
        tables = jnp.asarray(tables_np)
        pool0 = init_pool(cfg, nb_total, bs, quant="int8")
        prompt = jnp.asarray(rng.standard_normal(
            (s_slots, 10, cfg.hidden_size)).astype(np.float32))
        cache = init_cache(cfg, s_slots, 10)
        _, cache = sft.apply(variables, prompt, cache,
                             method=lambda m, p, c: m.lm.prefill(p, c))
        pool0 = scatter_prefill(pool0, tables, cache["k"], cache["v"], bs)

        active = jnp.asarray([True, True])
        ref_toks = None
        for uk in (False, "owner"):
            p = dict(pool0)
            idx = jnp.asarray([10, 7], jnp.int32)
            ids = jnp.asarray([3, 4], jnp.int32)
            toks = []
            for _ in range(6):
                logits, p = paged_decode_ids(
                    cfg, lm_params, p, tables, idx, active, ids, bs,
                    use_kernel=uk, owner_chunk_blocks=chunk)
                ids = jnp.argmax(logits, -1).astype(jnp.int32)
                idx = idx + 1
                toks.append(np.asarray(ids))
            t = np.stack(toks)
            if uk:
                np.testing.assert_array_equal(t, ref_toks)
            else:
                ref_toks = t
