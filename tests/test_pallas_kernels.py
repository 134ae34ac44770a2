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
