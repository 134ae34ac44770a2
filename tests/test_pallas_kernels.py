"""Pallas kernels vs XLA reference paths (interpret mode on the CPU mesh)."""
import numpy as np
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
