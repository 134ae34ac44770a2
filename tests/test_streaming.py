"""Streaming transformer tests: the Mimi invariant — chunked streaming equals
the offline sliding-window forward when capacity >= context."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.nn.streaming import (
    ProjectedStreamingTransformer, StreamingTransformer,
)


class TestStreamingTransformer:
    @pytest.fixture(scope="class")
    def setup(self):
        m = StreamingTransformer(dim=32, num_layers=2, num_heads=4, context=4)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        return m, variables, x

    def test_offline_shape(self, setup):
        m, variables, x = setup
        y = m.apply(variables, x)
        assert y.shape == x.shape

    @pytest.mark.parametrize("chunk", [1, 3, 4])
    def test_streaming_matches_offline(self, setup, chunk):
        m, variables, x = setup
        offline = m.apply(variables, x)
        state = m.apply(variables, 2, 12, method="init_state")
        outs = []
        for i in range(0, 12, chunk):
            y, state = m.apply(variables, x[:, i : i + chunk], state,
                               method="step")
            outs.append(y)
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(offline), np.asarray(streamed),
                                   atol=1e-4)

    def test_ring_eviction(self, setup):
        """capacity == context: old keys are overwritten but the context
        window semantics still hold (equal to offline sliding window)."""
        m, variables, x = setup
        offline = m.apply(variables, x)
        state = m.apply(variables, 2, 4, method="init_state")  # tight ring
        outs = []
        for i in range(12):
            y, state = m.apply(variables, x[:, i : i + 1], state, method="step")
            outs.append(y)
        streamed = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(offline), np.asarray(streamed),
                                   atol=1e-4)


class TestProjected:
    def test_projected_streaming(self, rng):
        m = ProjectedStreamingTransformer(
            dim=32, input_dim=16, output_dim=24, num_layers=1, num_heads=4,
            context=4,
        )
        x = jnp.asarray(rng.standard_normal((1, 8, 16)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(variables, x)
        assert y.shape == (1, 8, 24)
        state = m.apply(variables, 1, method="init_state")
        outs = []
        for i in range(8):
            yi, state = m.apply(variables, x[:, i : i + 1], state, method="step")
            outs.append(yi)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(jnp.concatenate(outs, 1)), atol=1e-4
        )
