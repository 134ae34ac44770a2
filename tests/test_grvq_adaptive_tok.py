"""AutoGroup RVQ + adaptive tokenizer tests."""
import numpy as np
import pytest
# whole-file slow tier: 76s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.ops.grvq import (
    AutoGroupResidualVectorQuantize, AutoGroupVectorQuantize,
)


class TestAutoGroupVQ:
    def test_forward_and_decode(self, key, rng):
        m = AutoGroupVectorQuantize(input_dim=16, codebook_size=32,
                                    codebook_dim=8)
        z = jnp.asarray(rng.standard_normal((2, 10, 16)).astype(np.float32))
        variables = m.init(key, z)
        out = m.apply(variables, z)
        assert out["z_q"].shape == z.shape
        assert out["indices"].shape == (2, 10)
        assert int(out["indices"].max()) < 32 * 32
        dec = m.apply(variables, out["indices"], method="decode_indices")
        np.testing.assert_allclose(np.asarray(out["z_q"]), np.asarray(dec),
                                   atol=1e-5)

    def test_temporal_residual_roundtrip(self, key, rng):
        m = AutoGroupVectorQuantize(input_dim=16, codebook_size=32,
                                    codebook_dim=8, frame_residual_vq=True)
        z = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
        variables = m.init(key, z)
        out = m.apply(variables, z)
        dec = m.apply(variables, out["indices"], method="decode_indices")
        np.testing.assert_allclose(np.asarray(out["z_q"]), np.asarray(dec),
                                   atol=1e-4)

    def test_residual_stack(self, key, rng):
        m = AutoGroupResidualVectorQuantize(
            input_dim=16, codebook_size=32, codebook_dim=8, num_quantizers=2
        )
        z = jnp.asarray(rng.standard_normal((2, 8, 16)).astype(np.float32))
        variables = m.init(key, z)
        out = m.apply(variables, z)
        assert out["indices"].shape == (2, 8, 2)
        dec = m.apply(variables, out["indices"], method="decode_indices")
        np.testing.assert_allclose(np.asarray(out["z_q"]), np.asarray(dec),
                                   atol=1e-4)


class TestAdaptiveTokenizer:
    def test_tokenize_detokenize(self, rng):
        from unified_audio_tpu.models.hcodec.adaptive import AdaptiveConfig
        from unified_audio_tpu.models.hcodec.adaptive_tokenizer import (
            AdaptiveHCodecTokenizer,
        )
        from tests.test_hcodec import small10
        from tests.test_unise import tiny_ssl_cfg

        cfg = AdaptiveConfig(
            base=small10(), similarity_threshold=0.5, max_group_len=4,
            bottleneck_layers=1, aggregator_layers=1,
        )
        tok = AdaptiveHCodecTokenizer.from_random(
            jax.random.PRNGKey(0), cfg, tiny_ssl_cfg(32)
        )
        wav = jnp.asarray(rng.standard_normal((1, 640 * 8)).astype(np.float32))
        out = tok.tokenize(wav)
        ac = out["acoustic_codes"]
        assert ac.shape[0] == 1 and ac.shape[1] == 2  # (B, nq, G)
        assert float(out["token_rate_hz"][0]) > 0
        rec = tok.detokenize(ac, out["semantic_codes"])
        assert rec.shape == (1, 640 * 8)


def test_token_parser_maps():
    from unified_audio_tpu.utils.token_parser import (
        EMO_MAP, GENDER_MAP, TASK_TOKEN_MAP, global_token_string,
    )

    assert TASK_TOKEN_MAP["se"] == "<|task_se|>"
    assert GENDER_MAP["male"] == 1 and EMO_MAP["NEUTRAL"] == 1
    assert global_token_string([1, 2]) == (
        "<|bicodec_global_1|><|bicodec_global_2|>"
    )
