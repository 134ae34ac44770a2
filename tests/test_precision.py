"""bf16 path tests: generate stays valid, loss close to fp32."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.lm.llama import LlamaConfig
from unified_audio_tpu.models.lm.sft import LLMSFT
from unified_audio_tpu.utils.precision import bf16_params, f32_params


def test_bf16_generate_valid(rng):
    cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                      num_layers=2, num_heads=4)
    m = LLMSFT(cfg, num_tasks=3, feats_dim=12)
    mix = jnp.asarray(rng.standard_normal((2, 10, 12)).astype(np.float32))
    g = jnp.zeros((2, 4), jnp.int32)
    s = jnp.zeros((2, 10), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), 0, None, mix, g, s)
    p16 = bf16_params(params)

    gids, sids = m.apply(p16, 0, None, mix.astype(jnp.bfloat16),
                         jax.random.PRNGKey(1), method="generate",
                         global_length=4, semantic_length=6)
    assert 0 <= int(gids.min()) and int(gids.max()) < cfg.global_size
    assert 0 <= int(sids.min()) and int(sids.max()) < cfg.semantic_size

    loss32, _ = m.apply(params, 0, None, mix, g, s)
    loss16, _ = m.apply(p16, 0, None, mix.astype(jnp.bfloat16), g, s)
    np.testing.assert_allclose(float(loss32), float(loss16), rtol=0.05)

    # round trip cast restores dtype
    back = f32_params(p16)
    leaf = jax.tree_util.tree_leaves(back)[0]
    assert leaf.dtype == jnp.float32
