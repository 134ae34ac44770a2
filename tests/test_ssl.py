"""SSL frontend tests: shapes, frame rates, hidden-state counts, feature mixes."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.ssl import wav2vec2 as ssl


def tiny(base):
    return ssl.SSLConfig(
        hidden_size=base.hidden_size // 16 if base.hidden_size % 16 == 0 else 48,
        num_layers=2,
        num_heads=base.num_heads // 4,
        intermediate_size=64,
        conv_dim=(16,) * 7,
        conv_kernel=base.conv_kernel,
        conv_stride=base.conv_stride,
        conv_bias=base.conv_bias,
        feat_extract_norm=base.feat_extract_norm,
        do_stable_layer_norm=base.do_stable_layer_norm,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        use_rel_pos_bias=base.use_rel_pos_bias,
        num_buckets=32,
        max_distance=80,
    )


@pytest.mark.parametrize(
    "preset",
    [ssl.hubert_base_config, ssl.wavlm_base_plus_config,
     ssl.wav2vec2_large_xlsr53_config],
)
def test_forward_shapes(preset, key, rng):
    cfg = tiny(preset())
    m = ssl.Wav2Vec2Model(cfg)
    wav = jnp.asarray(rng.standard_normal((2, 16320)).astype(np.float32))
    variables = m.init(key, wav)
    hs = m.apply(variables, wav)
    assert len(hs) == cfg.num_layers + 1
    # 320x downsample, 50 Hz framing: HF conv arithmetic gives 50 frames for
    # 16320 samples (= 16000 + 2*160 reference padding)
    assert hs[0].shape[0] == 2 and hs[0].shape[-1] == cfg.hidden_size
    t = hs[0].shape[1]
    assert t == 50, t


def test_frame_count_matches_hf_arithmetic(key, rng):
    """HF conv stack frame math: floor((T - k)/s) + 1 chained over 7 layers."""
    cfg = tiny(ssl.hubert_base_config())
    m = ssl.Wav2Vec2Model(cfg)
    for t_in in (16000, 16320, 80000):
        t = t_in
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            t = (t - k) // s + 1
        wav = jnp.asarray(rng.standard_normal((1, t_in)).astype(np.float32))
        variables = m.init(key, wav)
        hs = m.apply(variables, wav)
        assert hs[0].shape[1] == t


def test_rel_pos_buckets_symmetry():
    b = ssl._relative_position_buckets(10, 10, 32, 80)
    b = np.asarray(b)
    assert b.shape == (10, 10)
    assert b.max() < 32
    # forward and backward offsets land in different halves
    assert b[0, 5] >= 16 and b[5, 0] < 16


def test_feature_mixes(rng):
    hs = tuple(
        jnp.asarray(rng.standard_normal((1, 5, 8)).astype(np.float32))
        for _ in range(17)
    )
    hub = ssl.hubert_features(hs)
    assert hub.shape == (1, 5, 8)
    mix = np.mean(np.stack([np.asarray(h) for h in hs]), axis=0)
    np.testing.assert_allclose(
        np.asarray(hub), np.sign(mix) * np.abs(mix) ** 0.3, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(ssl.wavlm_features(hs)), mix, atol=1e-6)
    x = np.asarray(ssl.xlsr_features(hs))
    np.testing.assert_allclose(
        x, (np.asarray(hs[11]) + np.asarray(hs[14]) + np.asarray(hs[16])) / 3,
        atol=1e-6,
    )


def test_wavlm_gating_changes_output(key, rng):
    """Gated rel-pos bias is active: zeroing the rel embed changes outputs."""
    cfg = tiny(ssl.wavlm_base_plus_config())
    m = ssl.Wav2Vec2Model(cfg)
    wav = jnp.asarray(rng.standard_normal((1, 16320)).astype(np.float32))
    variables = m.init(key, wav)
    out1 = m.apply(variables, wav)[-1]
    flat = jax.tree_util.tree_map(lambda x: x, variables)
    p = flat["params"]["layers_0"]["attention"]["rel_attn_embed"]
    # perturb a single bucket (a uniform shift would be softmax-invariant)
    flat["params"]["layers_0"]["attention"]["rel_attn_embed"] = p.at[0].add(3.0)
    out2 = m.apply(flat, wav)[-1]
    assert float(jnp.abs(out1 - out2).max()) > 1e-4
