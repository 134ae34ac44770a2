"""Converter golden tests: instantiate HF models with random weights (offline)
and require numerical agreement with our flax implementations."""
import numpy as np
import pytest
# whole-file slow tier: 278s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import torch
import jax
import jax.numpy as jnp

from unified_audio_tpu.models.lm.llama import LlamaBackbone, LlamaConfig
from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
from unified_audio_tpu.utils import convert


def tiny_hf_w2v2_config(stable_ln=False, conv_bias=False, norm="group"):
    from transformers import Wav2Vec2Config

    return Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        conv_bias=conv_bias, feat_extract_norm=norm,
        do_stable_layer_norm=stable_ln, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, layerdrop=0.0,
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0,
    )


def our_cfg_from_hf(hf, use_rel_pos_bias=False, **kw):
    return ssl_mod.SSLConfig(
        hidden_size=hf.hidden_size, num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        conv_dim=tuple(hf.conv_dim), conv_kernel=tuple(hf.conv_kernel),
        conv_stride=tuple(hf.conv_stride), conv_bias=hf.conv_bias,
        feat_extract_norm=hf.feat_extract_norm,
        do_stable_layer_norm=hf.do_stable_layer_norm,
        num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
        use_rel_pos_bias=use_rel_pos_bias, **kw,
    )


class TestWav2Vec2Parity:
    @pytest.mark.parametrize("stable_ln,norm,bias", [
        (False, "group", False),  # hubert/wav2vec2-base style
        (True, "layer", True),    # xlsr-large style
    ])
    def test_hf_parity(self, rng, stable_ln, norm, bias):
        from transformers import Wav2Vec2Model as HFModel

        hf_cfg = tiny_hf_w2v2_config(stable_ln, bias, norm)
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        wav = rng.standard_normal((1, 16320)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(wav), output_hidden_states=True)

        cfg = our_cfg_from_hf(hf_cfg)
        ours_model = ssl_mod.Wav2Vec2Model(cfg)
        params = convert.convert_hf_wav2vec2(hf.state_dict(), cfg)
        hs = ours_model.apply(params, jnp.asarray(wav))

        assert len(hs) == len(ref.hidden_states)
        for i, (a, b) in enumerate(zip(hs, ref.hidden_states)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), atol=2e-4, rtol=1e-3,
                err_msg=f"hidden state {i}",
            )

    def test_wavlm_parity(self, rng):
        from transformers import WavLMConfig, WavLMModel

        hf_cfg = WavLMConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=[16] * 7,
            conv_kernel=[10, 3, 3, 3, 3, 2, 2],
            conv_stride=[5, 2, 2, 2, 2, 2, 2], conv_bias=False,
            feat_extract_norm="group", do_stable_layer_norm=False,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_bucket_distance=80, layerdrop=0.0,
            hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
            feat_proj_dropout=0.0,
        )
        torch.manual_seed(0)
        hf = WavLMModel(hf_cfg).eval()
        wav = rng.standard_normal((1, 16320)).astype(np.float32)
        with torch.no_grad():
            ref = hf(torch.from_numpy(wav), output_hidden_states=True)

        cfg = our_cfg_from_hf(hf_cfg, use_rel_pos_bias=True, num_buckets=32,
                              max_distance=80)
        ours_model = ssl_mod.Wav2Vec2Model(cfg)
        params = convert.convert_hf_wav2vec2(hf.state_dict(), cfg)
        hs = ours_model.apply(params, jnp.asarray(wav))
        for i, (a, b) in enumerate(zip(hs, ref.hidden_states)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), atol=5e-4, rtol=1e-3,
                err_msg=f"hidden state {i}",
            )


class TestLlamaParity:
    def test_hf_llama_backbone_parity(self, rng):
        """Our backbone == HF LlamaModel layers on the same weights — the
        architecture CustomLlamaModel wraps (llm.py:63-82)."""
        from transformers import LlamaConfig as HFLlamaConfig, LlamaModel

        hf_cfg = HFLlamaConfig(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            intermediate_size=128, max_position_embeddings=128,
            attention_dropout=0.0,
        )
        torch.manual_seed(0)
        hf = LlamaModel(hf_cfg).eval()
        embeds = rng.standard_normal((2, 9, 32)).astype(np.float32)
        with torch.no_grad():
            ref = hf(inputs_embeds=torch.from_numpy(embeds)).last_hidden_state

        cfg = LlamaConfig(hidden_size=32, num_layers=2, num_heads=4,
                          global_size=16, semantic_size=16)
        m = LlamaBackbone(cfg)
        sd = hf.state_dict()
        params = {"params": convert.convert_hf_llama_layers(
            {k: v for k, v in sd.items() if not k.startswith("embed_tokens")},
            2,
        )}
        ours = m.apply(params, jnp.asarray(embeds))
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), atol=3e-4, rtol=1e-3
        )


class TestBiCodecConverter:
    def test_roundtrip_structure(self, rng):
        """convert(export(init)) reproduces the init tree exactly (paths,
        shapes, values) — validates every mapping rule and transpose."""
        from unified_audio_tpu.models.bicodec.bicodec import BiCodec
        from unified_audio_tpu.utils.convert_bicodec import (
            convert_bicodec, export_bicodec_state_dict,
        )
        from tests.test_bicodec import tiny_cfg

        cfg = tiny_cfg()
        m = BiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, 25, cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(jax.random.PRNGKey(0), feat, wav)
        ref = {"params": variables["params"],
               "batch_stats": variables["batch_stats"]}

        sd = export_bicodec_state_dict(ref, cfg)
        assert len(sd) > 100  # the full checkpoint surface
        back = convert_bicodec(sd, cfg)

        ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
        back_flat = jax.tree_util.tree_flatten_with_path(back)[0]
        ref_paths = {jax.tree_util.keystr(k): v for k, v in ref_flat}
        back_paths = {jax.tree_util.keystr(k): v for k, v in back_flat}
        # converter must cover every model parameter (codebook collection
        # buffers like cluster_size are training state, not checkpoint params)
        missing = set(ref_paths) - set(back_paths)
        assert not missing, sorted(missing)[:5]

        def folded(paths, k):
            """Weight-norm pairs are compared folded: the converter re-emits a
            forward-identical (v, g) with a different v scale."""
            if k.endswith("['kernel_v']"):
                v = np.asarray(paths[k])
                g = np.asarray(paths[k.replace("kernel_v", "kernel_g")])
                n = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True) + 1e-12)
                return v * (g / n)
            return np.asarray(paths[k])

        for k in ref_paths:
            if k.endswith("['kernel_g']"):
                continue  # covered by the folded kernel_v comparison
            np.testing.assert_allclose(
                folded(ref_paths, k), folded(back_paths, k), atol=1e-5,
                err_msg=k,
            )

    def test_converted_runs(self, rng):
        """The converted tree actually drives tokenize/detokenize."""
        from unified_audio_tpu.models.bicodec.bicodec import BiCodec
        from unified_audio_tpu.utils.convert_bicodec import (
            convert_bicodec, export_bicodec_state_dict,
        )
        from tests.test_bicodec import tiny_cfg

        cfg = tiny_cfg()
        m = BiCodec(cfg)
        wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, 25, cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(jax.random.PRNGKey(0), feat, wav)
        sd = export_bicodec_state_dict(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, cfg)
        conv = convert_bicodec(sd, cfg)
        conv["codebook"] = variables["codebook"]  # EMA stats: training state
        sem, glob = m.apply(conv, feat, wav, method="tokenize")
        sem2, glob2 = m.apply(variables, feat, wav, method="tokenize")
        np.testing.assert_array_equal(np.asarray(sem), np.asarray(sem2))
        np.testing.assert_array_equal(np.asarray(glob), np.asarray(glob2))


class TestHCodecConverter:
    def test_roundtrip_and_runs(self, rng):
        """convert(export(init)) is forward-identical: encode/decode token IDs
        and waveforms match the original tree exactly."""
        from unified_audio_tpu.models.hcodec.codec import HCodec
        from unified_audio_tpu.utils.convert_hcodec import (
            convert_hcodec10, export_hcodec10_state_dict,
        )
        from tests.test_hcodec import small10

        cfg = small10()
        m = HCodec(cfg)
        L = 640 * 4
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(
            rng.standard_normal((1, L // 320, cfg.feat_dim)).astype(np.float32)
        )
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)},
            wav, feat, train=False,
        )
        sd = export_hcodec10_state_dict(variables, cfg)
        assert len(sd) > 150
        back = convert_hcodec10(sd, cfg)

        # structural coverage (weight-norm pairs compared folded)
        ref_flat = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_flatten_with_path(
                        {"params": variables["params"],
                         "codebook": variables["codebook"]})[0]}
        back_flat = {jax.tree_util.keystr(k): v for k, v in
                     jax.tree_util.tree_flatten_with_path(back)[0]}
        assert not set(ref_flat) - set(back_flat), \
            sorted(set(ref_flat) - set(back_flat))[:5]

        ac1, sem1 = m.apply(variables, wav, feat, method="encode")
        ac2, sem2 = m.apply(back, wav, feat, method="encode")
        np.testing.assert_array_equal(np.asarray(ac1), np.asarray(ac2))
        np.testing.assert_array_equal(np.asarray(sem1), np.asarray(sem2))
        rec1 = m.apply(variables, ac1, sem1, method="decode")
        rec2 = m.apply(back, ac1, sem1, method="decode")
        np.testing.assert_allclose(np.asarray(rec1), np.asarray(rec2),
                                   atol=1e-5)

    def test_hcodec20_roundtrip_and_runs(self, rng):
        """HCodec-2.0 convert(export(init)) is forward-identical (STFT
        encoder, repeat-interleave decoder, 16-deep RVQ layout)."""
        from unified_audio_tpu.models.hcodec.codec import HCodec
        from unified_audio_tpu.utils.convert_hcodec import (
            convert_hcodec20, export_hcodec20_state_dict,
        )
        from tests.test_hcodec import small20

        cfg = small20()
        m = HCodec(cfg)
        L = cfg.hop_length * 2
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(rng.standard_normal(
            (1, L * 50 // cfg.sample_rate, cfg.feat_dim)).astype(np.float32))
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)},
            wav, feat, train=False,
        )
        sd = export_hcodec20_state_dict(variables, cfg)
        back = convert_hcodec20(sd, cfg)

        ref_flat = {jax.tree_util.keystr(k): v for k, v in
                    jax.tree_util.tree_flatten_with_path(
                        {"params": variables["params"],
                         "codebook": variables["codebook"]})[0]}
        back_flat = {jax.tree_util.keystr(k): v for k, v in
                     jax.tree_util.tree_flatten_with_path(back)[0]}
        assert not set(ref_flat) - set(back_flat), \
            sorted(set(ref_flat) - set(back_flat))[:5]

        ac1, sem1 = m.apply(variables, wav, feat, method="encode")
        ac2, sem2 = m.apply(back, wav, feat, method="encode")
        np.testing.assert_array_equal(np.asarray(ac1), np.asarray(ac2))
        np.testing.assert_array_equal(np.asarray(sem1), np.asarray(sem2))
        rec1 = m.apply(variables, ac1, sem1, method="decode")
        rec2 = m.apply(back, ac1, sem1, method="decode")
        np.testing.assert_allclose(np.asarray(rec1), np.asarray(rec2),
                                   atol=1e-5)


class TestCustomLlamaConverter:
    """convert_custom_llama <-> export round trip + the CLI checkpoint loader
    (reference test.py:11-30 loads an LM-only ckpt; model.py:82-91 excludes
    the frozen submodules)."""

    def _tiny(self):
        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.models.lm.sft import LLMSFT

        cfg = LlamaConfig(global_size=16, semantic_size=32, hidden_size=32,
                          num_layers=2, num_heads=4)
        sft = LLMSFT(cfg, num_tasks=3, feats_dim=12)
        params = sft.init(
            jax.random.PRNGKey(0), 0, None,
            jnp.zeros((1, 6, 12)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 6), jnp.int32),
        )
        return cfg, sft, params

    def test_export_convert_roundtrip(self):
        from unified_audio_tpu.utils.convert import (
            convert_custom_llama, export_custom_llama_state_dict,
        )

        cfg, sft, params = self._tiny()
        sd = export_custom_llama_state_dict(params, cfg)
        back = convert_custom_llama(sd, cfg)
        flat_a = jax.tree_util.tree_leaves_with_path(params["params"])
        flat_b = jax.tree_util.tree_leaves_with_path(back["params"])
        assert len(flat_a) == len(flat_b)
        for (pa, a), (pb, b) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=str(pa))

    def test_async_checkpoint_save(self, tmp_path):
        """block=False overlaps the write with training; wait() joins it and
        the checkpoint restores identically."""
        from unified_audio_tpu.train.checkpoint import CheckpointManager

        cfg, sft, params = self._tiny()
        mgr = CheckpointManager(tmp_path / "orbax_async")
        mgr.save(3, params, block=False)
        mgr.wait()
        assert mgr.latest_step() == 3
        loaded = mgr.restore(3, template={"params": params})
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["params"]["lm"]["codec_embedding"]
                       ["embedding"]),
            np.asarray(params["params"]["lm"]["codec_embedding"]["embedding"]),
            atol=1e-6,
        )

    def test_cli_checkpoint_loader_orbax_and_torch(self, tmp_path):
        import torch

        from unified_audio_tpu.cli import _load_sft_checkpoint
        from unified_audio_tpu.train.checkpoint import CheckpointManager
        from unified_audio_tpu.utils.convert import (
            export_custom_llama_state_dict,
        )

        cfg, sft, params = self._tiny()

        # orbax directory
        mgr = CheckpointManager(tmp_path / "orbax")
        mgr.save(7, params)
        loaded = _load_sft_checkpoint(str(tmp_path / "orbax"), cfg)
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["lm"]["codec_embedding"]["embedding"]),
            np.asarray(params["params"]["lm"]["codec_embedding"]["embedding"]),
            atol=1e-6,
        )

        # torch .ckpt with Lightning-style nesting + dnn. prefix
        sd = export_custom_llama_state_dict(params, cfg)
        blob = {"state_dict": {f"dnn.{k}": torch.from_numpy(np.array(v))
                               for k, v in sd.items()}}
        pt = tmp_path / "model.ckpt"
        torch.save(blob, pt)
        loaded = _load_sft_checkpoint(str(pt), cfg)
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["adapter"]["kernel"]),
            np.asarray(params["params"]["adapter"]["kernel"]), atol=1e-6,
        )


class TestHCodec15Converter:
    def test_roundtrip_and_runs(self, rng):
        """convert_hcodec15(export(init)) is forward-identical (SEANet +
        aggregators + mimi bottleneck + RVQ mapping)."""
        from unified_audio_tpu.models.hcodec.adaptive import (
            AdaptiveConfig, AdaptiveHCodec)
        from unified_audio_tpu.utils.convert_hcodec import (
            convert_hcodec15, export_hcodec15_state_dict)
        from tests.test_hcodec import small10

        cfg = AdaptiveConfig(base=small10(), similarity_threshold=0.5,
                             max_group_len=4, bottleneck_layers=1,
                             aggregator_layers=1)
        m = AdaptiveHCodec(cfg)
        L = 640 * 8
        wav = jnp.asarray(rng.standard_normal((1, L, 1)).astype(np.float32))
        feat = jnp.asarray(rng.standard_normal(
            (1, L // 320, cfg.base.feat_dim)).astype(np.float32))
        variables = m.init(
            {"params": jax.random.PRNGKey(0), "quant": jax.random.PRNGKey(1)},
            wav, feat, train=False)
        sd = export_hcodec15_state_dict(variables, cfg)
        assert any(k.startswith("semantic_aggregator.transformer") for k in sd)
        assert any(k.startswith("bottleneck_transformer") for k in sd)
        back = convert_hcodec15(sd, cfg)

        ac1, s1 = m.apply(variables, wav, feat, method="encode")
        ac2, s2 = m.apply(back, wav, feat, method="encode")
        np.testing.assert_array_equal(np.asarray(ac1), np.asarray(ac2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        r1 = m.apply(variables, ac1, s1, method="decode")
        r2 = m.apply(back, ac1, s1, method="decode")
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)
