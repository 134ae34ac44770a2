"""Parity goldens against the reference's OWN torch code in /root/reference.

Round-2 verdict: HF-parity and self-round-trip tests can share a wrong
assumption between model and converter. These tests close that hole: the
reference's actual ``Codec`` (HCodec-1.0/vq/codec.py:21), ``BiCodec``
(QuarkAudio-UniSE/model/bicodec/bicodec.py:31) and ``LLM_SFT``
(model/llm/llm_sft.py:13) are instantiated with random weights, their
state_dicts run through utils/convert*, and the two implementations are
pinned against each other: identical encode() token IDs, decode() waveform
agreement, greedy generate equality.

Reference imports use tests/reference_loader.py (shims documented there).
All models run at the reference's FULL shipped dimensions — that is the
point: the hardcoded dims and padding semantics are what the goldens guard.
"""
from __future__ import annotations

import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

jnp = jax.numpy

sys.path.insert(0, str(Path(__file__).parent))
import reference_loader as rl  # noqa: E402

# full reference dims on CPU: ~3 min/test, ~40 min for the module. Opt in
# with `pytest -m golden` when converters or model architectures change.
pytestmark = pytest.mark.golden

torch = rl.torch


def _seeded_codec10():
    """Reference HCodec-1.0 Codec, random weights, RVQ codebooks force-inited."""
    rl.load_hcodec10()
    codec_mod = importlib.import_module("ref_hc10_vq.codec")
    torch.manual_seed(0)
    c = codec_mod.Codec({}, {}, {})
    gen = torch.Generator().manual_seed(1)
    rl.init_rvq_codebooks(c.quantizer, gen)
    rl.init_rvq_codebooks(c.semantic_quantizer, gen)
    c.eval()
    return c


class TestHCodec10Golden:
    @pytest.fixture(scope="class")
    def setup(self):
        from unified_audio_tpu.models.hcodec.codec import (
            HCodec, hcodec10_config)
        from unified_audio_tpu.utils.convert_hcodec import convert_hcodec10

        ref = _seeded_codec10()
        cfg = hcodec10_config()
        ours = HCodec(cfg)
        variables = convert_hcodec10(ref.state_dict(), cfg)
        return ref, ours, variables, cfg

    def test_encode_token_ids_identical(self, setup):
        """The BASELINE north-star claim, demonstrated against the
        reference's own encoder + RVQ (core_vq semantics) code."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(7)
        L = 640 * 10
        wav = rng.standard_normal((2, L)).astype(np.float32) * 0.2
        feat = rng.standard_normal((2, L // 320, 768)).astype(np.float32)

        with torch.no_grad():
            ac_t, sem_t = ref.encode(
                torch.from_numpy(wav)[:, None],
                torch.from_numpy(feat).transpose(1, 2))
        ac_j, sem_j = ours.apply(
            variables, jnp.asarray(wav[..., None]), jnp.asarray(feat),
            method="encode")
        # reference codes (B, nq, T); ours (B, T, nq)
        np.testing.assert_array_equal(
            np.asarray(ac_j), ac_t.numpy().transpose(0, 2, 1))
        np.testing.assert_array_equal(
            np.asarray(sem_j), sem_t.numpy().transpose(0, 2, 1))

    def test_decode_waveform_matches(self, setup):
        """decode() on arbitrary valid codes: ConvNeXt stack + ISTFT head
        overlap-add vs the reference's spectral_ops.ISTFT."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(8)
        T = 10
        ac = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, T))
        sem = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, T))
        with torch.no_grad():
            wav_t = ref.decode(torch.from_numpy(ac), torch.from_numpy(sem))
        wav_j = ours.apply(
            variables, jnp.asarray(ac.transpose(0, 2, 1)),
            jnp.asarray(sem.transpose(0, 2, 1)), method="decode")
        wav_t = wav_t.numpy()
        wav_j = np.asarray(wav_j)
        assert wav_j.shape == wav_t.shape
        scale = np.abs(wav_t).max()
        np.testing.assert_allclose(wav_j, wav_t, atol=2e-4 * max(scale, 1.0),
                                   rtol=0)

    def test_forward_recon_and_feat_10(self, setup):
        """Training-path forward: recon + semantic feature prediction."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(9)
        L = 640 * 6
        wav = rng.standard_normal((1, L)).astype(np.float32) * 0.2
        feat = rng.standard_normal((1, L // 320, 768)).astype(np.float32)
        with torch.no_grad():
            rec_t, pf_t, _ = ref(
                torch.from_numpy(wav)[:, None],
                torch.from_numpy(feat).transpose(1, 2))
        rec_j, pf_j, _ = ours.apply(
            variables, jnp.asarray(wav[..., None]), jnp.asarray(feat),
            train=False)
        rec_t, pf_t = rec_t.numpy(), pf_t.numpy().transpose(0, 2, 1)
        s = max(np.abs(rec_t).max(), 1.0)
        np.testing.assert_allclose(np.asarray(rec_j), rec_t, atol=2e-4 * s,
                                   rtol=0)
        sf = max(np.abs(pf_t).max(), 1.0)
        np.testing.assert_allclose(np.asarray(pf_j), pf_t, atol=2e-4 * sf,
                                   rtol=0)


def _seeded_codec20():
    """Reference HCodec-2.0 Codec at the shipped large_12.5hz config
    (conf/large_12.5hz_config.yaml)."""
    rl.load_hcodec20()
    codec_mod = importlib.import_module("ref_hc20_vq.codec")
    torch.manual_seed(0)
    c = codec_mod.Codec(
        encoder_kwargs=dict(dim=1536, intermediate_dim=4608, dimension=512,
                            n_fft=1920, hop_length=960, convnext_layers=24,
                            transformer_layers=2, target_frame_rate=12.5,
                            causal=False),
        decoder_kwargs=dict(input_channels=1024, dim=1536,
                            intermediate_dim=4608, convnext_layers=32,
                            transformer_layers=2, n_fft=1920, hop_length=960,
                            target_frame_rate=12.5, causal=False),
        quantizer_kwargs=dict(dim=512, codebook_size=1024, num_quantizers=16,
                              decay=0.99, kmeans_init=True, kmeans_iters=50,
                              quantize_dropout=False),
        semantic_encoder_kwargs=dict(input_channels=768, encode_channels=1536,
                                     out_channels=512,
                                     channel_ratios=[1, 1, 1],
                                     strides=[2, 1, 2]),
        semantic_decoder_kwargs=dict(code_dim=512, output_channels=768,
                                     decode_channels=1536,
                                     channel_ratios=[1, 1, 1],
                                     strides=[2, 1, 2]),
    )
    gen = torch.Generator().manual_seed(1)
    rl.init_rvq_codebooks(c.quantizer, gen)
    rl.init_rvq_codebooks(c.semantic_quantizer, gen)
    c.eval()
    return c


class TestHCodec20Golden:
    @pytest.fixture(scope="class")
    def setup(self):
        from unified_audio_tpu.models.hcodec.codec import (
            HCodec, hcodec20_config)
        from unified_audio_tpu.utils.convert_hcodec import convert_hcodec20

        ref = _seeded_codec20()
        cfg = hcodec20_config()
        ours = HCodec(cfg)
        variables = convert_hcodec20(ref.state_dict(), cfg)
        return ref, ours, variables, cfg

    def test_encode_token_ids_identical_20(self, setup):
        """48 kHz STFT-domain encoder (complex STFT -> log-mag||phase/pi ->
        24 ConvNeXt -> transformer -> stride-4) + 16-deep RVQ."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(17)
        L = 3840 * 4
        wav = rng.standard_normal((1, L)).astype(np.float32) * 0.2
        feat = rng.standard_normal((1, L // 960, 768)).astype(np.float32)
        with torch.no_grad():
            ac_t, sem_t = ref.encode(
                torch.from_numpy(wav),
                torch.from_numpy(feat).transpose(1, 2))
        ac_j, sem_j = ours.apply(
            variables, jnp.asarray(wav[..., None]), jnp.asarray(feat),
            method="encode")
        np.testing.assert_array_equal(
            np.asarray(ac_j), ac_t.numpy().transpose(0, 2, 1))
        np.testing.assert_array_equal(
            np.asarray(sem_j), sem_t.numpy().transpose(0, 2, 1))

    def test_decode_waveform_matches_20(self, setup):
        """repeat-interleave x4 upsample decoder + ISTFT (1920/960)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(18)
        T = 4
        ac = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, T))
        sem = rng.integers(0, cfg.codebook_size, (1, cfg.num_quantizers, T))
        with torch.no_grad():
            wav_t = ref.decode(torch.from_numpy(ac), torch.from_numpy(sem))
        wav_j = ours.apply(
            variables, jnp.asarray(ac.transpose(0, 2, 1)),
            jnp.asarray(sem.transpose(0, 2, 1)), method="decode")
        wav_t = wav_t.numpy()
        wav_j = np.asarray(wav_j)
        assert wav_j.shape == wav_t.shape
        scale = max(np.abs(wav_t).max(), 1.0)
        np.testing.assert_allclose(wav_j, wav_t, atol=3e-4 * scale, rtol=0)


def _seeded_bicodec():
    """Reference BiCodec assembled at the SparkTTS-0.5B dims our
    BiCodecConfig mirrors (bicodec.py:83-131 load_from_checkpoint)."""
    rl.load_unise_model()
    fe = importlib.import_module(
        "ref_unise_model.bicodec.modules.encoder_decoder.feat_encoder")
    fd = importlib.import_module(
        "ref_unise_model.bicodec.modules.encoder_decoder.feat_decoder")
    wg = importlib.import_module(
        "ref_unise_model.bicodec.modules.encoder_decoder.wave_generator")
    fvq = importlib.import_module(
        "ref_unise_model.bicodec.modules.vq.factorized_vector_quantize")
    spk = importlib.import_module(
        "ref_unise_model.bicodec.modules.speaker.speaker_encoder")
    bc = importlib.import_module("ref_unise_model.bicodec.bicodec")
    torch.manual_seed(0)
    m = bc.BiCodec(
        mel_params=dict(sample_rate=16000, n_fft=1024, win_length=640,
                        hop_length=320, mel_fmin=10, mel_fmax=8000,
                        num_mels=128),
        encoder=fe.Encoder(input_channels=1024, vocos_dim=384,
                           vocos_intermediate_dim=2048, vocos_num_layers=12,
                           out_channels=1024, sample_ratios=[1, 1]),
        decoder=wg.WaveGenerator(input_channel=1024, channels=1536,
                                 rates=[8, 5, 4, 2],
                                 kernel_sizes=[16, 11, 8, 4]),
        quantizer=fvq.FactorizedVectorQuantize(
            input_dim=1024, codebook_size=8192, codebook_dim=8,
            commitment=0.25),
        speaker_encoder=spk.SpeakerEncoder(
            input_dim=128, out_dim=1024, latent_dim=128, token_num=32,
            fsq_levels=[4, 4, 4, 4, 4, 4], fsq_num_quantizers=1),
        prenet=fd.Decoder(input_channels=1024, vocos_dim=384,
                          vocos_intermediate_dim=2048, vocos_num_layers=12,
                          out_channels=1024, condition_dim=1024,
                          sample_ratios=[1, 1]),
        postnet=fd.Decoder(input_channels=1024, vocos_dim=384,
                           vocos_intermediate_dim=2048, vocos_num_layers=12,
                           out_channels=1024, sample_ratios=[1, 1]),
    )
    m.eval()
    return m


class TestBiCodecGolden:
    @pytest.fixture(scope="class")
    def setup(self):
        from unified_audio_tpu.models.bicodec.bicodec import (
            BiCodec, BiCodecConfig)
        from unified_audio_tpu.utils.convert_bicodec import convert_bicodec

        ref = _seeded_bicodec()
        cfg = BiCodecConfig()
        ours = BiCodec(cfg)
        variables = convert_bicodec(ref.state_dict(), cfg)
        return ref, ours, variables, cfg

    def test_semantic_tokens_identical(self, setup):
        """feat -> VocosBackbone encoder -> FVQ cosine NN tokenize."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(21)
        feat = rng.standard_normal((2, 50, 1024)).astype(np.float32)
        with torch.no_grad():
            sem_t = ref.get_semantic_tokens({"feat": torch.from_numpy(feat)})
        sem_j = ours.apply(
            variables, jnp.asarray(feat),
            method=lambda m, f: m.quantizer.tokenize(m.encoder(f)))
        np.testing.assert_array_equal(np.asarray(sem_j), sem_t.numpy())

    def test_global_tokens_identical(self, setup):
        """mel -> ECAPA -> Perceiver -> ResidualFSQ tokenize. Both sides
        consume the same mel input (the mel transform itself is covered by
        test_dsp)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(22)
        mel = np.abs(rng.standard_normal((2, 48, 128))).astype(np.float32)
        with torch.no_grad():
            # reference speaker path takes (B, T, n_mels)
            glob_t = ref.speaker_encoder.tokenize(torch.from_numpy(mel))
        glob_j = ours.apply(
            variables, jnp.asarray(mel),
            method=lambda m, x: m.speaker_encoder.tokenize(x))
        # reference (B, nq, token_num); ours (B, token_num, nq)
        np.testing.assert_array_equal(
            np.asarray(glob_j), glob_t.numpy().transpose(0, 2, 1))

    def test_detokenize_waveform_matches(self, setup):
        """semantic+global codes -> prenet(AdaLN) -> WaveGenerator vocoder."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(23)
        sem = rng.integers(0, cfg.codebook_size, (1, 50))
        glob = rng.integers(0, int(np.prod(cfg.fsq_levels)), (1, 32, 1))
        with torch.no_grad():
            wav_t = ref.detokenize(
                torch.from_numpy(sem),
                torch.from_numpy(glob.transpose(0, 2, 1)))
        wav_j = ours.apply(
            variables, jnp.asarray(sem), jnp.asarray(glob),
            method="detokenize")
        wav_t = wav_t.numpy()[:, 0]
        wav_j = np.asarray(wav_j)
        assert wav_j.shape == wav_t.shape
        scale = max(np.abs(wav_t).max(), 1.0)
        np.testing.assert_allclose(wav_j, wav_t, atol=3e-4 * scale, rtol=0)


def _seeded_llm_sft():
    """Reference LLM_SFT at the shipped UniSE config
    (conf/config.yaml:131-157; dropout 0 for determinism)."""
    rl.load_unise_model()
    sft_mod = importlib.import_module("ref_unise_model.llm.llm_sft")
    torch.manual_seed(0)
    m = sft_mod.LLM_SFT(
        num_tasks=3, task_map={"se": 0, "tse": 1, "rtse": 2}, feats_dim=768,
        llm_base_config=dict(
            cond_dim=80, global_size=4096, semantic_size=8192,
            hidden_size=512, num_layers=12, num_attention_heads=8,
            dropout_p=0.0, max_position_embeddings=4096,
            label_smoothing=0.1,
            conformer_params={
                "num_layers": 6, "dim": 512, "heads": 8, "dim_head": 64,
                "depthwise_conv_kernel_size": 31, "ff_mult": 4,
                "dropout": 0.1, "qk_norm": None, "pe_attn_head": 1,
            }))
    rl.wrap_decoder_layers(m)
    m.eval()
    return m


class TestLLMSFTGolden:
    @pytest.fixture(scope="class")
    def setup(self):
        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.models.lm.sft import LLMSFT
        from unified_audio_tpu.utils.convert import convert_custom_llama

        ref = _seeded_llm_sft()
        cfg = LlamaConfig()
        ours = LLMSFT(cfg)
        variables = convert_custom_llama(ref.state_dict(), cfg)
        return ref, ours, variables, cfg

    def test_sft_forward_loss_matches(self, setup):
        """Full SFT forward: prompt assembly + 12-layer Llama + label-smoothed
        KL loss + accuracy (llm_sft.py:37-89)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(31)
        b, t = 2, 20
        enroll = rng.standard_normal((b, 15, 768)).astype(np.float32)
        mix = rng.standard_normal((b, t, 768)).astype(np.float32)
        gids = rng.integers(0, cfg.global_size, (b, 32))
        sids = rng.integers(0, cfg.semantic_size, (b, t))
        enroll_mel = np.zeros((b, 15, 80), np.float32)  # gates the branch
        mix_mel = np.zeros((b, t, 80), np.float32)  # only size(0) is read
        with torch.no_grad():
            loss_t, acc_t = ref(
                "tse", torch.from_numpy(enroll_mel),
                torch.from_numpy(enroll), torch.from_numpy(mix_mel),
                torch.from_numpy(mix), torch.from_numpy(gids),
                torch.from_numpy(sids))
        loss_j, acc_j = ours.apply(
            variables, 1, jnp.asarray(enroll), jnp.asarray(mix),
            jnp.asarray(gids), jnp.asarray(sids))
        np.testing.assert_allclose(float(loss_j), float(loss_t), atol=2e-4)
        np.testing.assert_allclose(float(acc_j), float(acc_t), atol=1e-6)

    def test_greedy_generate_identical(self, setup):
        """Two-phase AR decode, greedy: identical global AND semantic token
        IDs, including the 33rd-global-token discard quirk
        (llm_sft.py:137-164)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(32)
        b, t = 1, 12
        mix = rng.standard_normal((b, t, 768)).astype(np.float32)
        mel = np.zeros((b, t, 80), np.float32)  # only size(1) is read
        with torch.no_grad():
            g_t, s_t = ref.generate(
                "se", None, None, torch.from_numpy(mel),
                torch.from_numpy(mix), do_sample=False)
        # mix_mel gates nothing in 'se'; enroll_mel=None skips the branch
        g_j, s_j = ours.apply(
            variables, 0, None, jnp.asarray(mix),
            jax.random.PRNGKey(0), semantic_length=t, do_sample=False,
            method="generate")
        np.testing.assert_array_equal(np.asarray(g_j), g_t.numpy())
        np.testing.assert_array_equal(np.asarray(s_j), s_t.numpy())


def _seeded_codec15():
    """Reference HCodec-1.5 adaptive Codec at the shipped
    conf/config_adaptive_v3.yaml dims."""
    rl.load_hcodec15()
    codec_mod = importlib.import_module("ref_hc15_vq.codec_adaptive")
    torch.manual_seed(0)
    agg = dict(dim=512, in_out_dim=512, num_heads=8, num_layers=32,
               dim_feedforward=2048, causal=False,
               use_mean_pooling_init=True, context_frames=16)
    c = codec_mod.Codec(
        encoder_kwargs={
            "encoder": dict(
                causal=False, n_residual_layers=1, norm="weight_norm",
                pad_mode="reflect", lstm=6, dimension=512, channels=1,
                n_filters=32, ratios=[2, 4, 5, 8], activation="ELU",
                kernel_size=7, residual_kernel_size=3, last_kernel_size=7,
                dilation_base=2, true_skip=False, compress=2,
                use_transformer=True),
            "semantic_encoder": dict(
                input_channels=1024, encode_channels=1024, out_channels=512,
                channel_ratios=[1, 1], strides=[2, 1]),
        },
        decoder_kwargs={
            "decoder": dict(input_channels=1024, dim=1024,
                            intermediate_dim=2304),
            "semantic_decoder": dict(
                code_dim=512, output_channels=1024, decode_channels=1024,
                channel_ratios=[1, 1], strides=[2, 1]),
        },
        quantizer_kwargs={
            "quantizer": dict(dim=512, codebook_size=1024, num_quantizers=4,
                              decay=0.99, kmeans_init=True, kmeans_iters=50,
                              quantize_dropout=True),
            "semantic_quantizer": dict(
                dim=512, codebook_size=1024, num_quantizers=4, decay=0.99,
                kmeans_init=True, kmeans_iters=50, quantize_dropout=True),
        },
        adaptive_kwargs=dict(
            training=False, use_similarity_alignment=True,
            use_dynamic_similarity_threshold=False,
            infer_using_dynamic_threshold=False,
            similarity_threshold=0.7, similarity_threshold_lower=0.7,
            similarity_threshold_upper=1.0, max_tokens_per_group=8,
            manual_threshold=None, use_query_token_aggregator=True,
            aggregators={"semantic_aggregator": dict(agg),
                         "acoustic_aggregator": dict(agg)},
            use_bottleneck_transformer=True,
            transformer_kwargs=dict(
                d_model=1024, num_heads=8, num_layers=32, causal=False,
                layer_scale=0.01, context=16, conv_layout=True,
                max_period=10000, gating="none", norm="layer_norm",
                positional_embedding="rope", dim_feedforward=2048,
                input_dimension=1024, output_dimensions=[1024]),
        ),
    )
    gen = torch.Generator().manual_seed(1)
    rl.init_rvq_codebooks(c.quantizer, gen)
    rl.init_rvq_codebooks(c.semantic_quantizer, gen)
    c.eval()
    return c


class TestHCodec15Golden:
    @pytest.fixture(scope="class")
    def setup(self):
        from unified_audio_tpu.models.hcodec.adaptive import (
            AdaptiveHCodec, adaptive15_config)
        from unified_audio_tpu.utils.convert_hcodec import convert_hcodec15

        ref = _seeded_codec15()
        cfg = adaptive15_config()
        ours = AdaptiveHCodec(cfg)
        variables = convert_hcodec15(ref.state_dict(), cfg)
        return ref, ours, variables, cfg

    def test_encode_token_ids_identical_15(self, setup):
        """Adaptive encode: similarity segmentation + interleaved query
        aggregation + RVQ + length injection — identical injected code
        indices (codec_adaptive.py:149-178)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(41)
        T = 12
        wav = rng.standard_normal((1, 640 * T)).astype(np.float32) * 0.2
        feat = rng.standard_normal((1, 2 * T, 1024)).astype(np.float32)
        thr = 0.7
        with torch.no_grad():
            ret = ref.encode(torch.from_numpy(wav)[:, None],
                             torch.from_numpy(feat).transpose(1, 2),
                             threshold=thr)
        ac_t = ret["acoustic_codes"].numpy()  # (1, nq, nG)
        sem_t = ret["semantic_codes"].numpy()
        ng = ac_t.shape[-1]
        assert 1 <= ng <= T
        ac_j, sem_j = ours.apply(
            variables, jnp.asarray(wav[..., None]), jnp.asarray(feat),
            thr, method="encode")
        ac_j = np.asarray(ac_j)  # (1, G=T, nq), -1 padded
        sem_j = np.asarray(sem_j)
        # same group count: padding is -1
        assert (ac_j[0, :, 0] >= 0).sum() == ng
        np.testing.assert_array_equal(
            ac_j[:, :ng].transpose(0, 2, 1), ac_t)
        np.testing.assert_array_equal(
            sem_j[:, :ng].transpose(0, 2, 1), sem_t)

    def test_decode_waveform_matches_15(self, setup):
        """Length extraction + de-aggregation + 32-layer Mimi bottleneck +
        ConvNeXt/ISTFT decode (codec_adaptive.py:180-199)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(42)
        T = 10
        # build valid length-injected codes: lengths summing to T
        lengths = [3, 1, 4, 2]
        nq = cfg.base.num_quantizers
        cb = cfg.base.codebook_size
        plain = rng.integers(0, cb, (1, nq, len(lengths)))
        inj = (np.asarray(lengths)[None, None, :] - 1) * cb + plain
        with torch.no_grad():
            wav_t = ref.decode(torch.from_numpy(inj),
                               torch.from_numpy(inj.copy())).numpy()
        pad = np.full((1, T - len(lengths), nq), -1, np.int64)
        inj_j = np.concatenate([inj.transpose(0, 2, 1), pad], axis=1)
        wav_j = np.asarray(ours.apply(
            variables, jnp.asarray(inj_j), jnp.asarray(inj_j.copy()),
            method="decode"))
        assert wav_j.shape == wav_t.shape
        scale = max(np.abs(wav_t).max(), 1.0)
        np.testing.assert_allclose(wav_j, wav_t, atol=3e-4 * scale, rtol=0)


def _seeded_flexicodec():
    """Reference FlexiCodec (modeling_flexicodec.py:97) at its in-repo
    default dims, DualCodec mode (use_similarity_alignment=False), the
    funasr teacher stubbed out (goldens feed semantic_repr directly)."""
    rl.load_hcodec15()
    fx = importlib.import_module("adaptive.modeling_flexicodec")
    torch.manual_seed(0)
    m = fx.FlexiCodec(
        encoder_dim=64, encoder_rates=[2, 4, 8, 8], latent_dim=None,
        decoder_dim=1536, decoder_rates=[8, 8, 4, 2], n_codebooks=9,
        codebook_size=1024, codebook_dim=8, sample_rate=24000,
        convnext_dim=768, convnext_layers=4,
        decode_semantic_for_codec=True, is_causal=False,
        semantic_downsample_factor=2, semantic_model_type="sensevoice",
        use_similarity_alignment=False, use_query_token_aggregator=False,
        use_bottleneck_transformer=False)
    m.eval()
    return m


class TestFlexiCodecGolden:
    @pytest.fixture(scope="class")
    def setup(self):
        from unified_audio_tpu.models.hcodec.flexicodec import (
            FlexiCodec, FlexiCodecConfig)
        from unified_audio_tpu.utils.convert_hcodec import convert_flexicodec

        ref = _seeded_flexicodec()
        cfg = FlexiCodecConfig(ssl_dim=512)  # sensevoice sets ssl_dim=512
        ours = FlexiCodec(cfg)
        variables = convert_flexicodec(ref.state_dict(), cfg)
        return ref, ours, variables, cfg

    def test_encode_token_ids_identical_flexi(self, setup):
        """DualCodec encode: DAC encoder + ConvNeXt/FSQ semantic stream +
        residual-coupled acoustic RVQ (forward_features encode_only branch,
        modeling_flexicodec.py:737-769)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(51)
        T = 8
        wav = rng.standard_normal((1, cfg.hop_length * T)).astype(
            np.float32) * 0.2
        sem = rng.standard_normal((1, 2 * T, 512)).astype(np.float32)
        with torch.no_grad():
            ret = ref.forward_features(
                torch.from_numpy(wav)[:, None], cfg.sample_rate,
                semantic_repr=torch.from_numpy(sem).transpose(1, 2),
                encode_only=True)
        sem_t = ret["semantic_codes"].numpy()  # (1, 1, T)
        ac_t = ret["acoustic_codes"].numpy()  # (1, nq, T)
        ac_j, sem_j = ours.apply(
            variables, jnp.asarray(wav), jnp.asarray(sem), method="encode")
        np.testing.assert_array_equal(
            np.asarray(sem_j).transpose(0, 2, 1), sem_t)
        np.testing.assert_array_equal(
            np.asarray(ac_j).transpose(0, 2, 1), ac_t)

    def test_decode_waveform_matches_flexi(self, setup):
        """decode_from_codes: FSQ -> ConvNeXt decoder -> + DAC RVQ ->
        DAC generator (modeling_flexicodec.py:470-515, dac_model.py:313)."""
        ref, ours, variables, cfg = setup
        rng = np.random.default_rng(52)
        T = 8
        ac = rng.integers(0, cfg.codebook_size, (1, cfg.n_codebooks, T))
        sem = rng.integers(0, int(np.prod(cfg.fsq_levels)), (1, 1, T))
        with torch.no_grad():
            wav_t = ref.decode_from_codes(
                torch.from_numpy(sem), torch.from_numpy(ac)).numpy()
        wav_j = np.asarray(ours.apply(
            variables, jnp.asarray(ac.transpose(0, 2, 1)),
            jnp.asarray(sem.transpose(0, 2, 1)), method="decode"))
        wav_t = wav_t[:, 0]
        assert wav_j.shape == wav_t.shape
        scale = max(np.abs(wav_t).max(), 1.0)
        np.testing.assert_allclose(wav_j, wav_t, atol=3e-4 * scale, rtol=0)
