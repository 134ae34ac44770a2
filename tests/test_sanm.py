"""SenseVoice SAN-M teacher encoder: golden vs the documented torch twin.

The reference runs the frozen SenseVoiceSmall encoder in-line as FlexiCodec's
semantic teacher (QuarkAudio-HCodec/HCodec-1.5/adaptive/
modeling_flexicodec.py:54-95,122). funasr isn't in this image, so the twin in
tests/reference_loader.py reconstructs the public funasr architecture with
funasr's exact state-dict names; these tests pin the flax port + converter
against it — the same recipe as test_reference_golden.py.
"""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from unified_audio_tpu.models.ssl import sanm
from unified_audio_tpu.utils.convert import convert_sensevoice
from tests.reference_loader import SenseVoiceTorchTwin


def tiny_cfg(**kw):
    base = dict(input_size=24, output_size=16, attention_heads=2,
                linear_units=32, num_blocks=3, tp_blocks=2, kernel_size=5,
                sanm_shift=0, embed_vocab=16)
    base.update(kw)
    return sanm.SANMConfig(**base)


def _pair(cfg, seed=0):
    torch.manual_seed(seed)
    twin = SenseVoiceTorchTwin(cfg).eval()
    variables = convert_sensevoice(twin.state_dict(), cfg)
    return twin, variables


@pytest.mark.parametrize("seed", [0, 1])
def test_semantic_golden_tiny(seed, rng):
    cfg = tiny_cfg()
    twin, variables = _pair(cfg, seed)
    feats = rng.standard_normal((2, 9, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        want = twin.semantic(torch.from_numpy(feats)).numpy()
    got = sanm.SenseVoiceSemanticEncoder(cfg).apply(
        variables, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_semantic_golden_masked(rng):
    """Padded batch: masked rows match each row run alone at its true length
    (funasr masks the FSMN block and attention keys by sequence length)."""
    cfg = tiny_cfg()
    twin, variables = _pair(cfg, seed=3)
    lengths = np.array([9, 5], np.int32)
    feats = rng.standard_normal((2, 9, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        want = twin.semantic(torch.from_numpy(feats),
                             torch.from_numpy(lengths)).numpy()
    got = np.asarray(sanm.SenseVoiceSemanticEncoder(cfg).apply(
        variables, jnp.asarray(feats), jnp.asarray(lengths)))
    for b, ln in enumerate(lengths):
        np.testing.assert_allclose(got[b, :ln], want[b, :ln],
                                   atol=2e-4, rtol=1e-3)
    # masked batch == solo run at the true length
    solo = np.asarray(sanm.SenseVoiceSemanticEncoder(cfg).apply(
        variables, jnp.asarray(feats[1:, :5])))
    np.testing.assert_allclose(got[1, :5], solo[0], atol=2e-4, rtol=1e-3)


def test_layer_mean_selection(rng):
    """semantic_layer_idx list form: mean of trunk layers [lo, hi)."""
    cfg = tiny_cfg()
    twin, variables = _pair(cfg, seed=5)
    feats = rng.standard_normal((1, 7, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        x = twin.prepend_inputs(torch.from_numpy(feats))
        _, _, hiddens = twin.encoder(x)
        want = torch.stack(hiddens[1:3]).mean(0)[:, 4:].numpy()
    got = sanm.SenseVoiceSemanticEncoder(cfg, layer_mean=(1, 3)).apply(
        variables, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_encoder_outputs_shapes(rng, key):
    cfg = tiny_cfg()
    m = sanm.SANMEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((2, 6, cfg.input_size)),
                    jnp.float32)
    variables = m.init(key, x)
    enc_out, hidden_out, hiddens = m.apply(variables, x)
    assert enc_out.shape == (2, 6, cfg.output_size)
    assert hidden_out.shape == (2, 6, cfg.output_size)
    assert hiddens.shape == (cfg.num_blocks, 2, 6, cfg.output_size)


@pytest.mark.golden
def test_semantic_golden_full_dims(rng):
    """Full SenseVoiceSmall dims (50+20 blocks, 560->512) — the exact teacher
    FlexiCodec loads (modeling_flexicodec.py:122)."""
    cfg = sanm.sensevoice_small_config()
    twin, variables = _pair(cfg, seed=7)
    feats = rng.standard_normal((1, 12, cfg.input_size)).astype(np.float32)
    with torch.no_grad():
        want = twin.semantic(torch.from_numpy(feats)).numpy()
    got = np.asarray(sanm.SenseVoiceSemanticEncoder(cfg).apply(
        variables, jnp.asarray(feats)))
    # 70 pre-LN blocks of fp32 accumulation: scale-aware tolerance
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/QuarkAudio-HCodec/HCodec-1.5/adaptive/am.mvn"),
    reason="reference am.mvn not present")
def test_flexicodec_full_teacher_path(rng, key):
    """Raw audio -> exact funasr frontend -> ported SAN-M encoder ->
    FlexiCodec encode: the reference's in-line teacher path end-to-end
    (modeling_flexicodec.py:54-95), on a tiny SAN-M (real 560-d input)."""
    import jax
    from unified_audio_tpu.models.hcodec.flexicodec import (
        FlexiCodec, FlexiCodecConfig, match_frame_rate,
        sensevoice_teacher_semantic)

    am_mvn = "/root/reference/QuarkAudio-HCodec/HCodec-1.5/adaptive/am.mvn"
    sv_cfg = tiny_cfg(input_size=560, output_size=16)
    twin, sv_vars = _pair(sv_cfg, seed=11)
    wav = rng.standard_normal((1, 16000)).astype(np.float32) * 0.1

    sem = sensevoice_teacher_semantic(
        sv_vars, jnp.asarray(wav), am_mvn, config=sv_cfg, out_dim=32)
    assert sem.shape[-1] == 32            # tiled 16 -> ssl_dim
    assert sem.shape[1] == 17             # ceil(98 frames / 6) LFR rate

    fc_cfg = FlexiCodecConfig(
        encoder_dim=4, encoder_rates=(2, 4, 8, 8), latent_dim=32,
        decoder_dim=32, decoder_rates=(8, 8, 4, 2), n_codebooks=2,
        codebook_size=32, codebook_dim=4, ssl_dim=32, convnext_dim=16,
        convnext_layers=2, fsq_levels=(4, 4, 4), sample_rate=16000)
    fc = FlexiCodec(fc_cfg)
    sem = match_frame_rate(sem, 2 * (wav.shape[-1] // fc_cfg.hop_length))
    variables = fc.init(key, jnp.asarray(wav), sem, train=False)
    enc = jax.jit(lambda v, x, s: fc.apply(v, x, s, method="encode"))
    ac, sc = enc(variables, jnp.asarray(wav), sem)
    assert ac.shape[0] == 1 and sc.shape[0] == 1
