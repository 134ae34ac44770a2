"""SS cascade served through the engine (serve/cascade.py): greedy output
pinned token-for-token against the offline separate_ss cascade (reference
model/model.py:229-290), device-staged enrollment validation, and regular
traffic riding the phase-1 wave."""
import numpy as np
import pytest
# whole-file slow tier: 146s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from unified_audio_tpu.models.bicodec.bicodec import BiCodecConfig
from unified_audio_tpu.models.bicodec.tokenizer import BiCodecTokenizer
from unified_audio_tpu.models.lm.llama import LlamaConfig
from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
from unified_audio_tpu.models.unise.model import UniSE, UniSEConfig
from unified_audio_tpu.serve.cascade import SSCascadeRunner
from unified_audio_tpu.serve.engine import ContinuousBatchingEngine, Request


def tiny_bicodec_cfg():
    return BiCodecConfig(
        ref_segment_duration=0.2,
        feat_dim=32, vocos_dim=32, vocos_intermediate_dim=64,
        vocos_num_layers=1, latent_dim=32, codebook_size=64, codebook_dim=8,
        spk_out_dim=32, spk_latent_dim=16, token_num=4,
        fsq_levels=(4, 4, 4),
        num_mels=32, mel_n_fft=256, mel_win=160, mel_hop=80,
        wave_channels=32, wave_rates=(8, 5, 4, 2), wave_kernels=(16, 11, 8, 4),
    )


def tiny_ssl_cfg(hidden):
    return ssl_mod.SSLConfig(
        hidden_size=hidden, num_layers=2, num_heads=4, intermediate_size=32,
        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


@pytest.fixture(scope="module")
def unise():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tok = BiCodecTokenizer.from_random(
        k1, tiny_bicodec_cfg(), tiny_ssl_cfg(32)
    )
    wavlm_cfg = tiny_ssl_cfg(24)
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_cfg)
    wavlm_vars = wavlm.init(k2, jnp.zeros((1, 16320)))
    cfg = UniSEConfig(
        segment_seconds=0.4, feats_dim=24, global_tokens=4,
        llm=LlamaConfig(global_size=64, semantic_size=64, hidden_size=32,
                        num_layers=2, num_heads=4),
    )
    return UniSE(cfg, tok, wavlm_cfg, wavlm_vars, rng={"params": k3})


def make_engine(unise, **kw):
    kw.setdefault("num_slots", 2)
    kw.setdefault("block_size", 8)
    kw.setdefault("max_global", 4)
    kw.setdefault("max_semantic", 20)
    kw.setdefault("mix_buckets", (20,))
    return ContinuousBatchingEngine(unise.sft, unise.sft_params, **kw)


class TestSSCascade:
    def test_cascade_matches_offline(self, unise, rng):
        # 1.5 segments -> wrap-pad to 2: exercises the multi-segment fan-out
        wav = rng.standard_normal((1, 9600)).astype(np.float32)
        s1_off, s2_off = unise.separate_ss(wav)  # greedy

        eng = make_engine(unise)
        runner = SSCascadeRunner(eng, unise)
        req = runner.make(wav, uid=7, do_sample=False)
        assert req.seg_feats.shape[0] == 2
        results, extra = runner.run([req], jax.random.PRNGKey(5))
        assert extra == {}
        s1, s2 = runner.assemble(req, results[7])
        np.testing.assert_allclose(s1, s1_off, atol=1e-5)
        np.testing.assert_allclose(s2, s2_off, atol=1e-5)

    def test_extra_traffic_rides_phase1(self, unise, rng):
        wav = rng.standard_normal((1, 6400)).astype(np.float32)
        eng = make_engine(unise)
        runner = SSCascadeRunner(eng, unise)
        req = runner.make(wav, uid=3, do_sample=False)

        # a regular SE request sharing the phase-1 wave
        se_feats = rng.standard_normal((20, 24)).astype(np.float32)
        extra_req = Request(task_id=0, mix_feats=se_feats, global_length=4,
                            semantic_length=20, do_sample=False, uid=999)
        results, extra = runner.run([req], jax.random.PRNGKey(1),
                                    extra=[extra_req])
        assert set(results) == {3} and set(extra) == {999}

        # the rider's output equals its solo engine run
        eng2 = make_engine(unise)
        solo = eng2.run([extra_req], jax.random.PRNGKey(2))[999]
        np.testing.assert_array_equal(extra[999].global_ids, solo.global_ids)
        np.testing.assert_array_equal(extra[999].semantic_ids,
                                      solo.semantic_ids)

        # cascade output unaffected by the rider
        eng3 = make_engine(unise)
        solo_res, _ = SSCascadeRunner(eng3, unise).run(
            [req], jax.random.PRNGKey(1))
        for a, b in zip(results[3].s1 + results[3].s2,
                        solo_res[3].s1 + solo_res[3].s2):
            np.testing.assert_array_equal(a.global_ids, b.global_ids)
            np.testing.assert_array_equal(a.semantic_ids, b.semantic_ids)

    def test_unstaged_device_enroll_rejected(self, unise):
        eng = make_engine(unise)
        req = Request(task_id=1, mix_feats=np.zeros((20, 24), np.float32),
                      enroll_device_frames=20, global_length=4,
                      semantic_length=20, do_sample=False, uid=1)
        with pytest.raises(ValueError, match="never staged"):
            eng.run([req], jax.random.PRNGKey(0))

    def test_stage_request_contract(self, unise):
        eng = make_engine(unise)
        req = Request(task_id=1, mix_feats=np.zeros((20, 24), np.float32),
                      enroll_device_frames=20, global_length=4,
                      semantic_length=20, do_sample=False, uid=1)
        with pytest.raises(ValueError, match="no enroll_ref"):
            eng.stage_request(req)
        # both-enroll-forms rejected
        bad = Request(task_id=1, mix_feats=np.zeros((20, 24), np.float32),
                      enroll_feats=np.zeros((20, 24), np.float32),
                      enroll_device_frames=20, global_length=4,
                      semantic_length=20, uid=2)
        with pytest.raises(ValueError, match="excludes"):
            eng.validate(bad)

    def test_int8_wire_engine_rejected(self, unise):
        eng = make_engine(unise, feats_wire="int8")
        with pytest.raises(ValueError, match="bf16"):
            SSCascadeRunner(eng, unise)
