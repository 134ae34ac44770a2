"""CLI plumbing tests with a tiny UniSE stack (full-size builds are minutes;
the tiny stack exercises the same code paths)."""
import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unified_audio_tpu.data.audio_io import write_wav


def tiny_unise():
    from unified_audio_tpu.models.bicodec.bicodec import BiCodecConfig
    from unified_audio_tpu.models.bicodec.tokenizer import BiCodecTokenizer
    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.ssl import wav2vec2 as ssl_mod
    from unified_audio_tpu.models.unise.model import UniSE, UniSEConfig

    bicodec_cfg = BiCodecConfig(
        ref_segment_duration=0.2,
        feat_dim=32, vocos_dim=32, vocos_intermediate_dim=64,
        vocos_num_layers=1, latent_dim=32, codebook_size=64, codebook_dim=8,
        spk_out_dim=32, spk_latent_dim=16, token_num=4, fsq_levels=(4, 4, 4),
        num_mels=32, mel_n_fft=256, mel_win=160, mel_hop=80,
        wave_channels=32, wave_rates=(8, 5, 4, 2), wave_kernels=(16, 11, 8, 4),
    )
    ssl_tiny = ssl_mod.SSLConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=32,
        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )
    wavlm_tiny = ssl_mod.SSLConfig(
        hidden_size=24, num_layers=2, num_heads=4, intermediate_size=32,
        conv_dim=(16,) * 7, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, use_rel_pos_bias=True,
        num_buckets=32, max_distance=80,
    )
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    tok = BiCodecTokenizer.from_random(k1, bicodec_cfg, ssl_tiny)
    wavlm = ssl_mod.Wav2Vec2Model(wavlm_tiny)
    wavlm_vars = wavlm.init(k2, jnp.zeros((1, 16320)))
    cfg = UniSEConfig(
        segment_seconds=0.4, feats_dim=24, global_tokens=4,
        llm=LlamaConfig(global_size=64, semantic_size=64, hidden_size=32,
                        num_layers=2, num_heads=4),
    )
    return UniSE(cfg, tok, wavlm_tiny, wavlm_vars, rng={"params": k3})


class TestServeCLI:
    def test_serve_jsonl_roundtrip(self, tmp_path, rng, monkeypatch):
        from unified_audio_tpu import cli

        unise = tiny_unise()
        monkeypatch.setattr(cli, "_build_unise",
                            lambda seed=3407, ckpt=None: unise)

        wav = (0.2 * rng.standard_normal(9600)).astype(np.float32)
        write_wav(tmp_path / "mix.wav", wav, 16000)
        write_wav(tmp_path / "enroll.wav", wav, 16000)
        reqs = [
            {"task": "se", "mix": str(tmp_path / "mix.wav"),
             "output": str(tmp_path / "out_se.wav"), "do_sample": False},
            {"task": "tse", "mix": str(tmp_path / "mix.wav"),
             "enroll": str(tmp_path / "enroll.wav"),
             "output": str(tmp_path / "out_tse.wav"), "top_k": 5},
        ]
        req_file = tmp_path / "reqs.jsonl"
        req_file.write_text("\n".join(json.dumps(r) for r in reqs))

        cli.main(["serve", "--requests", str(req_file), "--slots", "2"])
        for r in reqs:
            out, fs = __import__(
                "unified_audio_tpu.data.audio_io", fromlist=["read_wav"]
            ).read_wav(r["output"])
            assert fs == 16000
            assert out.shape[-1] == 9600
            assert np.isfinite(out).all()

    def test_serve_ss_cascade(self, tmp_path, rng, monkeypatch):
        """An "ss" request runs the cascade through the shared pool and
        writes _s1/_s2, while a regular SE request rides the same run."""
        from unified_audio_tpu import cli

        unise = tiny_unise()
        monkeypatch.setattr(cli, "_build_unise",
                            lambda seed=3407, ckpt=None: unise)
        wav = (0.2 * rng.standard_normal(9600)).astype(np.float32)
        write_wav(tmp_path / "mix.wav", wav, 16000)
        reqs = [
            {"task": "ss", "mix": str(tmp_path / "mix.wav"),
             "output": str(tmp_path / "out_ss.wav"), "do_sample": False},
            {"task": "se", "mix": str(tmp_path / "mix.wav"),
             "output": str(tmp_path / "out_se.wav"), "do_sample": False},
        ]
        req_file = tmp_path / "reqs.jsonl"
        req_file.write_text("\n".join(json.dumps(r) for r in reqs))
        cli.main(["serve", "--requests", str(req_file), "--slots", "2"])

        from unified_audio_tpu.data.audio_io import read_wav

        for name in ("out_ss_s1.wav", "out_ss_s2.wav", "out_se.wav"):
            out, fs = read_wav(tmp_path / name)
            assert fs == 16000 and out.shape[-1] == 9600
            assert np.isfinite(out).all()

    def test_serve_validates_inputs(self, tmp_path):
        from unified_audio_tpu import cli

        with pytest.raises(SystemExit):
            cli.main(["serve", "--requests", str(tmp_path / "missing.jsonl")])
        bad = tmp_path / "bad.jsonl"
        bad.write_text(json.dumps({"task": "tse", "mix": "nope.wav",
                                   "output": "o.wav"}))
        with pytest.raises(SystemExit):
            cli.main(["serve", "--requests", str(bad)])


class TestTrainCodecCLI:
    def test_trains_on_synthetic_scp(self, tmp_path, rng, capsys):
        """train-codec runs END TO END on synthetic SCP data: GAN steps
        execute, JSONL metrics stream, a checkpoint lands on disk."""
        import yaml

        from unified_audio_tpu import cli

        wavdir = tmp_path / "wavs"
        wavdir.mkdir()
        lines = []
        for i in range(4):
            w = (0.2 * rng.standard_normal(8000)).astype(np.float32)
            p = wavdir / f"u{i}.wav"
            write_wav(p, w, 16000)
            lines.append(f"u{i} spk{i} {p}")
        scp = tmp_path / "speech.scp"
        scp.write_text("\n".join(lines) + "\n")

        cfg = {
            "model": "hcodec10",
            "codec": {"latent_dim": 64, "seanet_filters": 4,
                      "codebook_size": 32, "num_quantizers": 2,
                      "decoder_dim": 64, "decoder_intermediate_dim": 128,
                      "decoder_convnext_layers": 2,
                      "semantic_encode_channels": 64, "feat_dim": 16},
            "ssl": {"hidden_size": 16, "num_layers": 1, "num_heads": 4,
                    "intermediate_size": 16, "conv_dim": [8, 8, 8, 8, 8, 8, 8],
                    "num_conv_pos_embeddings": 16,
                    "num_conv_pos_embedding_groups": 4},
            "batch_size": 2,
            "segment_samples": 3200,
            "train": {"perceptual_start_step": 1},
            "dataset": {"domain_scps": {"speech": [str(scp)]},
                        "samples_per_epoch": 8, "num_workers": 1},
            "max_epochs": 1,
            "max_steps": 3,
            "log_every": 1,
            "save_every": 2,
            "ckpt_dir": str(tmp_path / "ck"),
        }
        cfg_path = tmp_path / "codec.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        class A:
            config = str(cfg_path)

        cli.cmd_train_codec(A())
        out = capsys.readouterr().out
        logs = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
        assert logs and "gen_loss" in logs[0]
        assert any(p.is_dir() for p in (tmp_path / "ck").iterdir())


@pytest.mark.slow
class TestCodecCkptWarmPath:
    """Weights-parity package warm check (VERDICT r4 #9): `codec --ckpt`
    must keep working end to end on a freshly EXPORTED random-weight
    torch checkpoint — exporter -> weights.pt -> CLI torch.load ->
    convert_hcodec10 -> tokenize/detokenize -> wav — so nothing rots
    before the released checkpoints become reachable."""

    def test_codec_ckpt_roundtrip(self, tmp_path, rng, capsys):
        import torch

        from unified_audio_tpu import cli
        from unified_audio_tpu.models.hcodec.codec import hcodec10_config
        from unified_audio_tpu.models.hcodec.tokenizer import HCodecTokenizer
        from unified_audio_tpu.utils.convert_hcodec import (
            export_hcodec10_state_dict)

        cfg = hcodec10_config()  # FULL reference dims: the CLI builds these
        tok = HCodecTokenizer.from_random(jax.random.PRNGKey(0), cfg)
        sd = {k: torch.as_tensor(np.asarray(v)) for k, v in
              export_hcodec10_state_dict(tok.codec_variables, cfg).items()}
        ck = tmp_path / "weights.pt"
        torch.save(sd, ck)

        wav = (0.1 * rng.standard_normal(8000)).astype(np.float32)
        write_wav(str(tmp_path / "in.wav"), wav, 16000)

        class A:
            model = "hcodec10"
            input = str(tmp_path / "in.wav")
            output = str(tmp_path / "out.wav")
            ckpt = str(ck)
            dtype = "float32"

        cli.cmd_codec(A())
        assert (tmp_path / "out.wav").exists()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        rec = json.loads(out)
        assert rec["model"] == "hcodec10"
        assert rec["acoustic_shape"][0] == 1 and rec["acoustic_shape"][1] > 0
