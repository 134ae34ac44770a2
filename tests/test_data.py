"""Data pipeline tests: simulator distortions, wav IO, SCP loader + iterator."""
import numpy as np
import pytest

from unified_audio_tpu.data import simulation
from unified_audio_tpu.data.audio_io import read_wav, write_wav
from unified_audio_tpu.data.data_module import TrainDataIterator, WaveInfo


class TestSimulation:
    def test_detect_non_silence(self, rng):
        x = np.zeros((1, 16000), np.float32)
        x[:, 4000:8000] = rng.standard_normal((1, 4000)).astype(np.float32)
        mask = simulation.detect_non_silence(x)
        assert mask.shape == x.shape
        assert mask[:, 5000:7000].all()
        assert not mask[:, :2000].any()

    def test_mix_noise_snr(self, rng):
        g = np.random.default_rng(0)
        speech = rng.standard_normal((1, 16000)).astype(np.float32)
        noise = rng.standard_normal((1, 16000)).astype(np.float32)
        noisy = simulation.mix_noise(speech, noise, snr=0.0, rng=g)
        resid = noisy - speech
        snr = 20 * np.log10(speech.std() / resid.std())
        assert abs(snr) < 1.0  # ~0 dB

    def test_bandwidth_limitation(self, rng):
        t = np.arange(16000) / 16000
        x = (np.sin(2 * np.pi * 1000 * t) + np.sin(2 * np.pi * 7000 * t))[None]
        y = simulation.bandwidth_limitation(x.astype(np.float32), 16000, 4000)
        assert y.shape == x.shape
        spec = np.abs(np.fft.rfft(y[0]))
        freqs = np.fft.rfftfreq(16000, 1 / 16000)
        # 7 kHz component removed, 1 kHz survives
        assert spec[np.argmin(np.abs(freqs - 7000))] < 0.05 * spec[
            np.argmin(np.abs(freqs - 1000))]

    def test_clipping(self, rng):
        x = rng.standard_normal((1, 8000)).astype(np.float32)
        y = simulation.clipping(x, 0.05, 0.95)
        assert y.max() <= np.quantile(x, 0.95) + 1e-6
        assert y.min() >= np.quantile(x, 0.05) - 1e-6

    def test_packet_loss(self):
        g = np.random.default_rng(0)
        idx = simulation.packet_loss_indices(80000, 16000, 20, 0.2, 5, g)
        assert len(idx) > 0
        x = np.ones((1, 80000), np.float32)
        y = simulation.apply_packet_loss(x, 16000, idx, 20)
        assert (y == 0).sum() > 0

    @pytest.mark.parametrize("mode", ["se", "tse"])
    def test_full_pipeline(self, rng, mode):
        g = np.random.default_rng(1)
        speech = rng.standard_normal((1, 32000)).astype(np.float32) * 0.1
        interf = (rng.standard_normal((1, 32000)).astype(np.float32) * 0.1
                  if mode == "tse" else None)
        noise = rng.standard_normal((1, 16000)).astype(np.float32) * 0.05
        rir = np.zeros((1, 4000), np.float32)
        rir[0, 100] = 1.0
        rir[0, 500] = 0.3
        noisy, speech_out, interf_out = simulation.simulate_data(
            mode, speech, interf, noise, rir, 16000, rng=g
        )
        assert noisy.shape == speech_out.shape == (1, 32000)
        assert np.max(np.abs(noisy)) <= 0.99 + 1e-5
        if mode == "tse":
            assert interf_out is not None


class TestAudioIO:
    def test_roundtrip(self, tmp_path, rng):
        x = (rng.standard_normal(16000) * 0.2).astype(np.float32)
        p = tmp_path / "t.wav"
        write_wav(p, x, 16000)
        y, fs = read_wav(p)
        assert fs == 16000 and y.shape == (1, 16000)
        np.testing.assert_allclose(y[0], x, atol=1e-3)


class TestDataModule:
    def _make_scps(self, tmp_path, rng):
        for spk in ("a", "b", "c"):
            for i in range(2):
                write_wav(tmp_path / f"{spk}{i}.wav",
                          rng.standard_normal(24000).astype(np.float32) * 0.2,
                          16000)
        write_wav(tmp_path / "noise.wav",
                  rng.standard_normal(16000).astype(np.float32) * 0.1, 16000)
        rir = np.zeros(2000, np.float32)
        rir[50] = 1.0
        write_wav(tmp_path / "rir.wav", rir, 16000)

        speech_scp = tmp_path / "speech.scp"
        speech_scp.write_text("".join(
            f"{spk}{i} spk_{spk} {tmp_path}/{spk}{i}.wav\n"
            for spk in ("a", "b", "c") for i in range(2)
        ))
        noise_scp = tmp_path / "noise.scp"
        noise_scp.write_text(f"n0 16000 0 16000 {tmp_path}/noise.wav\n")
        rir_scp = tmp_path / "rir.scp"
        rir_scp.write_text(f"r0 {tmp_path}/rir.wav\n")
        return speech_scp, noise_scp, rir_scp

    def test_waveinfo_parse(self):
        w = WaveInfo.parse("u1 spk3 /x/y.wav", "speech")
        assert w.spk == "spk3" and w.path == "/x/y.wav"
        n = WaveInfo.parse("n1 16000 8000 32000 /n.wav", "noise")
        assert n.fs == 16000 and n.offset == 0.5 and n.duration == 2.0

    def test_iterator_batches(self, tmp_path, rng):
        scps = self._make_scps(tmp_path, rng)
        it = TrainDataIterator(
            *scps, batch_size=2, cut_duration=1.0, enroll_duration=1.0,
            num_workers=2, samples_per_epoch=8, seed=0,
            process_index=0, process_count=1,
        )
        batches = list(it)
        assert len(batches) == 4
        for mode, enroll, mix, speech, interf, fs, lens, names in batches:
            assert mode in ("se", "tse", "rtse")
            assert mix.shape == (2, 16000) and speech.shape == (2, 16000)
            if mode != "se":
                assert enroll.shape == (2, 16000)
                assert interf is not None
            assert len(names) == 2

    def test_rank_sharding(self, tmp_path, rng):
        scps = self._make_scps(tmp_path, rng)
        it = TrainDataIterator(
            *scps, batch_size=2, samples_per_epoch=16,
            process_index=0, process_count=4,
        )
        assert len(it) == 2  # 16 // (4 * 2)


class TestDevicePrefetcher:
    def test_order_content_and_passthrough(self):
        import jax
        import numpy as np

        from unified_audio_tpu.data.data_module import DevicePrefetcher

        batches = [("se", None, np.full((2, 4), i, np.float32), [f"n{i}"])
                   for i in range(5)]
        out = list(DevicePrefetcher(iter(batches), depth=2))
        assert len(out) == 5
        for i, (mode, enroll, arr, names) in enumerate(out):
            assert mode == "se" and enroll is None and names == [f"n{i}"]
            assert isinstance(arr, jax.Array)
            np.testing.assert_array_equal(np.asarray(arr), batches[i][2])

    def test_empty_iterator(self):
        from unified_audio_tpu.data.data_module import DevicePrefetcher

        assert list(DevicePrefetcher(iter([]))) == []


class TestWatchdog:
    def test_call_with_timeout(self):
        import time
        from unified_audio_tpu.utils.watchdog import TimeoutError_, call_with_timeout

        assert call_with_timeout(lambda x: x + 1, 1.0, 41) == 42
        with pytest.raises(TimeoutError_):
            call_with_timeout(time.sleep, 0.1, 5.0)
        with pytest.raises(ValueError):
            call_with_timeout(lambda: (_ for _ in ()).throw(ValueError("x")), 1.0)

    def test_watchdog_detects_stall(self):
        import time
        from unified_audio_tpu.utils.watchdog import Watchdog

        events = []
        with Watchdog(on_stall=lambda n, a: events.append(n),
                      poll_interval=0.05) as wd:
            hb = wd.register("producer", limit_seconds=0.1)
            hb.beat()
            time.sleep(0.4)  # no beats -> stall fires
        assert "producer" in events
        assert wd.stalls["producer"] >= 1


def test_metrics_logger(tmp_path):
    import json as _json
    from unified_audio_tpu.utils.logging import MetricsLogger

    p = tmp_path / "m.jsonl"
    with MetricsLogger(p, echo=False) as log:
        log.log(1, loss=2.5, acc=0.5)
        log.log(2, loss=2.0, acc=0.6)
    lines = [_json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[1]["loss"] == 2.0


class TestTokenCorpus:
    """Pretraining token-corpus pipeline (the data driver the reference
    omits for CustomLlamaModel.forward, llm.py:107-147)."""

    def _make_shards(self, tmp_path, rng, n_shards=2, per_shard=8):
        from unified_audio_tpu.data.token_corpus import write_token_shard

        paths = []
        for si in range(n_shards):
            utts = []
            for i in range(per_shard):
                g = rng.integers(0, 64, 4)
                s = rng.integers(0, 128, int(rng.integers(10, 40)))
                utts.append((g, s))
            p = tmp_path / f"tokens_{si:05d}.npz"
            write_token_shard(p, utts)
            paths.append(p)
        return paths

    def test_iterator_shapes_and_ranges(self, tmp_path, rng):
        from unified_audio_tpu.data.token_corpus import TokenCorpusIterator

        paths = self._make_shards(tmp_path, rng)
        it = iter(TokenCorpusIterator(paths, batch_size=4, semantic_len=16))
        for _ in range(6):
            g, s, cond = next(it)
            assert g.shape == (4, 4) and s.shape == (4, 16)
            assert cond is None
            assert g.dtype == np.int32 and s.dtype == np.int32
            assert 0 <= s.min() and s.max() < 128

    def test_process_sharding_disjoint(self, tmp_path, rng):
        from unified_audio_tpu.data.token_corpus import TokenCorpusIterator

        paths = self._make_shards(tmp_path, rng, n_shards=4)
        a = TokenCorpusIterator(paths, 2, process_index=0, process_count=2)
        b = TokenCorpusIterator(paths, 2, process_index=1, process_count=2)
        assert set(a.paths).isdisjoint(b.paths)
        assert set(a.paths) | set(b.paths) == {str(p) for p in paths}

    def test_feeds_pretrain_trainer(self, tmp_path, rng):
        from unified_audio_tpu.data.token_corpus import TokenCorpusIterator
        from unified_audio_tpu.models.lm.llama import LlamaConfig
        from unified_audio_tpu.train.pretrain import PretrainTrainer

        import jax

        paths = self._make_shards(tmp_path, rng)
        cfg = LlamaConfig(global_size=64, semantic_size=128, hidden_size=32,
                          num_layers=2, num_heads=4)
        tr = PretrainTrainer(cfg, jax.random.PRNGKey(0))
        it = iter(TokenCorpusIterator(paths, batch_size=2, semantic_len=12))
        losses = []
        for _ in range(3):
            g, s, cond = next(it)
            loss, acc = tr.train_step(g, s, cond)
            losses.append(float(loss))
        assert all(np.isfinite(l) for l in losses)

    def test_tokenize_corpus_roundtrip(self, tmp_path, rng):
        from unified_audio_tpu.data.token_corpus import (
            TokenCorpusIterator, tokenize_corpus,
        )

        class FakeTok:
            def tokenize(self, wav):
                t = wav.shape[-1] // 100
                return (np.arange(4)[None, None],
                        np.arange(t)[None] % 128)

        def fake_read(path):
            return np.zeros((1, 1500), np.float32), 16000

        wavs = [f"u{i}.wav" for i in range(5)]
        shards = tokenize_corpus(FakeTok(), wavs, tmp_path / "corpus",
                                 utterances_per_shard=2, read_wav=fake_read)
        assert len(shards) == 3
        it = iter(TokenCorpusIterator(shards, batch_size=2, semantic_len=8))
        g, s, _ = next(it)
        assert g.shape == (2, 4) and s.shape == (2, 8)
