"""Eval runner + domain-weighted loader tests."""
import numpy as np
import pytest
# whole-file slow tier: 80s serial on this box (/tmp/test_timings.txt round-5 capture); the fast tier
# (-m 'not golden and not slow') targets <10 min
pytestmark = pytest.mark.slow

import jax

from unified_audio_tpu.data.audio_io import write_wav
from unified_audio_tpu.data.hcodec_data import (
    DomainWeightedIterator, RoundRobinValIterator,
)
from unified_audio_tpu.eval.runner import EvalConfig, evaluate, iter_test_dir

from tests.test_unise import unise  # fixture


def _mkwavs(d, rng, n=2, t=8000):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        write_wav(d / f"utt{i}.wav",
                  rng.standard_normal(t).astype(np.float32) * 0.2, 16000)


class TestEvalRunner:
    def test_iter_test_dir(self, tmp_path, rng):
        _mkwavs(tmp_path / "noisy", rng)
        _mkwavs(tmp_path / "clean", rng)
        cfg = EvalConfig(mode="se", data_src_dir=str(tmp_path / "noisy"),
                         data_tgt_dir=str(tmp_path / "clean"))
        items = list(iter_test_dir(cfg))
        assert len(items) == 2
        name, src, tgt, enroll, fs = items[0]
        assert src.shape == (1, 8000) and tgt.shape == (1, 8000)
        assert enroll is None and fs == 16000

    def test_evaluate_se(self, tmp_path, rng, unise):
        _mkwavs(tmp_path / "noisy", rng, n=1)
        _mkwavs(tmp_path / "clean", rng, n=1)
        cfg = EvalConfig(
            mode="se", data_src_dir=str(tmp_path / "noisy"),
            data_tgt_dir=str(tmp_path / "clean"),
            save_enhanced=str(tmp_path / "out"), limit=1,
        )
        summary = evaluate(unise, cfg, jax.random.PRNGKey(0))
        assert summary["num_utts"] == 1
        assert "stoi" in summary and np.isfinite(summary["si_snr"])
        assert (tmp_path / "out" / "utt0.wav").exists()


class TestDomainWeighted:
    def _scps(self, tmp_path, rng):
        scps = {}
        for d in ("speech", "music", "audio"):
            _mkwavs(tmp_path / d, rng, n=2, t=20000)
            scp = tmp_path / f"{d}.scp"
            scp.write_text("".join(
                f"{d}{i} spk {tmp_path}/{d}/utt{i}.wav\n" for i in range(2)
            ))
            scps[d] = [str(scp)]
        return scps

    def test_batches_and_weights(self, tmp_path, rng):
        scps = self._scps(tmp_path, rng)
        it = DomainWeightedIterator(
            scps, domain_weights={"speech": 1.0, "music": 0.0, "audio": 0.0},
            batch_size=2, cut_seconds=0.5, samples_per_epoch=8, seed=0,
        )
        batches = list(it)
        assert len(batches) == 4
        for wav, domain in batches:
            assert wav.shape == (2, 8000)
            assert domain == "speech"  # zero-weight domains never sampled

    def test_round_robin_val(self, tmp_path, rng):
        scps = self._scps(tmp_path, rng)
        it = RoundRobinValIterator(scps, cut_seconds=0.5, limit_per_domain=2)
        domains = [d for _, d in it]
        assert domains == ["speech", "music", "audio"] * 2
