"""Native C++ loader tests (skipped when g++ is unavailable)."""
import numpy as np
import pytest

from unified_audio_tpu.data.audio_io import write_wav

native = pytest.importorskip("unified_audio_tpu.data.native_loader")

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no g++ toolchain"
)


@pytest.fixture
def wav_dir(tmp_path, rng):
    paths = []
    for i in range(3):
        p = tmp_path / f"{i}.wav"
        write_wav(p, rng.standard_normal(12000).astype(np.float32) * 0.2, 16000)
        paths.append(p)
    return paths


def test_wav_read_matches_python(wav_dir):
    from unified_audio_tpu.data.audio_io import read_wav

    x_native, sr1 = native.read_wav_native(wav_dir[0])
    x_py, sr2 = read_wav(wav_dir[0])
    assert sr1 == sr2 == 16000
    np.testing.assert_allclose(x_native, x_py[0], atol=1e-6)


def test_loader_batches(wav_dir):
    with native.NativeAudioLoader(wav_dir, crop_len=8000, batch=4,
                                  workers=2, seed=1) as loader:
        for _ in range(5):
            batch = loader.next()
            assert batch.shape == (4, 8000)
            assert np.isfinite(batch).all()
            assert np.abs(batch).max() > 0  # real audio, not zeros


def test_loader_wrap_pad_short_files(tmp_path, rng):
    p = tmp_path / "short.wav"
    write_wav(p, rng.standard_normal(1000).astype(np.float32) * 0.2, 16000)
    with native.NativeAudioLoader([p], crop_len=4000, batch=2,
                                  workers=1, seed=2) as loader:
        batch = loader.next()
        assert batch.shape == (2, 4000)
        # wrap padding repeats the 1000-sample file
        np.testing.assert_allclose(batch[0, :1000], batch[0, 1000:2000],
                                   atol=1e-6)
