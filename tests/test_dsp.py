"""Golden tests for the DSP substrate vs torch (CPU) reference implementations."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from unified_audio_tpu.ops import dsp


def _torch_istft_same(spec_np, n_fft, hop, win_length):
    """Reference ISTFT-"same" re-derived from HCodec spectral_ops.py semantics."""
    spec = torch.from_numpy(spec_np)
    window = torch.hann_window(win_length)
    pad = (win_length - hop) // 2
    B, N, T = spec.shape
    ifft = torch.fft.irfft(spec, n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    output_size = (T - 1) * hop + win_length
    y = torch.nn.functional.fold(
        ifft, output_size=(1, output_size), kernel_size=(1, win_length), stride=(1, hop)
    )[:, 0, 0, pad:-pad]
    wsq = window.square().expand(1, T, -1).transpose(1, 2)
    env = torch.nn.functional.fold(
        wsq, output_size=(1, output_size), kernel_size=(1, win_length), stride=(1, hop)
    ).squeeze()[pad:-pad]
    return (y / env).numpy()


class TestSTFT:
    @pytest.mark.parametrize("n_fft,hop", [(640, 320), (1280, 320), (1920, 960)])
    def test_matches_torch_center(self, rng, n_fft, hop):
        x = rng.standard_normal((2, 16000)).astype(np.float32)
        ours = dsp.stft(jnp.asarray(x), n_fft, hop, center=True)
        ref = torch.stft(
            torch.from_numpy(x), n_fft, hop, win_length=n_fft,
            window=torch.hann_window(n_fft), center=True, onesided=True,
            return_complex=True, pad_mode="reflect",
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-4)

    def test_matches_torch_nocenter(self, rng):
        x = rng.standard_normal((2, 16000)).astype(np.float32)
        ours = dsp.stft(jnp.asarray(x), 640, 320, win_length=640, center=False)
        ref = torch.stft(
            torch.from_numpy(x), 640, 320, win_length=640,
            window=torch.hann_window(640), center=False, onesided=True,
            return_complex=True,
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-3, rtol=1e-4)


class TestISTFTSame:
    @pytest.mark.parametrize("n_fft,hop", [(1280, 320), (640, 320)])
    def test_matches_reference_fold(self, rng, n_fft, hop):
        T = 50
        spec = (
            rng.standard_normal((2, n_fft // 2 + 1, T))
            + 1j * rng.standard_normal((2, n_fft // 2 + 1, T))
        ).astype(np.complex64)
        ours = np.asarray(dsp.istft_same(jnp.asarray(spec), n_fft, hop))
        ref = _torch_istft_same(spec, n_fft, hop, n_fft)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)

    def test_roundtrip(self, rng):
        """stft(same-pad) -> istft_same reconstructs the signal."""
        n_fft, hop = 1280, 320
        x = rng.standard_normal((1, 32000)).astype(np.float32)
        side = (n_fft - hop) // 2
        xp = jnp.pad(jnp.asarray(x), [(0, 0), (side, side)])
        spec = dsp.stft(xp, n_fft, hop, center=False)
        y = np.asarray(dsp.istft_same(spec, n_fft, hop))
        assert y.shape[-1] == 32000
        np.testing.assert_allclose(y[:, hop:-hop], x[:, hop:-hop], atol=1e-3)


class TestMel:
    def test_fbank_shape_and_coverage(self):
        fb = np.asarray(dsp.melscale_fbanks(321, 0.0, 8000.0, 80, 16000))
        assert fb.shape == (321, 80)
        # every mel filter is nonempty, interior freq bins are covered
        assert (fb.sum(0) > 0).all()
        assert (fb[5:-5].sum(1) > 0).all()

    def test_slaney_norm(self):
        fb = np.asarray(
            dsp.melscale_fbanks(513, 10.0, 8000.0, 128, 16000, norm="slaney", mel_scale="slaney")
        )
        assert fb.shape == (513, 128)
        assert fb.max() < 0.2  # slaney norm scales peaks down

    def test_logmel_shape(self, rng):
        x = rng.standard_normal((2, 16000)).astype(np.float32)
        mel = dsp.stft_logmel(jnp.asarray(x), 640, 320, 640, 80)
        assert mel.shape == (2, 50, 80)

    def test_mel_spectrogram_shape(self, rng):
        x = rng.standard_normal((2, 16000)).astype(np.float32)
        m = dsp.mel_spectrogram(x, 16000, 1024, 640, 320, 10, 8000, 128)
        assert m.shape == (2, 128, 51)


class TestMDCT:
    def test_roundtrip(self, rng):
        x = rng.standard_normal((2, 4096)).astype(np.float32)
        c = dsp.mdct(jnp.asarray(x), frame_len=512, padding="same")
        y = np.asarray(dsp.imdct(c, padding="same"))
        assert y.shape[-1] == 4096
        np.testing.assert_allclose(y[:, 256:-256], x[:, 256:-256], atol=1e-3)


class TestResample:
    def test_48k_to_16k_tone(self):
        sr1, sr2 = 48000, 16000
        t = np.arange(sr1) / sr1
        x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)[None]
        y = np.asarray(dsp.resample(jnp.asarray(x), sr1, sr2))
        assert y.shape == (1, sr2)
        t2 = np.arange(sr2) / sr2
        ref = np.sin(2 * np.pi * 440.0 * t2).astype(np.float32)
        # ignore filter edge effects
        np.testing.assert_allclose(y[0, 100:-100], ref[100:-100], atol=5e-3)

    def test_identity(self, rng):
        x = rng.standard_normal((1, 1000)).astype(np.float32)
        y = dsp.resample(jnp.asarray(x), 16000, 16000)
        np.testing.assert_array_equal(np.asarray(y), x)


class TestOverlapAdd:
    def test_matches_fold(self, rng):
        frames = rng.standard_normal((3, 10, 8)).astype(np.float32)
        ours = np.asarray(dsp.overlap_add(jnp.asarray(frames), 4))
        ref = torch.nn.functional.fold(
            torch.from_numpy(frames).transpose(1, 2),
            output_size=(1, 9 * 4 + 8), kernel_size=(1, 8), stride=(1, 4),
        )[:, 0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)
