"""Tests for L1 blocks: LSTM vs torch, ConvNeXt vs torch, shape contracts."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from unified_audio_tpu.nn import blocks, recurrent, transformer


class TestLSTM:
    def test_matches_torch(self, rng):
        b, t, cin, h = 2, 17, 6, 10
        x = rng.standard_normal((b, t, cin)).astype(np.float32)
        ref_lstm = torch.nn.LSTM(cin, h, num_layers=2, batch_first=True)
        with torch.no_grad():
            ref, _ = ref_lstm(torch.from_numpy(x))
        params = {}
        for layer in range(2):
            params[f"w_ih_l{layer}"] = jnp.asarray(
                getattr(ref_lstm, f"weight_ih_l{layer}").detach().numpy().T
            )
            params[f"w_hh_l{layer}"] = jnp.asarray(
                getattr(ref_lstm, f"weight_hh_l{layer}").detach().numpy().T
            )
            params[f"b_ih_l{layer}"] = jnp.asarray(
                getattr(ref_lstm, f"bias_ih_l{layer}").detach().numpy()
            )
            params[f"b_hh_l{layer}"] = jnp.asarray(
                getattr(ref_lstm, f"bias_hh_l{layer}").detach().numpy()
            )
        m = recurrent.LSTM(hidden_size=h, num_layers=2)
        ours = m.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    def test_slstm_skip(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 9, 8)).astype(np.float32))
        m = recurrent.SLSTM(dimension=8, num_layers=2)
        params = m.init(key, x)
        y = m.apply(params, x)
        assert y.shape == x.shape


class TestConvNeXt:
    def test_matches_torch(self, rng):
        """vs a torch re-implementation of HCodec ConvNeXtBlock (conv.py:168-211)."""
        dim, inter, t = 8, 16, 20
        x = rng.standard_normal((2, t, dim)).astype(np.float32)
        w_dw = rng.standard_normal((dim, 1, 7)).astype(np.float32) * 0.1
        b_dw = rng.standard_normal((dim,)).astype(np.float32)
        ln_w = rng.standard_normal((dim,)).astype(np.float32)
        ln_b = rng.standard_normal((dim,)).astype(np.float32)
        w1 = rng.standard_normal((inter, dim)).astype(np.float32) * 0.1
        b1 = rng.standard_normal((inter,)).astype(np.float32)
        w2 = rng.standard_normal((dim, inter)).astype(np.float32) * 0.1
        b2 = rng.standard_normal((dim,)).astype(np.float32)
        gamma = rng.standard_normal((dim,)).astype(np.float32)

        xt = torch.from_numpy(x.transpose(0, 2, 1))
        h = torch.nn.functional.conv1d(
            torch.nn.functional.pad(xt, (3, 3)),
            torch.from_numpy(w_dw), torch.from_numpy(b_dw), groups=dim,
        ).transpose(1, 2)
        h = torch.nn.functional.layer_norm(
            h, (dim,), torch.from_numpy(ln_w), torch.from_numpy(ln_b), eps=1e-6
        )
        h = torch.nn.functional.linear(h, torch.from_numpy(w1), torch.from_numpy(b1))
        h = torch.nn.functional.gelu(h)
        h = torch.nn.functional.linear(h, torch.from_numpy(w2), torch.from_numpy(b2))
        ref = (torch.from_numpy(gamma) * h + torch.from_numpy(x)).numpy()

        m = blocks.ConvNeXtBlock(dim=dim, intermediate_dim=inter,
                                 layer_scale_init_value=0.1)
        params = {"params": {
            "dwconv": {"kernel": jnp.asarray(w_dw.transpose(2, 1, 0)),
                       "bias": jnp.asarray(b_dw)},
            "norm": {"scale": jnp.asarray(ln_w), "bias": jnp.asarray(ln_b)},
            "pwconv1": {"kernel": jnp.asarray(w1.T), "bias": jnp.asarray(b1)},
            "pwconv2": {"kernel": jnp.asarray(w2.T), "bias": jnp.asarray(b2)},
            "gamma": jnp.asarray(gamma),
        }}
        ours = m.apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestShapes:
    def test_snake(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
        m = blocks.Snake1d(8)
        y = m.apply(m.init(key, x), x)
        assert y.shape == x.shape

    def test_sampling_block_up_down(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32))
        up = blocks.SamplingBlock(dim=16, groups=16, upsample_scale=2)
        y = up.apply(up.init(key, x), x)
        assert y.shape == (2, 100, 16)
        down = blocks.SamplingBlock(dim=16, groups=16, downsample_scale=2)
        y = down.apply(down.init(key, x), x)
        assert y.shape == (2, 25, 16)

    def test_vocos_backbone(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 50, 24)).astype(np.float32))
        m = blocks.VocosBackbone(dim=16, intermediate_dim=32, num_layers=2)
        y = m.apply(m.init(key, x), x)
        assert y.shape == (2, 50, 16)

    def test_vocos_backbone_conditioned(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 50, 24)).astype(np.float32))
        c = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
        m = blocks.VocosBackbone(dim=16, intermediate_dim=32, num_layers=2,
                                 condition_dim=8)
        y = m.apply(m.init(key, x, c), x, c)
        assert y.shape == (2, 50, 16)

    def test_resnet_attn(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 20, 64)).astype(np.float32))
        m = blocks.ResnetBlock(in_channels=64)
        y = m.apply(m.init(key, x), x)
        assert y.shape == x.shape
        a = blocks.AttnBlock(in_channels=64)
        y = a.apply(a.init(key, x), x)
        assert y.shape == x.shape

    def test_wave_generator(self, key, rng):
        x = jnp.asarray(rng.standard_normal((1, 10, 32)).astype(np.float32))
        m = blocks.WaveGenerator(
            input_channel=32, channels=64, rates=(4, 2), kernel_sizes=(8, 4)
        )
        y = m.apply(m.init(key, x), x)
        assert y.shape == (1, 80, 1)
        assert np.abs(np.asarray(y)).max() <= 1.0

    def test_seanet_encoder_hop640(self, key, rng):
        x = jnp.asarray(rng.standard_normal((1, 64000, 1)).astype(np.float32))
        m = blocks.SEANetEncoder(dimension=64, n_filters=4, transformer_heads=4)
        y = m.apply(m.init(key, x), x)
        assert y.shape == (1, 100, 64)  # 64000 / 640

    def test_seanet_decoder(self, key, rng):
        m = blocks.SEANetDecoder(dimension=32, n_filters=4, lstm=1)
        z = jnp.asarray(rng.standard_normal((1, 10, 32)).astype(np.float32))
        y = m.apply(m.init(key, z), z)
        assert y.shape == (1, 3200, 1)  # hop 8*5*4*2 = 320


class TestTransformer:
    def test_forward_and_causality(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32))
        m = transformer.Transformer(
            hidden_size=32, intermediate_size=64, num_heads=4, num_layers=2,
            causal=True,
        )
        params = m.init(key, x)
        y1 = m.apply(params, x)
        assert y1.shape == x.shape
        # causality: perturbing the future must not change past outputs
        x2 = x.at[:, 8:].add(1.0)
        y2 = m.apply(params, x2)
        np.testing.assert_allclose(
            np.asarray(y1[:, :8]), np.asarray(y2[:, :8]), atol=1e-5
        )

    def test_sliding_window(self, key, rng):
        x = jnp.asarray(rng.standard_normal((1, 16, 32)).astype(np.float32))
        m = transformer.Transformer(
            hidden_size=32, intermediate_size=64, num_heads=4, num_layers=1,
            causal=True, use_sliding_window=True, left_context=4,
        )
        y = m.apply(m.init(key, x), x)
        assert y.shape == x.shape

    def test_moe(self, key, rng):
        x = jnp.asarray(rng.standard_normal((2, 6, 16)).astype(np.float32))
        m = transformer.Transformer(
            hidden_size=16, intermediate_size=32, num_heads=4, num_layers=1,
            use_moe=True,
        )
        y = m.apply(m.init(key, x), x)
        assert y.shape == x.shape

    def test_rope_matches_torch_convention(self, rng):
        """RoPE cos/sin match the HF convention used by the reference."""
        dim, t = 8, 5
        pos = jnp.arange(t)
        cos, sin = transformer.rope_cos_sin(pos, dim)
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
        freqs = np.outer(np.arange(t), inv)
        emb = np.concatenate([freqs, freqs], axis=-1)
        np.testing.assert_allclose(np.asarray(cos), np.cos(emb), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sin), np.sin(emb), atol=1e-6)
