"""Golden tests: conv primitives vs torch with identical weights.

Padding math parity is where token-ID equality lives or dies (SURVEY §7), so
every conv family is checked bit-for-bit (fp32 tolerance) against a torch
re-implementation of the reference semantics.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from unified_audio_tpu.nn import conv as uconv


def _to_jax_kernel(w_torch):
    # torch conv weight (out, in, K) -> ours (K, in, out)
    return jnp.asarray(w_torch.detach().numpy().transpose(2, 1, 0))


def _torch_sconv1d(x, w, b, stride, dilation, causal, pad_mode="reflect"):
    """Reference SConv1d forward (EnCodec conv.py:195-211 semantics)."""
    k = w.shape[-1]
    dk = (k - 1) * dilation + 1
    padding_total = dk - stride
    length = x.shape[-1]
    n_frames = (length - dk + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (dk - padding_total)
    extra = ideal - length
    if causal:
        x = F.pad(x, (padding_total, extra), mode=pad_mode)
    else:
        pr = padding_total // 2
        pl = padding_total - pr
        x = F.pad(x, (pl, pr + extra), mode=pad_mode)
    return F.conv1d(x, w, b, stride=stride, dilation=dilation)


class TestSConv1d:
    @pytest.mark.parametrize(
        "cin,cout,k,stride,dilation,causal,t",
        [
            (4, 8, 7, 1, 1, False, 100),
            (4, 8, 16, 8, 1, False, 1603),
            (8, 8, 3, 1, 2, False, 57),
            (4, 8, 4, 2, 1, True, 100),
            (4, 8, 7, 1, 3, True, 50),
        ],
    )
    def test_vs_torch(self, rng, cin, cout, k, stride, dilation, causal, t):
        x = rng.standard_normal((2, cin, t)).astype(np.float32)
        w = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        b = rng.standard_normal((cout,)).astype(np.float32)

        ref = _torch_sconv1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride, dilation, causal,
        ).numpy()

        m = uconv.SConv1d(
            features=cout, kernel_size=k, stride=stride, dilation=dilation,
            causal=causal, weight_norm=False,
        )
        params = {"params": {"kernel": _to_jax_kernel(torch.from_numpy(w)),
                             "bias": jnp.asarray(b)}}
        ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
        )


class TestSConvTranspose1d:
    @pytest.mark.parametrize(
        "cin,cout,k,stride,causal", [(8, 4, 16, 8, False), (8, 4, 4, 2, True)]
    )
    def test_vs_torch(self, rng, cin, cout, k, stride, causal):
        x = rng.standard_normal((2, cin, 25)).astype(np.float32)
        w = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1
        b = rng.standard_normal((cout,)).astype(np.float32)

        y = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                               torch.from_numpy(b), stride=stride)
        padding_total = k - stride
        if causal:
            pr = math.ceil(padding_total * 1.0)
            pl = padding_total - pr
        else:
            pr = padding_total // 2
            pl = padding_total - pr
        ref = y[..., pl: y.shape[-1] - pr].numpy()

        m = uconv.SConvTranspose1d(
            features=cout, kernel_size=k, stride=stride, causal=causal,
            weight_norm=False,
        )
        # torch convtranspose weight (in, out, K) -> ours (K, in, out)
        kernel = jnp.asarray(w.transpose(2, 0, 1))
        params = {"params": {"kernel": kernel, "bias": jnp.asarray(b)}}
        ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
        )


class TestCausalConv1d:
    @pytest.mark.parametrize(
        "k,stride,dilation,causal", [(7, 1, 1, False), (7, 1, 1, True),
                                     (5, 2, 1, True), (3, 1, 4, False)]
    )
    def test_vs_torch(self, rng, k, stride, dilation, causal):
        cin, cout, t = 4, 6, 64
        x = rng.standard_normal((2, cin, t)).astype(np.float32)
        w = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        b = rng.standard_normal((cout,)).astype(np.float32)

        dk = (k - 1) * dilation + 1
        xt = torch.from_numpy(x)
        if causal:
            xt = F.pad(xt, (dk - stride, 0))
        else:
            xt = F.pad(xt, (dk // 2, dk // 2))
        ref = F.conv1d(xt, torch.from_numpy(w), torch.from_numpy(b),
                       stride=stride, dilation=dilation).numpy()

        m = uconv.CausalConv1d(features=cout, kernel_size=k, stride=stride,
                               dilation=dilation, causal=causal)
        params = {"params": {"kernel": _to_jax_kernel(torch.from_numpy(w)),
                             "bias": jnp.asarray(b)}}
        ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
        )


class TestSubPixelConvTranspose1d:
    @pytest.mark.parametrize("causal", [False, True])
    def test_vs_torch(self, rng, causal):
        cin, cout, k, stride, t = 6, 4, 5, 2, 20
        x = rng.standard_normal((2, cin, t)).astype(np.float32)
        w_up = rng.standard_normal((cout * stride, cin, 1)).astype(np.float32) * 0.1
        b_up = rng.standard_normal((cout * stride,)).astype(np.float32)
        w_dw = rng.standard_normal((cout, 1, k)).astype(np.float32) * 0.1
        b_dw = rng.standard_normal((cout,)).astype(np.float32)

        # torch reference (vq/conv.py:85-91)
        xt = torch.from_numpy(x)
        y = F.conv1d(xt, torch.from_numpy(w_up), torch.from_numpy(b_up))
        y = y.unflatten(1, (stride, cout)).permute(0, 2, 3, 1).flatten(-2, -1)
        dk = k
        y = F.pad(y, (dk - 1, 0) if causal else (dk // 2, dk // 2))
        ref = F.conv1d(y, torch.from_numpy(w_dw), torch.from_numpy(b_dw),
                       groups=cout).numpy()

        m = uconv.SubPixelConvTranspose1d(
            features=cout, kernel_size=k, stride=stride, causal=causal
        )
        params = {"params": {
            "up_kernel": _to_jax_kernel(torch.from_numpy(w_up)),
            "up_bias": jnp.asarray(b_up),
            "dw_kernel": _to_jax_kernel(torch.from_numpy(w_dw)),
            "bias": jnp.asarray(b_dw),
        }}
        ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
        )


class TestConvTranspose1d:
    @pytest.mark.parametrize("k,stride", [(4, 2), (5, 2), (6, 3)])
    def test_vs_torch_defaults(self, rng, k, stride):
        cin, cout, t = 6, 4, 14
        pad = (stride + 1) // 2
        opad = 1 if stride % 2 else 0
        x = rng.standard_normal((2, cin, t)).astype(np.float32)
        w = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1
        b = rng.standard_normal((cout,)).astype(np.float32)
        ref = F.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad, output_padding=opad,
        ).numpy()

        m = uconv.ConvTranspose1d(features=cout, kernel_size=k, stride=stride)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 0, 1)),
                             "bias": jnp.asarray(b)}}
        ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
        )

    def test_depthwise_groups(self, rng):
        c, k, stride, t = 8, 4, 2, 10
        pad, opad = 1, 0
        x = rng.standard_normal((2, c, t)).astype(np.float32)
        w = rng.standard_normal((c, 1, k)).astype(np.float32) * 0.1
        b = rng.standard_normal((c,)).astype(np.float32)
        ref = F.conv_transpose1d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=stride, padding=pad, output_padding=opad, groups=c,
        ).numpy()
        m = uconv.ConvTranspose1d(features=c, kernel_size=k, stride=stride,
                                  padding=pad, output_padding=opad, groups=c)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)),
                             "bias": jnp.asarray(b)}}
        ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
        )


class TestWeightNorm:
    def test_wn_equals_folded(self, key, rng):
        """Weight-normed conv output == plain conv with the folded kernel."""
        x = jnp.asarray(rng.standard_normal((2, 50, 4)).astype(np.float32))
        m = uconv.SConv1d(features=8, kernel_size=7, weight_norm=True)
        params = m.init(key, x)["params"]
        v, g = params["kernel_v"], params["kernel_g"]
        folded = v * (g / jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12))
        m2 = uconv.SConv1d(features=8, kernel_size=7, weight_norm=False)
        out_wn = m.apply({"params": params}, x)
        out_folded = m2.apply(
            {"params": {"kernel": folded, "bias": params["bias"]}}, x
        )
        np.testing.assert_allclose(
            np.asarray(out_wn), np.asarray(out_folded), atol=1e-5
        )
