"""BiCodec safetensors checkpoint -> this framework's param tree.

Key layout follows the reference module structure exactly
(bicodec.py:80-111 load path; submodules in modules/*). Weight norm is folded
(as the reference itself does at load, bicodec.py:223-231). Since the released
weights are not downloadable in this environment, correctness is enforced
structurally: ``expected_state_dict_shapes`` enumerates every torch key the
converter consumes, tests synthesize a checkpoint from it, and the converted
tree must match ``BiCodec.init`` leaf-for-leaf in paths and shapes.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .convert import _fold_weight_norm, _layernorm, _linear, _t


def _wn_split(kernel):
    """Re-parametrize a folded (K, in, out) kernel as our weight-norm pair:
    v = kernel, g = ||kernel|| per out channel — forward-identical."""
    g = np.sqrt((kernel**2).sum(axis=(0, 1)))
    return {"kernel_v": kernel, "kernel_g": g}


def _conv(sd, prefix, weight_norm=False):
    """torch Conv1d (out, in, K) -> {kernel (K, in, out), bias}; weight-normed
    convs re-emit the v/g parametrization our modules train with."""
    w = _fold_weight_norm(sd, prefix) if weight_norm else _t(sd[f"{prefix}.weight"])
    kernel = w.transpose(2, 1, 0)
    out = _wn_split(kernel) if weight_norm else {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _convtr(sd, prefix, weight_norm=False, depthwise=False):
    """torch ConvTranspose1d (in, out, K) -> {kernel, bias}.

    Our ConvTranspose1d stores (K, in, out) for dense and (K, 1, C) for
    depthwise groups (see tests/test_conv.py layouts)."""
    w = _fold_weight_norm(sd, prefix) if weight_norm else _t(sd[f"{prefix}.weight"])
    kernel = w.transpose(2, 1, 0) if depthwise else w.transpose(2, 0, 1)
    out = _wn_split(kernel) if weight_norm else {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _batchnorm(sd, prefix):
    return (
        {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])},
        {"mean": _t(sd[f"{prefix}.running_mean"]),
         "var": _t(sd[f"{prefix}.running_var"])},
    )


def _convnext_block(sd, prefix, conditioned=False):
    p = {
        "dwconv": _conv(sd, f"{prefix}.dwconv"),
        "pwconv1": _linear(sd, f"{prefix}.pwconv1"),
        "pwconv2": _linear(sd, f"{prefix}.pwconv2"),
    }
    if conditioned:
        p["norm"] = {"scale": _linear(sd, f"{prefix}.norm.scale"),
                     "shift": _linear(sd, f"{prefix}.norm.shift")}
    else:
        p["norm"] = _layernorm(sd, f"{prefix}.norm")
    if f"{prefix}.gamma" in sd:
        p["gamma"] = _t(sd[f"{prefix}.gamma"])
    return p


def _stack(dicts):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *dicts)


def _vocos_backbone(sd, prefix, num_layers, conditioned=False):
    p = {"embed": _conv(sd, f"{prefix}.embed")}
    if conditioned:
        p["norm"] = {"scale": _linear(sd, f"{prefix}.norm.scale"),
                     "shift": _linear(sd, f"{prefix}.norm.shift")}
    else:
        p["norm"] = _layernorm(sd, f"{prefix}.norm")
    blocks = [
        _convnext_block(sd, f"{prefix}.convnext.{i}", conditioned)
        for i in range(num_layers)
    ]
    p["convnext"] = {"stack": {"block": _stack(blocks)}}
    p["final_layer_norm"] = _layernorm(sd, f"{prefix}.final_layer_norm")
    return p


def _sampling_block(sd, prefix, up=False):
    if up:
        return {"de_conv_upsampler": _convtr(
            sd, f"{prefix}.de_conv_upsampler.1", depthwise=True)}
    return {"conv_downsampler": _conv(sd, f"{prefix}.conv_downsampler.1")}


def _feat_encoder(sd, prefix, cfg):
    p = {"encoder": _vocos_backbone(sd, f"{prefix}.encoder",
                                    cfg.vocos_num_layers)}
    for k, ratio in enumerate(cfg.sample_ratios):
        if ratio > 1:  # scale-1 sampling blocks have no parameters
            p[f"down_{k}"] = _sampling_block(sd, f"{prefix}.downsample.{k}.0")
        p[f"down_vocos_{k}"] = _vocos_backbone(
            sd, f"{prefix}.downsample.{k}.1", 2
        )
    p["project"] = _linear(sd, f"{prefix}.project")
    return p


def _feat_decoder(sd, prefix, cfg, conditioned, ratios=None):
    p = {"linear_pre": _linear(sd, f"{prefix}.linear_pre")}
    ratios = ratios if ratios is not None else cfg.sample_ratios
    for k, ratio in enumerate(ratios):
        if ratio > 1:  # scale-1 sampling blocks have no parameters
            p[f"up_{k}"] = _sampling_block(sd, f"{prefix}.downsample.{k}.0",
                                           up=True)
        p[f"up_vocos_{k}"] = _vocos_backbone(sd, f"{prefix}.downsample.{k}.1", 2)
    p["vocos_backbone"] = _vocos_backbone(
        sd, f"{prefix}.vocos_backbone", cfg.vocos_num_layers,
        conditioned=conditioned,
    )
    p["linear"] = _linear(sd, f"{prefix}.linear")
    return p


def _snake(sd, key):
    # torch Snake alpha (1, C, 1) -> ours (1, 1, C)
    return {"alpha": _t(sd[key]).transpose(0, 2, 1)}


def _residual_unit(sd, prefix):
    return {
        "snake1": _snake(sd, f"{prefix}.block.0.alpha"),
        "conv1": _conv(sd, f"{prefix}.block.1", weight_norm=True),
        "snake2": _snake(sd, f"{prefix}.block.2.alpha"),
        "conv2": _conv(sd, f"{prefix}.block.3", weight_norm=True),
    }


def _wave_generator(sd, prefix, cfg):
    p = {"conv_pre": _conv(sd, f"{prefix}.model.0", weight_norm=True)}
    n = len(cfg.wave_rates)
    for i in range(n):
        bp = f"{prefix}.model.{i + 1}.block"
        p[f"block_{i}"] = {
            "snake": _snake(sd, f"{bp}.0.alpha"),
            "upconv": _convtr(sd, f"{bp}.1", weight_norm=True),
            "res_0": _residual_unit(sd, f"{bp}.2"),
            "res_1": _residual_unit(sd, f"{bp}.3"),
            "res_2": _residual_unit(sd, f"{bp}.4"),
        }
    p["snake_post"] = _snake(sd, f"{prefix}.model.{n + 1}.alpha")
    p["conv_post"] = _conv(sd, f"{prefix}.model.{n + 2}", weight_norm=True)
    return p


def _ecapa(sd, prefix):
    def conv_relu_bn(pre):
        scale_bias, stats = _batchnorm(sd, f"{pre}.bn")
        return {"conv": _conv(sd, f"{pre}.conv"), "bn": scale_bias}, stats

    p, stats = {}, {}
    c, st = conv_relu_bn(f"{prefix}.layer1")
    p["layer1"], stats["layer1"] = c, {"bn": st}
    for li in (2, 3, 4):
        lp = f"{prefix}.layer{li}.se_res2block"
        in_c, in_s = conv_relu_bn(f"{lp}.0")
        res2_p, res2_s = {}, {}
        for i in range(7):  # scale=8 -> 7 convs
            res2_p[f"conv_{i}"] = _conv(sd, f"{lp}.1.convs.{i}")
            bn_sb, bn_st = _batchnorm(sd, f"{lp}.1.bns.{i}")
            res2_p[f"bn_{i}"] = bn_sb
            res2_s[f"bn_{i}"] = bn_st
        out_c, out_s = conv_relu_bn(f"{lp}.2")
        p[f"layer{li}"] = {
            "in_conv": in_c, "res2": res2_p, "out_conv": out_c,
            "se": {"linear1": _linear(sd, f"{lp}.3.linear1"),
                   "linear2": _linear(sd, f"{lp}.3.linear2")},
        }
        stats[f"layer{li}"] = {"in_conv": {"bn": in_s}, "res2": res2_s,
                               "out_conv": {"bn": out_s}}
    p["conv"] = _conv(sd, f"{prefix}.conv")
    p["pool"] = {"linear1": _conv_as_linear(sd, f"{prefix}.pool.linear1"),
                 "linear2": _conv_as_linear(sd, f"{prefix}.pool.linear2")}
    bn_sb, bn_st = _batchnorm(sd, f"{prefix}.bn")
    p["bn"] = bn_sb
    stats["bn"] = bn_st
    p["linear"] = _linear(sd, f"{prefix}.linear")
    return p, stats


def _conv_as_linear(sd, prefix):
    """ASTP uses Conv1d(k=1) as a linear: (out, in, 1) -> Dense (in, out)."""
    w = _t(sd[f"{prefix}.weight"])[:, :, 0].T
    return {"kernel": w, "bias": _t(sd[f"{prefix}.bias"])}


def _perceiver(sd, prefix, depth=2):
    p = {"latents": _t(sd[f"{prefix}.latents"]),
         "proj_context": _linear(sd, f"{prefix}.proj_context"),
         "norm": {"gamma": _t(sd[f"{prefix}.norm.gamma"])}}
    for i in range(depth):
        attn = f"{prefix}.layers.{i}.0"
        ff = f"{prefix}.layers.{i}.1"
        p[f"attn_{i}"] = {
            "to_q": _linear(sd, f"{attn}.to_q"),
            "to_kv": _linear(sd, f"{attn}.to_kv"),
            "to_out": _linear(sd, f"{attn}.to_out"),
        }
        p[f"ff_{i}"] = {"proj_in": _linear(sd, f"{ff}.0"),
                        "proj_out": _linear(sd, f"{ff}.2")}
    return p


def convert_bicodec(state_dict: Dict, cfg) -> Dict:
    """torch/safetensors state dict -> {"params": ..., "batch_stats": ...}."""
    sd = dict(state_dict)
    params: Dict = {}
    batch_stats: Dict = {}

    params["encoder"] = _feat_encoder(sd, "encoder", cfg)
    params["quantizer"] = {
        "in_project": _conv(sd, "quantizer.in_project", weight_norm=True),
        "out_project": _conv(sd, "quantizer.out_project", weight_norm=True),
        "codebook": _t(sd["quantizer.codebook.weight"]),
    }
    spk_p, spk_stats = _ecapa(sd, "speaker_encoder.speaker_encoder")
    fsq_proj = {}
    if "speaker_encoder.quantizer.project_in.weight" in sd:
        fsq_proj = {
            "project_in": _linear(sd, "speaker_encoder.quantizer.project_in"),
            "project_out": _linear(sd, "speaker_encoder.quantizer.project_out"),
        }
    params["speaker_encoder"] = {
        "speaker_encoder": spk_p,
        "perceiver_sampler": _perceiver(sd, "speaker_encoder.perceiver_sampler"),
        "quantizer": fsq_proj,
        "project": _linear(sd, "speaker_encoder.project"),
    }
    batch_stats["speaker_encoder"] = {"speaker_encoder": spk_stats}
    params["prenet"] = _feat_decoder(sd, "prenet", cfg, conditioned=True)
    params["postnet"] = _feat_decoder(sd, "postnet", cfg, conditioned=False,
                                      ratios=(1, 1))
    params["decoder"] = _wave_generator(sd, "decoder", cfg)
    # FVQ EMA cluster stats (training state, but required by the "codebook"
    # collection and meaningful when resuming training from a torch ckpt);
    # zeros when the source dict lacks the buffer (inference-only exports)
    cs = (_t(sd["quantizer.cluster_size"]).reshape(-1)
          if "quantizer.cluster_size" in sd
          else np.zeros((cfg.codebook_size,), np.float32))
    codebook = {"quantizer": {"cluster_size": cs}}
    return {"params": params, "batch_stats": batch_stats,
            "codebook": codebook}


# ---------------------------------------------------------------------------
# Inverse: export our param tree to a torch-style state dict (useful both for
# torch interop and to round-trip-test the converter without released weights)
# ---------------------------------------------------------------------------

def _folded(p):
    """Our conv params -> folded (K, in, out) kernel (handles weight norm)."""
    if "kernel" in p:
        return np.asarray(p["kernel"])
    v = np.asarray(p["kernel_v"])
    g = np.asarray(p["kernel_g"])
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True) + 1e-12)
    return v * (g / norm)


def _inv_conv(p, prefix, out):
    out[f"{prefix}.weight"] = _folded(p).transpose(2, 1, 0)
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_convtr(p, prefix, out, depthwise=False):
    k = _folded(p)
    out[f"{prefix}.weight"] = (
        k.transpose(2, 1, 0) if depthwise else k.transpose(1, 2, 0)
    )
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_linear(p, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_layernorm(p, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_adaln(p, prefix, out):
    _inv_linear(p["scale"], f"{prefix}.scale", out)
    _inv_linear(p["shift"], f"{prefix}.shift", out)


def _inv_convnext_block(p, prefix, out, conditioned):
    _inv_conv(p["dwconv"], f"{prefix}.dwconv", out)
    _inv_linear(p["pwconv1"], f"{prefix}.pwconv1", out)
    _inv_linear(p["pwconv2"], f"{prefix}.pwconv2", out)
    if conditioned:
        _inv_adaln(p["norm"], f"{prefix}.norm", out)
    else:
        _inv_layernorm(p["norm"], f"{prefix}.norm", out)
    if "gamma" in p:
        out[f"{prefix}.gamma"] = np.asarray(p["gamma"])


def _inv_vocos(p, prefix, out, conditioned=False):
    _inv_conv(p["embed"], f"{prefix}.embed", out)
    if conditioned:
        _inv_adaln(p["norm"], f"{prefix}.norm", out)
    else:
        _inv_layernorm(p["norm"], f"{prefix}.norm", out)
    stacked = p["convnext"]["stack"]["block"]
    n = np.asarray(stacked["dwconv"]["kernel"]).shape[0]
    import jax

    for i in range(n):
        block = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
        _inv_convnext_block(block, f"{prefix}.convnext.{i}", out, conditioned)
    _inv_layernorm(p["final_layer_norm"], f"{prefix}.final_layer_norm", out)


def _inv_snake(p, key, out):
    out[key] = np.asarray(p["alpha"]).transpose(0, 2, 1)


def _inv_residual_unit(p, prefix, out):
    _inv_snake(p["snake1"], f"{prefix}.block.0.alpha", out)
    _inv_conv(p["conv1"], f"{prefix}.block.1", out)
    _inv_snake(p["snake2"], f"{prefix}.block.2.alpha", out)
    _inv_conv(p["conv2"], f"{prefix}.block.3", out)


def _inv_batchnorm(scale_bias, stats, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(scale_bias["scale"])
    out[f"{prefix}.bias"] = np.asarray(scale_bias["bias"])
    out[f"{prefix}.running_mean"] = np.asarray(stats["mean"])
    out[f"{prefix}.running_var"] = np.asarray(stats["var"])


def export_bicodec_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    """Our {"params", "batch_stats"[, "codebook"]} -> torch-style flat
    state dict."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    if "codebook" in variables:
        out["quantizer.cluster_size"] = np.asarray(
            variables["codebook"]["quantizer"]["cluster_size"])

    # encoder
    enc = p["encoder"]
    _inv_vocos(enc["encoder"], "encoder.encoder", out)
    for k, ratio in enumerate(cfg.sample_ratios):
        if ratio > 1:
            _inv_conv(enc[f"down_{k}"]["conv_downsampler"],
                      f"encoder.downsample.{k}.0.conv_downsampler.1", out)
        _inv_vocos(enc[f"down_vocos_{k}"], f"encoder.downsample.{k}.1", out)
    _inv_linear(enc["project"], "encoder.project", out)

    # semantic quantizer
    q = p["quantizer"]
    _inv_conv(q["in_project"], "quantizer.in_project", out)
    _inv_conv(q["out_project"], "quantizer.out_project", out)
    out["quantizer.codebook.weight"] = np.asarray(q["codebook"])

    # speaker branch
    spk = p["speaker_encoder"]
    sstats = bs.get("speaker_encoder", {}).get("speaker_encoder", {})
    e = spk["speaker_encoder"]
    pre = "speaker_encoder.speaker_encoder"
    _inv_conv(e["layer1"]["conv"], f"{pre}.layer1.conv", out)
    _inv_batchnorm(e["layer1"]["bn"], sstats["layer1"]["bn"],
                   f"{pre}.layer1.bn", out)
    for li in (2, 3, 4):
        lp = f"{pre}.layer{li}.se_res2block"
        layer = e[f"layer{li}"]
        lstat = sstats[f"layer{li}"]
        _inv_conv(layer["in_conv"]["conv"], f"{lp}.0.conv", out)
        _inv_batchnorm(layer["in_conv"]["bn"], lstat["in_conv"]["bn"],
                       f"{lp}.0.bn", out)
        for i in range(7):
            _inv_conv(layer["res2"][f"conv_{i}"], f"{lp}.1.convs.{i}", out)
            _inv_batchnorm(layer["res2"][f"bn_{i}"], lstat["res2"][f"bn_{i}"],
                           f"{lp}.1.bns.{i}", out)
        _inv_conv(layer["out_conv"]["conv"], f"{lp}.2.conv", out)
        _inv_batchnorm(layer["out_conv"]["bn"], lstat["out_conv"]["bn"],
                       f"{lp}.2.bn", out)
        _inv_linear(layer["se"]["linear1"], f"{lp}.3.linear1", out)
        _inv_linear(layer["se"]["linear2"], f"{lp}.3.linear2", out)
    _inv_conv(e["conv"], f"{pre}.conv", out)
    for name in ("linear1", "linear2"):
        w = np.asarray(e["pool"][name]["kernel"]).T[:, :, None]
        out[f"{pre}.pool.{name}.weight"] = w
        out[f"{pre}.pool.{name}.bias"] = np.asarray(e["pool"][name]["bias"])
    _inv_batchnorm(e["bn"], sstats["bn"], f"{pre}.bn", out)
    _inv_linear(e["linear"], f"{pre}.linear", out)

    perc = spk["perceiver_sampler"]
    ppre = "speaker_encoder.perceiver_sampler"
    out[f"{ppre}.latents"] = np.asarray(perc["latents"])
    _inv_linear(perc["proj_context"], f"{ppre}.proj_context", out)
    out[f"{ppre}.norm.gamma"] = np.asarray(perc["norm"]["gamma"])
    for i in range(2):
        _inv_linear(perc[f"attn_{i}"]["to_q"], f"{ppre}.layers.{i}.0.to_q", out)
        _inv_linear(perc[f"attn_{i}"]["to_kv"], f"{ppre}.layers.{i}.0.to_kv", out)
        _inv_linear(perc[f"attn_{i}"]["to_out"], f"{ppre}.layers.{i}.0.to_out", out)
        _inv_linear(perc[f"ff_{i}"]["proj_in"], f"{ppre}.layers.{i}.1.0", out)
        _inv_linear(perc[f"ff_{i}"]["proj_out"], f"{ppre}.layers.{i}.1.2", out)

    if "project_in" in spk.get("quantizer", {}):
        _inv_linear(spk["quantizer"]["project_in"],
                    "speaker_encoder.quantizer.project_in", out)
        _inv_linear(spk["quantizer"]["project_out"],
                    "speaker_encoder.quantizer.project_out", out)
    _inv_linear(spk["project"], "speaker_encoder.project", out)

    # prenet / postnet
    for name, conditioned, ratios in (
        ("prenet", True, cfg.sample_ratios), ("postnet", False, (1, 1)),
    ):
        dec = p[name]
        _inv_linear(dec["linear_pre"], f"{name}.linear_pre", out)
        for k, ratio in enumerate(ratios):
            if ratio > 1:
                _inv_convtr(dec[f"up_{k}"]["de_conv_upsampler"],
                            f"{name}.downsample.{k}.0.de_conv_upsampler.1",
                            out, depthwise=True)
            _inv_vocos(dec[f"up_vocos_{k}"], f"{name}.downsample.{k}.1", out)
        _inv_vocos(dec["vocos_backbone"], f"{name}.vocos_backbone", out,
                   conditioned=conditioned)
        _inv_linear(dec["linear"], f"{name}.linear", out)

    # wave generator
    w = p["decoder"]
    _inv_conv(w["conv_pre"], "decoder.model.0", out)
    n = len(cfg.wave_rates)
    for i in range(n):
        bp = f"decoder.model.{i + 1}.block"
        blk = w[f"block_{i}"]
        _inv_snake(blk["snake"], f"{bp}.0.alpha", out)
        _inv_convtr(blk["upconv"], f"{bp}.1", out)
        for j in range(3):
            _inv_residual_unit(blk[f"res_{j}"], f"{bp}.{j + 2}", out)
    _inv_snake(w["snake_post"], f"decoder.model.{n + 1}.alpha", out)
    _inv_conv(w["conv_post"], f"decoder.model.{n + 2}", out)
    return out
