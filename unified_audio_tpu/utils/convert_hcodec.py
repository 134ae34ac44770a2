"""HCodec-1.0 weights.pt (torch Codec state dict) -> this framework's tree,
plus the inverse exporter used for round-trip testing.

Key layout follows the reference module structure: the SEANet encoder
sequential (seanet.py:121-187: conv_in at model.0, per-ratio [res, ELU, down]
triplets, transformer at model.14, final stride-2 conv at model.17), the
vq-pytorch ResidualVQ codebooks (layers.{i}._codebook.{embed, embed_avg,
cluster_size, initted}, embed stored (1, N, D)), the semantic conv stacks
(semantic_module.py), and the ConvNeXt/ISTFT decoder (codec_decoder.py:14-67).
Weight norm folds into our v/g parametrization (forward-identical).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .convert import _fold_weight_norm, _layernorm, _linear, _t
from .convert_bicodec import _wn_split


def _sconv(sd, prefix):
    """EnCodec SConv1d: {prefix}.conv.conv (weight-normed)."""
    w = _fold_weight_norm(sd, f"{prefix}.conv.conv")
    out = _wn_split(w.transpose(2, 1, 0))
    if f"{prefix}.conv.conv.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.conv.conv.bias"])
    return out


def _hconv(sd, prefix, wrapped=True, bias=True):
    """HCodec constant-pad Conv1d wrapper: {prefix}.conv (plain)."""
    key = f"{prefix}.conv" if wrapped else prefix
    out = {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 1, 0)}
    if bias and f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _groupnorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _lstm(sd, prefix, num_layers=1):
    p = {}
    for l in range(num_layers):
        p[f"w_ih_l{l}"] = _t(sd[f"{prefix}.weight_ih_l{l}"]).T
        p[f"w_hh_l{l}"] = _t(sd[f"{prefix}.weight_hh_l{l}"]).T
        p[f"b_ih_l{l}"] = _t(sd[f"{prefix}.bias_ih_l{l}"])
        p[f"b_hh_l{l}"] = _t(sd[f"{prefix}.bias_hh_l{l}"])
    return p


def _hybrid_transformer(sd, prefix, num_layers=2):
    p = {}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                "rnn": _lstm(sd, f"{lp}.self_attn.rnn"),
                "q_proj": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k_proj": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v_proj": _linear(sd, f"{lp}.self_attn.v_proj"),
                "o_proj": _linear(sd, f"{lp}.self_attn.o_proj"),
            },
            "mlp": {
                "w1": _linear(sd, f"{lp}.mlp.w1"),
                "w2": _linear(sd, f"{lp}.mlp.w2"),
                "w3": _linear(sd, f"{lp}.mlp.w3"),
            },
            "input_layernorm": {"weight": _t(sd[f"{lp}.input_layernorm.weight"])},
            "post_attention_layernorm": {
                "weight": _t(sd[f"{lp}.post_attention_layernorm.weight"])
            },
        }
    return p


def _seanet_encoder(sd, prefix, n_ratios=4):
    p = {"conv_in": _sconv(sd, f"{prefix}.model.0")}
    for i in range(n_ratios):
        res = f"{prefix}.model.{1 + 3 * i}"
        p[f"res_{i}_0"] = {
            "block_0": _sconv(sd, f"{res}.block.1"),
            "block_1": _sconv(sd, f"{res}.block.3"),
            "shortcut": _sconv(sd, f"{res}.shortcut"),
        }
        p[f"down_{i}"] = _sconv(sd, f"{prefix}.model.{3 + 3 * i}")
    p["transformer"] = _hybrid_transformer(sd, f"{prefix}.model.{2 + 3 * n_ratios}")
    p["conv_out"] = _sconv(sd, f"{prefix}.model.{5 + 3 * n_ratios}")
    return p


def _rvq(sd, prefix, num_quantizers=4):
    """vq-pytorch ResidualVQ buffers -> our 'codebook' collection."""
    out = {}
    for i in range(num_quantizers):
        cb = f"{prefix}.layers.{i}._codebook"
        embed = _t(sd[f"{cb}.embed"])
        if embed.ndim == 3:  # vq-pytorch stores (num_codebooks=1, N, D)
            embed = embed[0]
        embed_avg = _t(sd[f"{cb}.embed_avg"])
        if embed_avg.ndim == 3:
            embed_avg = embed_avg[0]
        cluster = _t(sd[f"{cb}.cluster_size"]).reshape(-1)
        init_key = (f"{cb}.initted" if f"{cb}.initted" in sd else f"{cb}.inited")
        out[f"layers_{i}"] = {
            "embed": embed,
            "embed_avg": embed_avg,
            "cluster_size": cluster,
            "inited": _t(sd[init_key]).reshape(()).astype(np.float32),
        }
    return out


def _semantic_residual_unit(sd, prefix):
    return {
        "conv1": _hconv(sd, f"{prefix}.conv1", bias=False),
        "conv2": {"kernel": _t(sd[f"{prefix}.conv2.weight"]).transpose(2, 1, 0)},
    }


def _semantic_encoder(sd, prefix, strides=(2, 1)):
    p = {"conv": _hconv(sd, f"{prefix}.conv", bias=False)}
    for i, _ in enumerate(strides):
        bp = f"{prefix}.conv_blocks.{i}"
        p[f"block_{i}"] = {
            "res_0": _semantic_residual_unit(sd, f"{bp}.res_units.0"),
            "res_1": _semantic_residual_unit(sd, f"{bp}.res_units.1"),
            "conv": _hconv(sd, f"{bp}.conv"),
        }
    p["conv2"] = _hconv(sd, f"{prefix}.conv2", bias=False)
    return p


def _semantic_decoder(sd, prefix, strides=(2, 1)):
    p = {"conv1": _hconv(sd, f"{prefix}.conv1", bias=False)}
    for i, stride in enumerate(strides):
        bp = f"{prefix}.conv_blocks.{i}"
        if stride == 1:
            conv = _hconv(sd, f"{bp}.conv")
        else:  # torch ConvTranspose1d wrapper .deconv, weight (in, out, K)
            conv = {"kernel": _t(sd[f"{bp}.conv.deconv.weight"]).transpose(2, 0, 1),
                    "bias": _t(sd[f"{bp}.conv.deconv.bias"])}
        p[f"block_{i}"] = {
            "conv": conv,
            "res_0": _semantic_residual_unit(sd, f"{bp}.res_units.0"),
            "res_1": _semantic_residual_unit(sd, f"{bp}.res_units.1"),
        }
    p["conv2"] = _hconv(sd, f"{prefix}.conv2", bias=False)
    return p


def _resnet_block(sd, prefix):
    return {
        "norm1": _groupnorm(sd, f"{prefix}.norm1"),
        "conv1": _hconv(sd, f"{prefix}.conv1"),
        "norm2": _groupnorm(sd, f"{prefix}.norm2"),
        "conv2": _hconv(sd, f"{prefix}.conv2"),
    }


def _convnext_block_h(sd, prefix):
    return {
        "dwconv": _hconv(sd, f"{prefix}.dwconv"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "pwconv1": _linear(sd, f"{prefix}.pwconv1.linear"),
        "pwconv2": _linear(sd, f"{prefix}.pwconv2.linear"),
        "gamma": _t(sd[f"{prefix}.gamma"]),
    }


def _codec_decoder(sd, prefix, convnext_layers=12):
    import jax

    p = {
        "embed": {
            "up_kernel": _t(sd[f"{prefix}.embed.up.weight"]).transpose(2, 1, 0),
            "up_bias": _t(sd[f"{prefix}.embed.up.bias"]),
            "dw_kernel": _t(sd[f"{prefix}.embed.dw.weight"]).transpose(2, 1, 0),
            "bias": _t(sd[f"{prefix}.embed.dw.bias"]),
        },
        "prior_net": {
            "res0": _resnet_block(sd, f"{prefix}.prior_net.0"),
            "res1": _resnet_block(sd, f"{prefix}.prior_net.1"),
            "transformer": _hybrid_transformer(sd, f"{prefix}.prior_net.3"),
            "res2": _resnet_block(sd, f"{prefix}.prior_net.5"),
            "res3": _resnet_block(sd, f"{prefix}.prior_net.6"),
            "norm_out": _groupnorm(sd, f"{prefix}.prior_net.7"),
        },
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "head": {"out": _linear(sd, f"{prefix}.head.out")},
    }
    blocks = [
        _convnext_block_h(sd, f"{prefix}.post_net.{i}")
        for i in range(convnext_layers)
    ]
    p["post_net"] = {"stack": {"block": jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *blocks
    )}}
    return p


def _convnext_stack(sd, prefix, n):
    """Reference per-layer ConvNeXt modules {prefix}.{i} -> our nn.scan
    stacked layout {"stack": {"block": leading-layer-axis tree}}."""
    import jax

    blocks = [_convnext_block_h(sd, f"{prefix}.{i}") for i in range(n)]
    return {"stack": {"block": jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *blocks)}}


def _codec_encoder20(sd, prefix, cfg):
    """HCodec-2.0 STFT-domain encoder (HCodec-2.0/vq/codec_encoder.py:12-79):
    embed conv, ConvNeXt prior stack, transformer at post_net.1 (between the
    Transpose wrappers), strided out conv."""
    return {
        "embed": _hconv(sd, f"{prefix}.embed"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "prior_net": _convnext_stack(sd, f"{prefix}.prior_net",
                                     cfg.encoder_convnext_layers),
        "post_net": _hybrid_transformer(sd, f"{prefix}.post_net.1"),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "out": _hconv(sd, f"{prefix}.out"),
    }


def _codec_decoder20(sd, prefix, cfg):
    """HCodec-2.0 decoder (HCodec-2.0/vq/codec_decoder.py:14-72): plain conv
    embed after repeat-interleave; prior_net sequential indices 0,1 res /
    3 transformer / 5,6 res / 7 groupnorm; ConvNeXt post stack; ISTFT head."""
    return {
        "embed": _hconv(sd, f"{prefix}.embed"),
        "prior_net": {
            "res0": _resnet_block(sd, f"{prefix}.prior_net.0"),
            "res1": _resnet_block(sd, f"{prefix}.prior_net.1"),
            "transformer": _hybrid_transformer(sd, f"{prefix}.prior_net.3"),
            "res2": _resnet_block(sd, f"{prefix}.prior_net.5"),
            "res3": _resnet_block(sd, f"{prefix}.prior_net.6"),
            "norm_out": _groupnorm(sd, f"{prefix}.prior_net.7"),
        },
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "post_net": _convnext_stack(sd, f"{prefix}.post_net",
                                    cfg.decoder_convnext_layers),
        "final_layer_norm": _layernorm(sd, f"{prefix}.final_layer_norm"),
        "head": {"out": _linear(sd, f"{prefix}.head.out")},
    }


def convert_hcodec20(state_dict: Dict, cfg) -> Dict:
    """HCodec-2.0 checkpoint (torch Codec state dict, HCodec-2.0/vq/codec.py)
    -> {"params", "codebook"} for models.hcodec.HCodec(version='2.0')."""
    sd = dict(state_dict)
    params = {
        "encoder": _codec_encoder20(sd, "encoder", cfg),
        "decoder": _codec_decoder20(sd, "decoder", cfg),
        "semantic_encoder": _semantic_encoder(sd, "semantic_encoder",
                                              cfg.semantic_strides),
        "semantic_decoder": _semantic_decoder(sd, "semantic_decoder",
                                              cfg.semantic_strides),
    }
    codebook = {
        "quantizer": _rvq(sd, "quantizer", cfg.num_quantizers),
        "semantic_quantizer": _rvq(sd, "semantic_quantizer",
                                   cfg.num_quantizers),
    }
    return {"params": params, "codebook": codebook}


def convert_hcodec10(state_dict: Dict, cfg) -> Dict:
    """weights.pt -> {"params": ..., "codebook": ...} for models.hcodec.HCodec."""
    sd = dict(state_dict)
    params = {
        "encoder": _seanet_encoder(sd, "encoder"),
        "semantic_encoder": _semantic_encoder(sd, "semantic_encoder",
                                              cfg.semantic_strides),
        "semantic_decoder": _semantic_decoder(sd, "semantic_decoder",
                                              cfg.semantic_strides),
        "decoder": _codec_decoder(sd, "decoder", cfg.decoder_convnext_layers),
    }
    codebook = {
        "quantizer": _rvq(sd, "quantizer", cfg.num_quantizers),
        "semantic_quantizer": _rvq(sd, "semantic_quantizer",
                                   cfg.num_quantizers),
    }
    return {"params": params, "codebook": codebook}


# ---------------------------------------------------------------------------
# Inverse exporter (torch-style state dict from our tree) for round-trip tests
# ---------------------------------------------------------------------------

from .convert_bicodec import _folded  # noqa: E402


def _inv_sconv(p, prefix, out):
    out[f"{prefix}.conv.conv.weight"] = _folded(p).transpose(2, 1, 0)
    if "bias" in p:
        out[f"{prefix}.conv.conv.bias"] = np.asarray(p["bias"])


def _inv_hconv(p, prefix, out, wrapped=True):
    key = f"{prefix}.conv" if wrapped else prefix
    out[f"{key}.weight"] = np.asarray(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"])


def _inv_linear(p, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_gn(p, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_lstm(p, prefix, out):
    for name, v in p.items():
        if name.startswith("w_"):
            out[f"{prefix}.{name.replace('w_', 'weight_')}"] = np.asarray(v).T
        else:
            out[f"{prefix}.{name.replace('b_', 'bias_')}"] = np.asarray(v)


def _inv_transformer(p, prefix, out):
    for name, layer in p.items():
        i = name.split("_")[1]
        lp = f"{prefix}.layers.{i}"
        _inv_lstm(layer["self_attn"]["rnn"], f"{lp}.self_attn.rnn", out)
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _inv_linear(layer["self_attn"][proj], f"{lp}.self_attn.{proj}", out)
        for w in ("w1", "w2", "w3"):
            _inv_linear(layer["mlp"][w], f"{lp}.mlp.{w}", out)
        out[f"{lp}.input_layernorm.weight"] = np.asarray(
            layer["input_layernorm"]["weight"])
        out[f"{lp}.post_attention_layernorm.weight"] = np.asarray(
            layer["post_attention_layernorm"]["weight"])


def _inv_semantic_unit(p, prefix, out):
    _inv_hconv(p["conv1"], f"{prefix}.conv1", out)
    out[f"{prefix}.conv2.weight"] = np.asarray(
        p["conv2"]["kernel"]).transpose(2, 1, 0)


def export_hcodec10_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    p = variables["params"]
    cb = variables["codebook"]
    out: Dict[str, np.ndarray] = {}

    enc = p["encoder"]
    _inv_sconv(enc["conv_in"], "encoder.model.0", out)
    for i in range(4):
        res = f"encoder.model.{1 + 3 * i}"
        _inv_sconv(enc[f"res_{i}_0"]["block_0"], f"{res}.block.1", out)
        _inv_sconv(enc[f"res_{i}_0"]["block_1"], f"{res}.block.3", out)
        _inv_sconv(enc[f"res_{i}_0"]["shortcut"], f"{res}.shortcut", out)
        _inv_sconv(enc[f"down_{i}"], f"encoder.model.{3 + 3 * i}", out)
    _inv_transformer(enc["transformer"], "encoder.model.14", out)
    _inv_sconv(enc["conv_out"], "encoder.model.17", out)

    for qname in ("quantizer", "semantic_quantizer"):
        _inv_rvq(cb, qname, out)
    for sname in ("semantic_encoder", "semantic_decoder"):
        _inv_semantic_branch(p[sname], sname, cfg.semantic_strides, out)

    dec = p["decoder"]
    out["decoder.embed.up.weight"] = np.asarray(
        dec["embed"]["up_kernel"]).transpose(2, 1, 0)
    out["decoder.embed.up.bias"] = np.asarray(dec["embed"]["up_bias"])
    out["decoder.embed.dw.weight"] = np.asarray(
        dec["embed"]["dw_kernel"]).transpose(2, 1, 0)
    out["decoder.embed.dw.bias"] = np.asarray(dec["embed"]["bias"])
    _inv_prior_net(dec["prior_net"], "decoder.prior_net", out)
    _inv_ln(dec["norm"], "decoder.norm", out)
    _inv_ln(dec["final_layer_norm"], "decoder.final_layer_norm", out)
    _inv_linear(dec["head"]["out"], "decoder.head.out", out)
    _inv_convnext_stack(dec["post_net"], "decoder.post_net", out)
    return out


def _inv_convnext_stack(p, prefix, out):
    import jax

    stacked = p["stack"]["block"]
    n = np.asarray(stacked["norm"]["scale"]).shape[0]
    for i in range(n):
        blk = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
        bp = f"{prefix}.{i}"
        _inv_hconv(blk["dwconv"], f"{bp}.dwconv", out)
        out[f"{bp}.norm.weight"] = blk["norm"]["scale"]
        out[f"{bp}.norm.bias"] = blk["norm"]["bias"]
        _inv_linear(blk["pwconv1"], f"{bp}.pwconv1.linear", out)
        _inv_linear(blk["pwconv2"], f"{bp}.pwconv2.linear", out)
        out[f"{bp}.gamma"] = blk["gamma"]


def _inv_ln(p, prefix, out):
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _inv_semantic_branch(p, sname, strides, out):
    first = "conv" if sname == "semantic_encoder" else "conv1"
    _inv_hconv(p[first], f"{sname}.{first}", out)
    for i, stride in enumerate(strides):
        bp = f"{sname}.conv_blocks.{i}"
        block = p[f"block_{i}"]
        if sname == "semantic_decoder" and stride > 1:
            k = np.asarray(block["conv"]["kernel"]).transpose(1, 2, 0)
            out[f"{bp}.conv.deconv.weight"] = k
            out[f"{bp}.conv.deconv.bias"] = np.asarray(block["conv"]["bias"])
        else:
            _inv_hconv(block["conv"], f"{bp}.conv", out)
        _inv_semantic_unit(block["res_0"], f"{bp}.res_units.0", out)
        _inv_semantic_unit(block["res_1"], f"{bp}.res_units.1", out)
    _inv_hconv(p["conv2"], f"{sname}.conv2", out)


def _inv_rvq(cb, qname, out):
    for lname, layer in cb[qname].items():
        i = lname.split("_")[1]
        pre = f"{qname}.layers.{i}._codebook"
        out[f"{pre}.embed"] = np.asarray(layer["embed"])[None]
        out[f"{pre}.embed_avg"] = np.asarray(layer["embed_avg"])[None]
        out[f"{pre}.cluster_size"] = np.asarray(layer["cluster_size"])[None]
        out[f"{pre}.initted"] = np.asarray(layer["inited"]).reshape(1)


def _inv_prior_net(pn, prefix, out):
    for ours, theirs in (("res0", 0), ("res1", 1), ("res2", 5), ("res3", 6)):
        rp = f"{prefix}.{theirs}"
        _inv_gn(pn[ours]["norm1"], f"{rp}.norm1", out)
        _inv_hconv(pn[ours]["conv1"], f"{rp}.conv1", out)
        _inv_gn(pn[ours]["norm2"], f"{rp}.norm2", out)
        _inv_hconv(pn[ours]["conv2"], f"{rp}.conv2", out)
    _inv_transformer(pn["transformer"], f"{prefix}.3", out)
    _inv_gn(pn["norm_out"], f"{prefix}.7", out)


def export_hcodec20_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    """Our HCodec-2.0 variables -> a reference-layout torch state dict
    (round-trip partner of convert_hcodec20)."""
    p = variables["params"]
    out: Dict[str, np.ndarray] = {}

    enc = p["encoder"]
    _inv_hconv(enc["embed"], "encoder.embed", out)
    _inv_ln(enc["norm"], "encoder.norm", out)
    _inv_convnext_stack(enc["prior_net"], "encoder.prior_net", out)
    _inv_transformer(enc["post_net"], "encoder.post_net.1", out)
    _inv_ln(enc["final_layer_norm"], "encoder.final_layer_norm", out)
    _inv_hconv(enc["out"], "encoder.out", out)

    dec = p["decoder"]
    _inv_hconv(dec["embed"], "decoder.embed", out)
    _inv_prior_net(dec["prior_net"], "decoder.prior_net", out)
    _inv_ln(dec["norm"], "decoder.norm", out)
    _inv_convnext_stack(dec["post_net"], "decoder.post_net", out)
    _inv_ln(dec["final_layer_norm"], "decoder.final_layer_norm", out)
    _inv_linear(dec["head"]["out"], "decoder.head.out", out)

    for qname in ("quantizer", "semantic_quantizer"):
        _inv_rvq(variables["codebook"], qname, out)
    for sname in ("semantic_encoder", "semantic_decoder"):
        _inv_semantic_branch(p[sname], sname, cfg.semantic_strides, out)
    return out


# ---------------------------------------------------------------------------
# HCodec-1.5 adaptive line (HCodec-1.5/vq/codec_adaptive.py:28-209 + the
# Mimi aggregators/bottleneck, adaptive/model_blocks/mimi/transformer.py).
# encoder / decoder / semantic modules / RVQ are byte-identical files to 1.0
# (verified by diff) so those mappings are shared; new pieces are the two
# QueryTokenAggregators and the 32-layer bottleneck ProjectedTransformer.
# ---------------------------------------------------------------------------

def _mimi_layer(sd, prefix):
    """Mimi StreamingTransformerLayer params (transformer.py:436-551):
    LayerNorms, fused qkv in_proj (no bias), out_proj, gelu MLP, LayerScale."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "in_proj": {"kernel": _t(sd[f"{prefix}.self_attn.in_proj_weight"]).T},
        "out_proj": {
            "kernel": _t(sd[f"{prefix}.self_attn.out_proj.weight"]).T},
        "linear1": {"kernel": _t(sd[f"{prefix}.linear1.weight"]).T},
        "linear2": {"kernel": _t(sd[f"{prefix}.linear2.weight"]).T},
        "layer_scale_1": _t(sd[f"{prefix}.layer_scale_1.scale"]),
        "layer_scale_2": _t(sd[f"{prefix}.layer_scale_2.scale"]),
    }


def _mimi_transformer(sd, prefix, num_layers):
    """Per-layer mimi modules -> our nn.scan stacked layout."""
    import jax

    layers = [{"layer": _mimi_layer(sd, f"{prefix}.layers.{i}")}
              for i in range(num_layers)]
    return {"layers": jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *layers)}


def _aggregator(sd, prefix, num_layers):
    return {
        # reference query_embedding is (1, D, 1)
        "query_embedding": _t(sd[f"{prefix}.query_embedding"]).reshape(-1),
        "transformer": _mimi_transformer(
            sd, f"{prefix}.transformer.transformer", num_layers),
    }


def convert_hcodec15(state_dict: Dict, cfg) -> Dict:
    """hcode_1.5_adaptive .pt state dict ->
    {"params", "codebook"} for models.hcodec.adaptive.AdaptiveHCodec.

    ``cfg`` is an AdaptiveConfig (adaptive15_config() for the shipped model).
    """
    sd = dict(state_dict)
    base = cfg.base
    params = {
        "encoder": _seanet_encoder(sd, "encoder"),
        "semantic_encoder": _semantic_encoder(sd, "semantic_encoder",
                                              base.semantic_strides),
        "semantic_decoder": _semantic_decoder(sd, "semantic_decoder",
                                              base.semantic_strides),
        "decoder": _codec_decoder(sd, "decoder", base.decoder_convnext_layers),
        "acoustic_aggregator": _aggregator(
            sd, "acoustic_aggregator", cfg.aggregator_layers),
        "semantic_aggregator": _aggregator(
            sd, "semantic_aggregator", cfg.aggregator_layers),
        "bottleneck": {"transformer": _mimi_transformer(
            sd, "bottleneck_transformer.transformer", cfg.bottleneck_layers)},
    }
    codebook = {
        "quantizer": _rvq(sd, "quantizer", base.num_quantizers),
        "semantic_quantizer": _rvq(sd, "semantic_quantizer",
                                   base.num_quantizers),
    }
    return {"params": params, "codebook": codebook}


def _inv_mimi_transformer(p, prefix, out):
    import jax

    stacked = p["layers"]["layer"]
    n = np.asarray(stacked["layer_scale_1"]).shape[0]
    for i in range(n):
        blk = jax.tree_util.tree_map(lambda x: np.asarray(x)[i], stacked)
        lp = f"{prefix}.layers.{i}"
        _inv_ln(blk["norm1"], f"{lp}.norm1", out)
        _inv_ln(blk["norm2"], f"{lp}.norm2", out)
        out[f"{lp}.self_attn.in_proj_weight"] = np.asarray(
            blk["in_proj"]["kernel"]).T
        out[f"{lp}.self_attn.out_proj.weight"] = np.asarray(
            blk["out_proj"]["kernel"]).T
        out[f"{lp}.linear1.weight"] = np.asarray(blk["linear1"]["kernel"]).T
        out[f"{lp}.linear2.weight"] = np.asarray(blk["linear2"]["kernel"]).T
        out[f"{lp}.layer_scale_1.scale"] = np.asarray(blk["layer_scale_1"])
        out[f"{lp}.layer_scale_2.scale"] = np.asarray(blk["layer_scale_2"])


def export_hcodec15_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    """Inverse of convert_hcodec15 (round-trip testing / torch interop)."""
    base = cfg.base
    p = variables["params"]
    cb = variables["codebook"]
    out: Dict[str, np.ndarray] = {}

    enc = p["encoder"]
    _inv_sconv(enc["conv_in"], "encoder.model.0", out)
    for i in range(4):
        res = f"encoder.model.{1 + 3 * i}"
        _inv_sconv(enc[f"res_{i}_0"]["block_0"], f"{res}.block.1", out)
        _inv_sconv(enc[f"res_{i}_0"]["block_1"], f"{res}.block.3", out)
        _inv_sconv(enc[f"res_{i}_0"]["shortcut"], f"{res}.shortcut", out)
        _inv_sconv(enc[f"down_{i}"], f"encoder.model.{3 + 3 * i}", out)
    _inv_transformer(enc["transformer"], "encoder.model.14", out)
    _inv_sconv(enc["conv_out"], "encoder.model.17", out)

    for qname in ("quantizer", "semantic_quantizer"):
        _inv_rvq(cb, qname, out)
    for sname in ("semantic_encoder", "semantic_decoder"):
        _inv_semantic_branch(p[sname], sname, base.semantic_strides, out)

    dec = p["decoder"]
    out["decoder.embed.up.weight"] = np.asarray(
        dec["embed"]["up_kernel"]).transpose(2, 1, 0)
    out["decoder.embed.up.bias"] = np.asarray(dec["embed"]["up_bias"])
    out["decoder.embed.dw.weight"] = np.asarray(
        dec["embed"]["dw_kernel"]).transpose(2, 1, 0)
    out["decoder.embed.dw.bias"] = np.asarray(dec["embed"]["bias"])
    _inv_prior_net(dec["prior_net"], "decoder.prior_net", out)
    _inv_ln(dec["norm"], "decoder.norm", out)
    _inv_ln(dec["final_layer_norm"], "decoder.final_layer_norm", out)
    _inv_linear(dec["head"]["out"], "decoder.head.out", out)
    _inv_convnext_stack(dec["post_net"], "decoder.post_net", out)

    for aname in ("acoustic_aggregator", "semantic_aggregator"):
        out[f"{aname}.query_embedding"] = np.asarray(
            p[aname]["query_embedding"]).reshape(1, -1, 1)
        _inv_mimi_transformer(p[aname]["transformer"],
                              f"{aname}.transformer.transformer", out)
    _inv_mimi_transformer(p["bottleneck"]["transformer"],
                          "bottleneck_transformer.transformer", out)
    return out


# ---------------------------------------------------------------------------
# FlexiCodec / DualCodec line (HCodec-1.5/adaptive/modeling_flexicodec.py):
# DAC encoder/quantizer/decoder + ConvNeXt semantic adapters + FSQ, plus the
# optional Mimi aggregators/bottleneck (similarity-alignment mode).
# ---------------------------------------------------------------------------

from .convert_bicodec import (  # noqa: E402
    _conv as _bconv, _residual_unit, _snake, _wave_generator,
)


def _dac_encoder(sd, prefix, n_rates):
    p = {"conv_pre": _bconv(sd, f"{prefix}.block.0", weight_norm=True)}
    for i in range(n_rates):
        bp = f"{prefix}.block.{i + 1}.block"
        p[f"block_{i}"] = {
            "res_0": _residual_unit(sd, f"{bp}.0"),
            "res_1": _residual_unit(sd, f"{bp}.1"),
            "res_2": _residual_unit(sd, f"{bp}.2"),
            "snake": _snake(sd, f"{bp}.3.alpha"),
            "down": _bconv(sd, f"{bp}.4", weight_norm=True),
        }
    p["snake_post"] = _snake(sd, f"{prefix}.block.{n_rates + 1}.alpha")
    p["conv_post"] = _bconv(sd, f"{prefix}.block.{n_rates + 2}",
                            weight_norm=True)
    return p


def _dac_rvq(sd, prefix, n_codebooks):
    p = {}
    for i in range(n_codebooks):
        qp = f"{prefix}.quantizers.{i}"
        p[f"quantizers_{i}"] = {
            "in_proj": _bconv(sd, f"{qp}.in_proj", weight_norm=True),
            "out_proj": _bconv(sd, f"{qp}.out_proj", weight_norm=True),
            "codebook": _t(sd[f"{qp}.codebook.weight"]),
        }
    return p


def _cnx_adapter(sd, prefix, num_layers, proj_first):
    """convnext_encoder (WNConv1x1 at index 0, blocks after) or
    convnext_decoder (blocks first, WNConv1x1 last)."""
    if proj_first:
        proj_idx, block_ids = 0, range(1, num_layers + 1)
    else:
        proj_idx, block_ids = num_layers, range(num_layers)
    blocks = []
    for i in block_ids:
        bp = f"{prefix}.{i}"
        blocks.append({
            "dwconv": _hconv(sd, f"{bp}.dwconv", wrapped=False),
            "norm": _layernorm(sd, f"{bp}.norm"),
            "pwconv1": _linear(sd, f"{bp}.pwconv1"),
            "pwconv2": _linear(sd, f"{bp}.pwconv2"),
        })
    import jax

    return {
        "proj": _bconv(sd, f"{prefix}.{proj_idx}", weight_norm=True),
        "blocks": {"stack": {"block": jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *blocks)}},
    }


def convert_flexicodec(state_dict: Dict, cfg) -> Dict:
    """FlexiCodec/DualCodec safetensors state dict (hf jiaqili3/flexicodec,
    loaded by adaptive/infer.py:38-43) -> {"params"} for
    models.hcodec.flexicodec.FlexiCodec. ``cfg`` is a FlexiCodecConfig."""
    sd = dict(state_dict)
    from types import SimpleNamespace

    params = {
        "encoder": _dac_encoder(sd, "dac.encoder", len(cfg.encoder_rates)),
        "quantizer": _dac_rvq(sd, "dac.quantizer", cfg.n_codebooks),
        "decoder": _wave_generator(
            sd, "dac.decoder",
            SimpleNamespace(wave_rates=cfg.decoder_rates)),
        "convnext_encoder": _cnx_adapter(
            sd, "convnext_encoder", cfg.convnext_layers, proj_first=True),
        "convnext_decoder": _cnx_adapter(
            sd, "convnext_decoder", cfg.convnext_layers, proj_first=False),
    }
    fsq = {}
    if "semantic_vq.fsq.project_in.weight" in sd:
        fsq = {
            "project_in": _linear(sd, "semantic_vq.fsq.project_in"),
            "project_out": _linear(sd, "semantic_vq.fsq.project_out"),
        }
    params["semantic_vq"] = fsq
    if cfg.use_query_token_aggregator:
        params["semantic_aggregator"] = _aggregator(
            sd, "semantic_aggregator", cfg.agg_layers)
        params["acoustic_aggregator"] = _aggregator(
            sd, "acoustic_aggregator", cfg.agg_layers)
    if cfg.use_bottleneck_transformer:
        params["bottleneck_transformer"] = {"transformer": _mimi_transformer(
            sd, "bottleneck_transformer.transformer", cfg.bottleneck_layers)}
    return {"params": params}


def export_flexicodec_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    """Inverse of convert_flexicodec for round-trip testing."""
    from .convert_bicodec import _folded as _bfolded

    p = variables["params"]
    out: Dict[str, np.ndarray] = {}

    def put_conv(tree, prefix):
        out[f"{prefix}.weight"] = np.asarray(_bfolded(tree)).transpose(2, 1, 0)
        if "bias" in tree:
            out[f"{prefix}.bias"] = np.asarray(tree["bias"])

    def put_snake(tree, prefix):
        out[f"{prefix}.alpha"] = np.asarray(
            tree["alpha"]).transpose(0, 2, 1)

    def put_res(tree, prefix):
        put_snake(tree["snake1"], f"{prefix}.block.0")
        put_conv(tree["conv1"], f"{prefix}.block.1")
        put_snake(tree["snake2"], f"{prefix}.block.2")
        put_conv(tree["conv2"], f"{prefix}.block.3")

    enc = p["encoder"]
    put_conv(enc["conv_pre"], "dac.encoder.block.0")
    n = len(cfg.encoder_rates)
    for i in range(n):
        bp = f"dac.encoder.block.{i + 1}.block"
        blk = enc[f"block_{i}"]
        for j in range(3):
            put_res(blk[f"res_{j}"], f"{bp}.{j}")
        put_snake(blk["snake"], f"{bp}.3")
        put_conv(blk["down"], f"{bp}.4")
    put_snake(enc["snake_post"], f"dac.encoder.block.{n + 1}")
    put_conv(enc["conv_post"], f"dac.encoder.block.{n + 2}")

    for i in range(cfg.n_codebooks):
        q = p["quantizer"][f"quantizers_{i}"]
        qp = f"dac.quantizer.quantizers.{i}"
        put_conv(q["in_proj"], f"{qp}.in_proj")
        put_conv(q["out_proj"], f"{qp}.out_proj")
        out[f"{qp}.codebook.weight"] = np.asarray(q["codebook"])

    dec = p["decoder"]
    put_conv(dec["conv_pre"], "dac.decoder.model.0")
    for i in range(len(cfg.decoder_rates)):
        bp = f"dac.decoder.model.{i + 1}.block"
        blk = dec[f"block_{i}"]
        put_snake(blk["snake"], f"{bp}.0")
        k = np.asarray(_bfolded(blk["upconv"]))
        out[f"{bp}.1.weight"] = k.transpose(1, 2, 0)
        if "bias" in blk["upconv"]:
            out[f"{bp}.1.bias"] = np.asarray(blk["upconv"]["bias"])
        for j in range(3):
            put_res(blk[f"res_{j}"], f"{bp}.{j + 2}")
    nr = len(cfg.decoder_rates)
    put_snake(dec["snake_post"], f"dac.decoder.model.{nr + 1}")
    put_conv(dec["conv_post"], f"dac.decoder.model.{nr + 2}")

    import jax

    def put_cnx(tree, prefix, proj_first):
        L = np.asarray(
            tree["blocks"]["stack"]["block"]["norm"]["scale"]).shape[0]
        if proj_first:
            proj_idx, block_ids = 0, range(1, L + 1)
        else:
            proj_idx, block_ids = L, range(L)
        put_conv(tree["proj"], f"{prefix}.{proj_idx}")
        stacked = tree["blocks"]["stack"]["block"]
        for n_i, i in enumerate(block_ids):
            blk = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[n_i], stacked)
            bp = f"{prefix}.{i}"
            out[f"{bp}.dwconv.weight"] = np.asarray(
                blk["dwconv"]["kernel"]).transpose(2, 1, 0)
            out[f"{bp}.dwconv.bias"] = np.asarray(blk["dwconv"]["bias"])
            out[f"{bp}.norm.weight"] = np.asarray(blk["norm"]["scale"])
            out[f"{bp}.norm.bias"] = np.asarray(blk["norm"]["bias"])
            out[f"{bp}.pwconv1.weight"] = np.asarray(
                blk["pwconv1"]["kernel"]).T
            out[f"{bp}.pwconv1.bias"] = np.asarray(blk["pwconv1"]["bias"])
            out[f"{bp}.pwconv2.weight"] = np.asarray(
                blk["pwconv2"]["kernel"]).T
            out[f"{bp}.pwconv2.bias"] = np.asarray(blk["pwconv2"]["bias"])

    put_cnx(p["convnext_encoder"], "convnext_encoder", True)
    put_cnx(p["convnext_decoder"], "convnext_decoder", False)

    if p.get("semantic_vq"):
        out["semantic_vq.fsq.project_in.weight"] = np.asarray(
            p["semantic_vq"]["project_in"]["kernel"]).T
        out["semantic_vq.fsq.project_in.bias"] = np.asarray(
            p["semantic_vq"]["project_in"]["bias"])
        out["semantic_vq.fsq.project_out.weight"] = np.asarray(
            p["semantic_vq"]["project_out"]["kernel"]).T
        out["semantic_vq.fsq.project_out.bias"] = np.asarray(
            p["semantic_vq"]["project_out"]["bias"])

    for aname in ("semantic_aggregator", "acoustic_aggregator"):
        if aname in p:
            out[f"{aname}.query_embedding"] = np.asarray(
                p[aname]["query_embedding"]).reshape(1, -1, 1)
            _inv_mimi_transformer(p[aname]["transformer"],
                                  f"{aname}.transformer.transformer", out)
    if "bottleneck_transformer" in p:
        _inv_mimi_transformer(
            p["bottleneck_transformer"]["transformer"],
            "bottleneck_transformer.transformer", out)
    return out
