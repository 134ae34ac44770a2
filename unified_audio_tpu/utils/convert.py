"""Checkpoint converters: torch/HF state dicts -> this framework's pytrees.

Weight norm is folded at conversion (the reference folds it at load too,
bicodec.py:223-231). Conv kernels transpose (out, in, K) -> (K, in, out);
Linear kernels transpose (out, in) -> (in, out).

Covered:
* HF wav2vec2-family (HuBERT / WavLM / wav2vec2) -> models.ssl.Wav2Vec2Model
* HF Llama layers (as used by CustomLlamaModel, llm.py:63-82) ->
  models.lm.LlamaBackbone
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _t(x):  # torch tensor -> numpy
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _fold_weight_norm(sd, prefix):
    """Return the folded conv weight for torch weight_norm params, handling
    both legacy (weight_g/weight_v) and parametrized names."""
    if f"{prefix}.weight" in sd:
        return _t(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g = _t(sd[f"{prefix}.weight_g"])
        v = _t(sd[f"{prefix}.weight_v"])
    else:
        g = _t(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _t(sd[f"{prefix}.parametrizations.weight.original1"])
    # torch pos-conv weight norm uses dim=2; general: broadcast g over v/||v||
    axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1) if g.ndim == v.ndim else None
    if axes is None:
        # dim=0 convention: per-out-channel scale
        norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(1)).reshape(
            (-1,) + (1,) * (v.ndim - 1)
        )
        return v / norm * g.reshape((-1,) + (1,) * (v.ndim - 1))
    norm = np.sqrt((v**2).sum(axis=axes, keepdims=True))
    return v / norm * g


def convert_hf_wav2vec2(state_dict: Dict, config) -> Dict:
    """HF Wav2Vec2Model/HubertModel/WavLMModel state_dict -> flax params for
    models.ssl.wav2vec2.Wav2Vec2Model. Keys may carry a model prefix
    (e.g. "wav2vec2.")."""
    sd = {}
    for k, v in state_dict.items():
        for pref in ("wav2vec2.", "hubert.", "wavlm.", "model."):
            if k.startswith(pref):
                k = k[len(pref):]
                break
        sd[k] = v

    p: Dict = {}
    fe: Dict = {}
    for i in range(len(config.conv_dim)):
        w = _t(sd[f"feature_extractor.conv_layers.{i}.conv.weight"])
        fe[f"conv_{i}_kernel"] = w.transpose(2, 1, 0)
        if f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            fe[f"conv_{i}_bias"] = _t(
                sd[f"feature_extractor.conv_layers.{i}.conv.bias"]
            )
        ln = f"feature_extractor.conv_layers.{i}.layer_norm"
        if f"{ln}.weight" in sd:
            fe[f"norm_{i}"] = _layernorm(sd, ln)
    p["feature_extractor"] = fe
    p["feature_projection_norm"] = _layernorm(sd, "feature_projection.layer_norm")
    p["feature_projection"] = _linear(sd, "feature_projection.projection")

    pos_w = _fold_weight_norm(sd, "encoder.pos_conv_embed.conv")
    p["pos_conv_embed"] = {
        "kernel": pos_w.transpose(2, 1, 0),
        "bias": _t(sd["encoder.pos_conv_embed.conv.bias"]),
    }
    p["encoder_layer_norm"] = _layernorm(sd, "encoder.layer_norm")

    def layer_params(i):
        pre = f"encoder.layers.{i}"
        attn = {
            "q_proj": _linear(sd, f"{pre}.attention.q_proj"),
            "k_proj": _linear(sd, f"{pre}.attention.k_proj"),
            "v_proj": _linear(sd, f"{pre}.attention.v_proj"),
            "out_proj": _linear(sd, f"{pre}.attention.out_proj"),
        }
        if config.use_rel_pos_bias:
            attn["gru_rel_pos_linear"] = _linear(
                sd, f"{pre}.attention.gru_rel_pos_linear"
            )
            attn["gru_rel_pos_const"] = _t(
                sd[f"{pre}.attention.gru_rel_pos_const"]
            )
            if f"{pre}.attention.rel_attn_embed.weight" in sd:
                attn["rel_attn_embed"] = _t(
                    sd[f"{pre}.attention.rel_attn_embed.weight"]
                )
        return {
            "attention": attn,
            "layer_norm": _layernorm(sd, f"{pre}.layer_norm"),
            "intermediate_dense": _linear(sd, f"{pre}.feed_forward.intermediate_dense"),
            "output_dense": _linear(sd, f"{pre}.feed_forward.output_dense"),
            "final_layer_norm": _layernorm(sd, f"{pre}.final_layer_norm"),
        }

    # layer 0 separate (owns the WavLM rel-pos table); 1..N-1 stacked for the
    # nn.scan stack
    p["layers_0"] = layer_params(0)
    if config.num_layers > 1:
        import jax

        rest = [layer_params(i) for i in range(1, config.num_layers)]
        p["layers_rest"] = {
            "layer": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *rest)
        }
    return {"params": p}


def convert_hf_llama_layers(state_dict: Dict, num_layers: int) -> Dict:
    """HF LlamaModel layers/norm -> models.lm.LlamaBackbone params.
    Accepts the CustomLlamaModel checkpoint layout (llm.py:74-77: keys
    layers.{i}..., norm.weight). The backbone is an nn.scan stack, so per-layer
    tensors are stacked along a leading layer axis."""
    sd = dict(state_dict)
    per_layer = []
    for i in range(num_layers):
        pre = f"layers.{i}"
        qkv = np.concatenate([
            _t(sd[f"{pre}.self_attn.q_proj.weight"]).T,
            _t(sd[f"{pre}.self_attn.k_proj.weight"]).T,
            _t(sd[f"{pre}.self_attn.v_proj.weight"]).T,
        ], axis=1)
        gate_up = np.concatenate([
            _t(sd[f"{pre}.mlp.gate_proj.weight"]).T,
            _t(sd[f"{pre}.mlp.up_proj.weight"]).T,
        ], axis=1)
        per_layer.append({
            "self_attn": {
                "qkv_proj": {"kernel": qkv},
                "o_proj": _linear(sd, f"{pre}.self_attn.o_proj"),
            },
            "mlp": {
                "gate_up_proj": {"kernel": gate_up},
                "down_proj": _linear(sd, f"{pre}.mlp.down_proj"),
            },
            "input_layernorm": {
                "weight": _t(sd[f"{pre}.input_layernorm.weight"])
            },
            "post_attention_layernorm": {
                "weight": _t(sd[f"{pre}.post_attention_layernorm.weight"])
            },
        })
    import jax

    stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *per_layer)
    return {"layers": stacked, "norm": {"weight": _t(sd["norm.weight"])}}


def convert_custom_llama(state_dict: Dict, cfg) -> Dict:
    """Full CustomLlamaModel/LLM_SFT checkpoint -> models.lm params.

    Maps codec_embedding/output_head plus the SFT extras (task_embedding,
    enroll/mix sos embeddings, adapter) when present.
    """
    sd = {k.replace("dnn.", ""): v for k, v in state_dict.items()}
    lm = {
        "codec_embedding": {"embedding": _t(sd["codec_embedding.weight"])},
        "backbone": convert_hf_llama_layers(
            {k: v for k, v in sd.items()
             if k.startswith("layers.") or k == "norm.weight"},
            cfg.num_layers,
        ),
        "output_head": {"kernel": _t(sd["output_head.weight"]).T},
    }
    p = {"lm": lm}
    if "task_embedding.weight" in sd:
        p["task_embedding"] = {"embedding": _t(sd["task_embedding.weight"])}
        p["enroll_sos_embedding"] = _t(sd["enroll_sos_embedding.weight"])
        p["mix_sos_embedding"] = _t(sd["mix_sos_embedding.weight"])
        p["adapter"] = _linear(sd, "adapter")
        return {"params": p}
    p["mix_sos_embedding"] = _t(sd["mix_sos_embedding.weight"])
    return {"params": p}


def export_custom_llama_state_dict(variables, cfg) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_custom_llama`: LLMSFT/CodecLM flax params ->
    a torch-layout state dict (Linear (out, in); per-layer keys with split
    q/k/v and gate/up), matching the reference checkpoint format
    (UniSE model.py:82-91 saves exactly these LM-only keys)."""
    p = variables["params"]
    lm = p["lm"]
    d = cfg.hidden_size
    sd: Dict[str, np.ndarray] = {
        "codec_embedding.weight": np.asarray(lm["codec_embedding"]["embedding"]),
        "output_head.weight": np.asarray(lm["output_head"]["kernel"]).T,
        "norm.weight": np.asarray(lm["backbone"]["norm"]["weight"]),
    }
    layers = lm["backbone"]["layers"]
    for i in range(cfg.num_layers):
        pre = f"layers.{i}"
        qkv = np.asarray(layers["self_attn"]["qkv_proj"]["kernel"][i])
        q, k, v = qkv[:, :d], qkv[:, d:2*d], qkv[:, 2*d:]
        sd[f"{pre}.self_attn.q_proj.weight"] = q.T
        sd[f"{pre}.self_attn.k_proj.weight"] = k.T
        sd[f"{pre}.self_attn.v_proj.weight"] = v.T
        sd[f"{pre}.self_attn.o_proj.weight"] = np.asarray(
            layers["self_attn"]["o_proj"]["kernel"][i]).T
        gate_up = np.asarray(layers["mlp"]["gate_up_proj"]["kernel"][i])
        inter = gate_up.shape[1] // 2
        sd[f"{pre}.mlp.gate_proj.weight"] = gate_up[:, :inter].T
        sd[f"{pre}.mlp.up_proj.weight"] = gate_up[:, inter:].T
        sd[f"{pre}.mlp.down_proj.weight"] = np.asarray(
            layers["mlp"]["down_proj"]["kernel"][i]).T
        sd[f"{pre}.input_layernorm.weight"] = np.asarray(
            layers["input_layernorm"]["weight"][i])
        sd[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            layers["post_attention_layernorm"]["weight"][i])
    if "task_embedding" in p:
        sd["task_embedding.weight"] = np.asarray(
            p["task_embedding"]["embedding"])
        sd["enroll_sos_embedding.weight"] = np.asarray(
            p["enroll_sos_embedding"])
        sd["mix_sos_embedding.weight"] = np.asarray(p["mix_sos_embedding"])
        sd["adapter.weight"] = np.asarray(p["adapter"]["kernel"]).T
        sd["adapter.bias"] = np.asarray(p["adapter"]["bias"])
    elif "mix_sos_embedding" in p:
        sd["mix_sos_embedding.weight"] = np.asarray(p["mix_sos_embedding"])
    return sd


# ---------------------------------------------------------------------------
# SenseVoice SAN-M teacher encoder (funasr SenseVoiceSmall state-dict layout)
# ---------------------------------------------------------------------------

def _sanm_layer(sd, prefix):
    """One funasr EncoderLayerSANM -> models/ssl/sanm.SANMLayer params.
    fsmn_block is a depthwise torch Conv1d: weight (C, 1, K) -> (K, C)."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "self_attn": {
            "linear_q_k_v": _linear(sd, f"{prefix}.self_attn.linear_q_k_v"),
            "linear_out": _linear(sd, f"{prefix}.self_attn.linear_out"),
            "fsmn_kernel": _t(
                sd[f"{prefix}.self_attn.fsmn_block.weight"])[:, 0, :].T,
        },
        "ff_w1": _linear(sd, f"{prefix}.feed_forward.w_1"),
        "ff_w2": _linear(sd, f"{prefix}.feed_forward.w_2"),
    }


def _stack_layers(layers):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *layers)


def convert_sensevoice(state_dict: Dict, cfg) -> Dict:
    """funasr SenseVoiceSmall state dict -> SenseVoiceSemanticEncoder
    variables (models/ssl/sanm.py). Key layout per the public funasr source:
    ``encoder.encoders0.0.*`` (560->512), ``encoder.encoders.{i}.*`` (49),
    ``encoder.tp_encoders.{i}.*`` (20), ``encoder.{after_norm,tp_norm}``,
    ``embed.weight`` (the language/event/emotion/textnorm query table the
    reference's prepend_inputs indexes — modeling_flexicodec.py:60-66)."""
    sd = state_dict
    enc = {
        "encoders0_0": _sanm_layer(sd, "encoder.encoders0.0"),
        "encoders": {"layer": _stack_layers(
            [_sanm_layer(sd, f"encoder.encoders.{i}")
             for i in range(cfg.num_blocks - 1)])},
        "tp_encoders": {"layer": _stack_layers(
            [_sanm_layer(sd, f"encoder.tp_encoders.{i}")
             for i in range(cfg.tp_blocks)])},
        "after_norm": _layernorm(sd, "encoder.after_norm"),
        "tp_norm": _layernorm(sd, "encoder.tp_norm"),
    }
    return {"params": {
        "query_embed": _t(sd["embed.weight"])[: cfg.embed_vocab],
        "encoder": enc,
    }}
