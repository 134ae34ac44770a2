"""Learned UTMOS predictor (the UTMOS column of the H-Codec results table,
BASELINE.md / UniTok-audio/Figure/H-Codec_result.png).

Implements the UTMOS22 strong-learner architecture (sarulab-speech/UTMOS22,
the system behind published "UTMOS" numbers): a FROZEN wav2vec2-style SSL
backbone produces frame features; listener (judge) and data-domain
embeddings are broadcast-concatenated; a bidirectional LSTM and a two-layer
MLP emit per-frame scores whose temporal mean is rescaled to the 5-point
MOS range (score * 2 + 3). At inference the mean listener embedding is used.

Weights are not downloadable in this image (zero egress), so the pipeline is
verified by an export/convert round trip (tests/test_metrics.py):
``convert_utmos`` maps a torch-style state dict in the canonical layout that
``export_utmos_state_dict`` emits (torch ``nn.LSTM(bidirectional=True)``
parameter naming for the BLSTM; plain Linear/Embedding elsewhere). When the
released checkpoint is available its keys map through the same converter
after the documented prefix normalization. Until then
``eval.metrics.utmos`` falls back to the documented signal-feature proxy and
reports which variant produced each number.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.recurrent import lstm_scan


@dataclass(frozen=True)
class UTMOSConfig:
    ssl_dim: int = 768        # wav2vec2-base hidden
    judge_dim: int = 128
    domain_dim: int = 128
    num_judges: int = 3066    # UTMOS22 BVCC+external listener table
    num_domains: int = 3
    blstm_hidden: int = 512
    mlp_hidden: int = 2048


class BLSTM(nn.Module):
    """Bidirectional LSTM, torch nn.LSTM(bidirectional=True)-compatible
    parameter layout: forward (w_ih_l0, ...) + reverse (w_ih_l0_rev, ...)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        h = self.hidden_size
        cin = x.shape[-1]
        init = nn.initializers.uniform(scale=h**-0.5)

        def run(suffix, xs):
            w_ih = self.param(f"w_ih_l0{suffix}", init, (cin, 4 * h))
            w_hh = self.param(f"w_hh_l0{suffix}", init, (h, 4 * h))
            b_ih = self.param(f"b_ih_l0{suffix}", nn.initializers.zeros,
                              (4 * h,))
            b_hh = self.param(f"b_hh_l0{suffix}", nn.initializers.zeros,
                              (4 * h,))
            return lstm_scan(xs, w_ih, w_hh, b_ih, b_hh)

        fwd = run("", x)
        bwd = run("_rev", x[:, ::-1])[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class UTMOSHead(nn.Module):
    """Everything above the frozen SSL backbone."""

    cfg: UTMOSConfig = UTMOSConfig()

    @nn.compact
    def __call__(self, feats, judge_id=None, domain_id=0):
        """feats (B, T, ssl_dim) -> scores (B,) on the 1-5 MOS scale.

        ``judge_id`` None -> mean listener embedding (the published
        inference recipe)."""
        cfg = self.cfg
        b, t, _ = feats.shape
        judge_table = self.param(
            "judge_embedding", nn.initializers.normal(1.0),
            (cfg.num_judges, cfg.judge_dim))
        domain_table = self.param(
            "domain_embedding", nn.initializers.normal(1.0),
            (cfg.num_domains, cfg.domain_dim))
        judge = (jnp.mean(judge_table, axis=0) if judge_id is None
                 else judge_table[judge_id])
        domain = domain_table[domain_id]
        cond = jnp.broadcast_to(
            jnp.concatenate([judge, domain])[None, None],
            (b, t, cfg.judge_dim + cfg.domain_dim))
        x = jnp.concatenate([feats, cond], axis=-1)
        x = BLSTM(cfg.blstm_hidden, name="blstm")(x)
        x = nn.Dense(cfg.mlp_hidden, name="linear1")(x)
        x = nn.relu(x)
        x = nn.Dense(1, name="linear2")(x)
        return jnp.mean(x[..., 0], axis=-1) * 2.0 + 3.0


class UTMOSPredictor:
    """Frozen SSL backbone + UTMOSHead, jitted with variables as arguments
    (remote-compile constraint: weights must not enter the HLO as
    constants, CLAUDE.md #3)."""

    def __init__(self, ssl_model, ssl_variables, head_variables,
                 cfg: UTMOSConfig = UTMOSConfig()):
        self.cfg = cfg
        self.head = UTMOSHead(cfg)
        self.ssl = ssl_model
        self.ssl_variables = ssl_variables
        self.head_variables = head_variables

        @jax.jit
        def _score(ssl_vars, head_vars, wav):
            hs = self.ssl.apply(ssl_vars, wav)
            feats = hs[-1] if isinstance(hs, (list, tuple)) else hs
            return self.head.apply(head_vars, feats)

        self._score = _score

    @classmethod
    def from_random(cls, key, ssl_config=None, cfg: UTMOSConfig = None):
        from ..models.ssl import wav2vec2 as ssl_mod

        cfg = cfg or UTMOSConfig()
        ssl_config = ssl_config or ssl_mod.hubert_base_config()
        k1, k2 = jax.random.split(key)
        ssl = ssl_mod.Wav2Vec2Model(ssl_config)
        ssl_vars = ssl.init(k1, np.zeros((1, 16320), np.float32))
        head = UTMOSHead(cfg)
        head_vars = head.init(
            k2, np.zeros((1, 10, cfg.ssl_dim), np.float32))
        return cls(ssl, ssl_vars, head_vars, cfg)

    def __call__(self, wav: np.ndarray) -> float:
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        return float(np.asarray(
            self._score(self.ssl_variables, self.head_variables,
                        jnp.asarray(wav))).mean())


# ---------------------------------------------------------------------------
# torch checkpoint conversion (canonical layout; see module docstring)
# ---------------------------------------------------------------------------

def _t(x):
    import torch

    return x.detach().cpu().numpy() if isinstance(x, torch.Tensor) \
        else np.asarray(x)


# The released UTMOS22 strong-learner checkpoint is a PyTorch-Lightning
# module whose state-dict keys follow the module's attribute paths
# (sarulab-speech/UTMOS22 strong/model.py + lightning_module.py):
#   feature_extractors.0.*              SSL_model (frozen wav2vec2 wrapper;
#                                       converted separately via models/ssl)
#   feature_extractors.1.embedding.*    DomainEmbedding
#   output_layers.0.judge_embedding.*   LDConditioner listener table
#   output_layers.0.decoder_rnn.*       LDConditioner nn.LSTM(bidirectional)
#   output_layers.1.net.{0,3}.*         Projection Sequential(Linear, ReLU,
#                                       Dropout, Linear)
# This mapping is mirrored here so the real checkpoint converts verbatim
# (weights themselves are env-blocked; the layout is pinned by a torch twin
# with these exact attribute paths in tests/test_metrics.py).
_UTMOS22_KEYMAP = {
    "feature_extractors.1.embedding.weight": "domain_embedding.weight",
    "output_layers.0.judge_embedding.weight": "judge_embedding.weight",
    "output_layers.1.net.0.weight": "linear1.weight",
    "output_layers.1.net.0.bias": "linear1.bias",
    "output_layers.1.net.3.weight": "linear2.weight",
    "output_layers.1.net.3.bias": "linear2.bias",
}


def convert_utmos(state_dict: Dict, cfg: UTMOSConfig = UTMOSConfig()) -> Dict:
    """torch UTMOS head state dict -> head variables. Accepts BOTH the real
    UTMOS22 lightning layout (attribute paths above, ``model.`` prefix
    stripped) and the canonical layout ``export_utmos_state_dict`` emits:
      judge_embedding.weight, domain_embedding.weight,
      blstm.weight_ih_l0 / weight_hh_l0 / bias_ih_l0 / bias_hh_l0
      (+ ``_reverse`` set), linear1.weight/bias, linear2.weight/bias.
    torch LSTM weights are (4H, in) — transposed into our (in, 4H).
    """
    sd = {}
    for k, v in state_dict.items():
        for pre in ("model.", "head.", "mos_predictor."):
            if k.startswith(pre):
                k = k[len(pre):]
        if k.startswith("output_layers.0.decoder_rnn."):
            k = "blstm." + k[len("output_layers.0.decoder_rnn."):]
        k = _UTMOS22_KEYMAP.get(k, k)
        sd[k] = v
    p = {
        "judge_embedding": _t(sd["judge_embedding.weight"]),
        "domain_embedding": _t(sd["domain_embedding.weight"]),
        "blstm": {
            "w_ih_l0": _t(sd["blstm.weight_ih_l0"]).T,
            "w_hh_l0": _t(sd["blstm.weight_hh_l0"]).T,
            "b_ih_l0": _t(sd["blstm.bias_ih_l0"]),
            "b_hh_l0": _t(sd["blstm.bias_hh_l0"]),
            "w_ih_l0_rev": _t(sd["blstm.weight_ih_l0_reverse"]).T,
            "w_hh_l0_rev": _t(sd["blstm.weight_hh_l0_reverse"]).T,
            "b_ih_l0_rev": _t(sd["blstm.bias_ih_l0_reverse"]),
            "b_hh_l0_rev": _t(sd["blstm.bias_hh_l0_reverse"]),
        },
        "linear1": {"kernel": _t(sd["linear1.weight"]).T,
                    "bias": _t(sd["linear1.bias"])},
        "linear2": {"kernel": _t(sd["linear2.weight"]).T,
                    "bias": _t(sd["linear2.bias"])},
    }
    return {"params": p}


def export_utmos_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_utmos (round-trip testing / torch interop)."""
    p = variables["params"]
    out = {
        "judge_embedding.weight": np.asarray(p["judge_embedding"]),
        "domain_embedding.weight": np.asarray(p["domain_embedding"]),
        "linear1.weight": np.asarray(p["linear1"]["kernel"]).T,
        "linear1.bias": np.asarray(p["linear1"]["bias"]),
        "linear2.weight": np.asarray(p["linear2"]["kernel"]).T,
        "linear2.bias": np.asarray(p["linear2"]["bias"]),
    }
    b = p["blstm"]
    for ours, theirs in (("", ""), ("_rev", "_reverse")):
        out[f"blstm.weight_ih_l0{theirs}"] = np.asarray(
            b[f"w_ih_l0{ours}"]).T
        out[f"blstm.weight_hh_l0{theirs}"] = np.asarray(
            b[f"w_hh_l0{ours}"]).T
        out[f"blstm.bias_ih_l0{theirs}"] = np.asarray(b[f"b_ih_l0{ours}"])
        out[f"blstm.bias_hh_l0{theirs}"] = np.asarray(b[f"b_hh_l0{ours}"])
    return out
