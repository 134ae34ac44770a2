"""Device mesh + sharding rules.

The reference's only parallelism is PyTorch-Lightning DDP (train.py:35). The
TPU-native equivalent is GSPMD: we build a Mesh over (dp, tp) axes, annotate
batch and parameter shardings with NamedSharding, and let XLA insert the
collectives (psum for grads over dp rides ICI; tp shards the LM's attention
heads and MLP). VQ codebook EMA sync uses lax.psum over "dp" inside the step
(see ops/quant.py), replacing torch.distributed all_reduce+broadcast.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp defaults to len(devices)//tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_mesh_axes(devices=None, **axes) -> Mesh:
    """Mesh with arbitrary named axes, e.g. ``make_mesh_axes(dp=2, pp=4)`` or
    ``make_mesh_axes(dp=2, tp=2, sp=2)``. Axis order = kwarg order (earlier
    axes get the slower-varying device dimension)."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(axes.values())))
    assert n == len(devices), (axes, len(devices))
    arr = np.asarray(devices).reshape(tuple(axes.values()))
    return Mesh(arr, axis_names=tuple(axes.keys()))


# Parameter-path regex -> PartitionSpec for the LM. Everything unmatched is
# replicated. Kernel layout is (in, out) for Dense.
LM_RULES: Sequence = (
    (r".*self_attn/qkv_proj/kernel", P(None, "tp")),
    (r".*self_attn/o_proj/kernel", P("tp", None)),
    (r".*mlp/gate_up_proj/kernel", P(None, "tp")),
    (r".*mlp/down_proj/kernel", P("tp", None)),
    (r".*output_head/kernel", P(None, "tp")),
    (r".*codec_embedding/embedding", P(None, "tp")),
    # expert parallelism: stacked expert weights (E, in, out) shard their
    # expert axis over the model-parallel mesh axis
    (r".*expert_w\d", P("tp", None, None)),
)


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_shardings(params, mesh: Mesh, rules=LM_RULES):
    """Map a params pytree to NamedShardings by path regex."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    specs = {path_str(kp): _spec_for(path_str(kp), rules) for kp, _ in flat}

    def to_sharding(kp, x):
        spec = tuple(specs[path_str(kp)])
        # right-align the spec so stacked (nn.scan) params with a leading
        # layer axis keep sharding the same logical dims; drop axes that do
        # not divide the dim evenly -> replicate that axis
        if len(spec) < x.ndim:
            spec = (None,) * (x.ndim - len(spec)) + spec
        fixed = []
        for dim, s in zip(x.shape, spec[: x.ndim]):
            if s is not None and dim % mesh.shape[s] != 0:
                s = None
            fixed.append(s)
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def shard_batch(tree, mesh: Mesh):
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if hasattr(x, "ndim") and x.ndim >= 1 else x,
        tree,
    )
