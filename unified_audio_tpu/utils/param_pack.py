"""Pack a parameter pytree into one flat buffer per dtype.

On remote-attached accelerators every jit dispatch marshals each argument
buffer individually through the relay RPC — a frozen SSL frontend's ~250
parameter tensors measurably dominate the dispatch cost of the serving
prefill program (~150 ms/wave vs ~34 ms with packed args, engine admit
timing). Packing flattens all leaves of a pytree into ONE 1-D buffer per
dtype; unpacking inside the jitted program is static slices + reshapes,
which XLA fuses away (no copy on the compute path).

Bit-exact: pack -> unpack reproduces every leaf (reshape/concat/slice
only). The pack spec (paths, shapes, offsets) is tiny static metadata,
safe to close over in jit.
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# spec: dtype_name -> list of (path, shape, offset, size)
PackSpec = Dict[str, List[Tuple[Tuple, Tuple[int, ...], int, int]]]


def pack_pytree(tree) -> Tuple[Dict[str, jnp.ndarray], PackSpec]:
    """Flatten ``tree`` into {dtype_name: 1-D buffer} + a static spec.

    Leaves are grouped by dtype and concatenated in deterministic
    (sorted-path) order. The flattening runs as ONE jitted program (tree
    as arguments): eagerly reshaping/concatenating hundreds of leaves on a
    remote-attached device costs one small remote compile per distinct
    leaf shape — minutes of init for a big frontend."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    leaves = sorted(leaves, key=lambda kv: jax.tree_util.keystr(kv[0]))
    spec: PackSpec = {}
    for path, leaf in leaves:
        leaf = jnp.asarray(leaf)
        name = leaf.dtype.name
        entries = spec.setdefault(name, [])
        offset = entries[-1][2] + entries[-1][3] if entries else 0
        entries.append((path, tuple(leaf.shape), offset, int(leaf.size)))

    def _flatten(tr):
        lv = jax.tree_util.tree_flatten_with_path(tr)[0]
        lv = sorted(lv, key=lambda kv: jax.tree_util.keystr(kv[0]))
        groups: Dict[str, List] = {}
        for _, leaf in lv:
            groups.setdefault(leaf.dtype.name, []).append(leaf.reshape(-1))
        return {name: jnp.concatenate(parts) if len(parts) > 1
                else parts[0] for name, parts in groups.items()}

    return jax.jit(_flatten)(tree), spec


def unpack_pytree(buffers: Dict[str, jnp.ndarray], spec: PackSpec,
                  treedef_tree) -> Any:
    """Rebuild the original pytree from packed buffers (static slices —
    traceable, fuses to nothing under jit). ``treedef_tree`` is any pytree
    with the ORIGINAL structure (e.g. the unpacked original, or
    jax.eval_shape output) used to restore the container layout."""
    by_path = {}
    for name, entries in spec.items():
        buf = buffers[name]
        for path, shape, offset, size in entries:
            by_path[jax.tree_util.keystr(path)] = (
                jax.lax.slice(buf, (offset,), (offset + size,))
                .reshape(shape))
    paths_leaves = jax.tree_util.tree_flatten_with_path(treedef_tree)[0]
    treedef = jax.tree_util.tree_structure(treedef_tree)
    rebuilt = [by_path[jax.tree_util.keystr(p)] for p, _ in paths_leaves]
    return jax.tree_util.tree_unflatten(treedef, rebuilt)


def spec_abstract(spec: PackSpec, treedef_tree):
    """ShapeDtypeStructs of the original tree (for jax.eval_shape through
    a packed function)."""
    paths_leaves = jax.tree_util.tree_flatten_with_path(treedef_tree)[0]
    treedef = jax.tree_util.tree_structure(treedef_tree)
    shapes = {}
    for name, entries in spec.items():
        for path, shape, _, _ in entries:
            shapes[jax.tree_util.keystr(path)] = jax.ShapeDtypeStruct(
                shape, np.dtype(name))
    return jax.tree_util.tree_unflatten(
        treedef,
        [shapes[jax.tree_util.keystr(p)] for p, _ in paths_leaves])
