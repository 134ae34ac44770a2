"""Multi-host runtime: process initialization + hybrid DCN x ICI meshes.

The reference reaches multi-device only through PyTorch-Lightning DDP on one
NCCL clique (SURVEY §2.4). The TPU-native equivalent for MULTI-HOST scale is:

* ``initialize()`` — one call per process wires ``jax.distributed`` (GCE TPU
  pods autodetect the coordinator; explicit args cover other clusters).
* ``make_hybrid_mesh()`` — a mesh whose outer axes span hosts over DCN and
  whose inner axes span the chips of each slice over ICI, so data-parallel
  gradient psums ride DCN once per step while tensor/expert-parallel
  collectives stay on ICI (the "How to Scale Your Model" recipe). Axis names
  feed the same PartitionSpec rules as the single-host mesh
  (parallel/mesh.py), so trainers are topology-agnostic.

Data sharding across processes stays in the data layer
(``jax.process_index()`` slicing, data/data_module.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up jax.distributed for this process (no-op when single-process
    and nothing to connect to). On Cloud TPU pods all three args autodetect;
    pass them explicitly elsewhere."""
    if num_processes in (None, 1) and coordinator_address is None:
        return  # single-process run: nothing to initialize
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(ici: Dict[str, int],
                     dcn: Optional[Dict[str, int]] = None,
                     devices=None) -> Mesh:
    """Mesh with ``dcn`` axes across slices/hosts and ``ici`` axes within.

    ``make_hybrid_mesh(ici=dict(dp=2, tp=4))`` on one slice == an ICI-only
    mesh; ``make_hybrid_mesh(ici=dict(dp=1, tp=4), dcn=dict(dp=2))`` places
    the dp axis across two slices over DCN. Shared axis names multiply
    (dp_total = dp_dcn * dp_ici). Axis order = dcn keys then ici-only keys.
    """
    devices = devices if devices is not None else jax.devices()
    dcn = dict(dcn or {})
    names = list(dcn.keys()) + [k for k in ici if k not in dcn]
    ici_shape = [ici.get(k, 1) for k in names]
    dcn_shape = [dcn.get(k, 1) for k in names]
    total = int(np.prod(ici_shape)) * int(np.prod(dcn_shape))
    if total != len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, np.multiply(ici_shape, dcn_shape)))} "
            f"needs {total} devices, have {len(devices)}")
    merged = [d * i for d, i in zip(dcn_shape, ici_shape)]
    if int(np.prod(dcn_shape)) == 1:
        arr = mesh_utils.create_device_mesh(ici_shape, devices=devices)
    else:
        # create_hybrid_device_mesh needs per-device slice placement AND as
        # many distinct slices as the dcn product; on a single-slice
        # topology (CPU/dev boxes, one-slice TPUs — where every device
        # reports slice 0, or none reports one) only the DCN placement
        # optimization is lost — the axis algebra still applies. Detect up
        # front instead of swallowing arbitrary errors, and say so when
        # falling back. (Found by the two-process CPU smoke test: both
        # processes' devices carry slice_index=0, so presence alone is the
        # wrong gate.)
        slice_ids = {getattr(d, "slice_index", None) for d in devices}
        has_slices = (None not in slice_ids
                      and len(slice_ids) == int(np.prod(dcn_shape)))
        if has_slices:
            arr = mesh_utils.create_hybrid_device_mesh(
                ici_shape, dcn_shape, devices=devices)
        else:
            import warnings
            warnings.warn(
                "make_hybrid_mesh: devices expose no slice_index — building "
                "a placement-unaware mesh; the dcn axes will NOT be aligned "
                "to slice boundaries (fine on one slice, a performance bug "
                "on a real multi-slice pod)", stacklevel=2)
            arr = mesh_utils.create_device_mesh(merged, devices=devices)
    # collapse the paired (dcn, ici) factors of shared names into one axis
    return Mesh(arr.reshape(merged), axis_names=tuple(names))
