"""Fast model init for remote-attached accelerators.

Eager flax ``init`` dispatches thousands of tiny ops; on a tunnel-attached TPU
each one is a host round-trip, making full-size init take minutes. Run init on
the host CPU backend and bulk-transfer the resulting pytree to the default
device in one DMA.
"""
from __future__ import annotations

import jax


def init_on_cpu(init_fn, to_default_device: bool = True):
    """Run ``init_fn()`` (returning a pytree) on CPU, then move to the default
    device as one transfer."""
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # jit the whole init: one XLA compile instead of thousands of eagerly
        # dispatched (and individually compiled) ops
        tree = jax.jit(init_fn)()
    default = jax.devices()[0]
    if to_default_device and default.platform != "cpu":
        tree = jax.device_put(tree, default)
    return tree
