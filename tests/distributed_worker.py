"""Two-process jax.distributed smoke worker (run by test_distributed_smoke).

Exercises the ONE code path no in-process test can touch: a real
``jax.distributed.initialize`` handshake between separate OS processes and a
cross-process (DCN-analog) collective. Each process owns one CPU device; a
psum over the 2-process mesh must see both processes' contributions.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(pid: int, port: int) -> None:
    import jax

    # config (not env): the axon sitecustomize overrides JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
    # without a cross-process CPU collectives backend each process only
    # sees its LOCAL devices and the global mesh cannot form
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from unified_audio_tpu.parallel.distributed import (initialize,
                                                        make_hybrid_mesh)

    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 2  # one CPU device per process, global view

    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    mesh = make_hybrid_mesh(ici=dict(dp=1), dcn=dict(dp=2))
    assert mesh.devices.shape == (2,)

    # each process contributes its own local shard of the global batch
    local = np.full((1, 4), float(pid + 1), np.float32)
    global_x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local, global_shape=(2, 4))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P())
    def global_sum(x):
        return jax.lax.psum(jnp.sum(x), "dp")

    total = float(jax.device_get(global_sum(global_x)))
    expect = 4.0 * 1 + 4.0 * 2  # both processes' shards
    assert total == expect, (total, expect)
    print(f"OK pid={pid} total={total}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
