"""Multi-process jax.distributed workers (run by test_distributed_smoke).

Exercises the ONE code path no in-process test can touch: a real
``jax.distributed.initialize`` handshake between separate OS processes and
cross-process (DCN-analog) collectives. Modes:

* ``psum`` — two processes, one CPU device each, a psum over the 2-process
  mesh must see both processes' contributions.
* ``sft``  — two processes x 4 virtual CPU devices each, hybrid DCN x ICI
  mesh (dp=2 over DCN x dp=2,tp=2 over "ICI" = dp4 x tp2 global), ONE full
  ``SFTTrainer.train_step`` whose loss/acc/post-step param norm must match
  the single-process 8-device run bit-for-bit in distribution semantics
  (``sftref`` mode below). This is the reference's one distributed execution
  mode — multi-process DDP (QuarkAudio-UniSE train.py:35) — actually crossing
  a process boundary.
* ``sftref`` — the single-process 8-virtual-device control for ``sft``:
  identical mesh axes, identical data, no jax.distributed.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _setup(pid, port, num_processes):
    import jax

    # config (not env): the axon sitecustomize overrides JAX_PLATFORMS
    jax.config.update("jax_platforms", "cpu")
    if num_processes > 1:
        # without a cross-process CPU collectives backend each process only
        # sees its LOCAL devices and the global mesh cannot form
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

        from unified_audio_tpu.parallel.distributed import initialize

        initialize(coordinator_address=f"127.0.0.1:{port}",
                   num_processes=num_processes, process_id=pid)
        assert jax.process_count() == num_processes
        assert jax.process_index() == pid
    return jax


def main_psum(pid: int, port: int) -> None:
    jax = _setup(pid, port, 2)
    assert len(jax.devices()) == 2  # one CPU device per process, global view

    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from unified_audio_tpu.parallel.distributed import make_hybrid_mesh

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


def main_sft(pid: int, port: int, num_processes: int) -> None:
    """One real SFTTrainer.train_step over a hybrid mesh.

    With num_processes=2 each process runs 4 virtual CPU devices (set via
    XLA_FLAGS by the caller) and the dp axis's outer factor crosses the
    process boundary — the gradient psum rides gloo, the DCN analog. With
    num_processes=1 the same 8 devices live in one process (the control).
    """
    jax = _setup(pid, port, num_processes)
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp

    from unified_audio_tpu.parallel import mesh as mesh_lib
    from unified_audio_tpu.parallel.distributed import make_hybrid_mesh
    from unified_audio_tpu.train.optim import make_optimizer
    from unified_audio_tpu.train.sft_trainer import SFTTrainer
    from tests.test_parallel import build_unise

    import warnings

    with warnings.catch_warnings():
        # CPU devices expose no slice_index; the placement warning is the
        # expected single-slice fallback
        warnings.simplefilter("ignore")
        if num_processes > 1:
            mesh = make_hybrid_mesh(ici=dict(dp=2, tp=2), dcn=dict(dp=2))
        else:
            mesh = make_hybrid_mesh(ici=dict(dp=4, tp=2))
    assert mesh.shape == {"dp": 4, "tp": 2}

    unise = build_unise(jax.random.PRNGKey(0))
    tr = SFTTrainer(unise, mesh=mesh,
                    optimizer=make_optimizer(warmup_steps=1))

    # identical global batch on every process (seeded); each process's
    # callback serves the rows its devices own
    rng = np.random.default_rng(42)
    b, t = 4, 6400
    mix_np = rng.standard_normal((b, t)).astype(np.float32)
    target_np = rng.standard_normal((b, t)).astype(np.float32)
    sh = mesh_lib.batch_sharding(mesh)
    mix = jax.make_array_from_callback((b, t), sh, lambda idx: mix_np[idx])
    target = jax.make_array_from_callback((b, t), sh,
                                          lambda idx: target_np[idx])

    loss, acc = tr.train_step("se", None, mix, target)

    # post-step global param norm: depends on every grad shard, so any
    # cross-process psum corruption shows up here even if the (replicated)
    # loss happens to agree
    sq = sum(float(jnp.sum(p.astype(jnp.float32) ** 2))
             for p in jax.tree_util.tree_leaves(tr.params))
    print(f"SFT pid={pid} loss={loss:.6f} acc={acc:.6f} "
          f"pnorm={np.sqrt(sq):.6f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "psum":
        main_psum(int(sys.argv[2]), int(sys.argv[3]))
    elif mode == "sft":
        main_sft(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
