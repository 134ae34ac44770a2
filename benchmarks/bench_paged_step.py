"""Micro-benchmark: where does the paged decode step's time go?

Times a jitted lax.scan of N paged_decode_ids steps (the exact serving hot
loop body) while sweeping the knobs that bound it from different directions:

* pool size (number of physical blocks)  -> KV-read bandwidth share
* layer count                            -> per-layer fixed cost share
* slot count                             -> batch-scaling behavior

Timing forces a device->host fetch (np.asarray) as the completion barrier —
block_until_ready returns early on tunnel-attached chips (CLAUDE.md #2).
"""
import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np


def time_steps(cfg, lm_params, pool, tables, index, active, ids, bs,
               repeats=3, num_active_blocks=None, use_kernel=False,
               owner_chunk_blocks=8):
    """Per-step DEVICE time: every dispatch to a tunnel-attached chip pays a
    fixed ~25 ms round trip that a single-N timing silently folds into the
    per-step number, so this times two scan lengths and returns the slope
    (wall_n2 - wall_n1) / (n2 - n1)."""
    import jax
    import jax.numpy as jnp

    from unified_audio_tpu.serve.paged import paged_decode_ids

    def make(n_steps):
        @jax.jit
        def run(lm_params, pool, ids):
            def body(carry, _):
                pool, ids = carry
                logits, pool = paged_decode_ids(
                    cfg, lm_params, pool, tables, index, active, ids, bs,
                    num_active_blocks=num_active_blocks,
                    use_kernel=use_kernel,
                    owner_chunk_blocks=owner_chunk_blocks)
                return (pool, jnp.argmax(logits, -1).astype(jnp.int32)), None

            (pool, ids), _ = jax.lax.scan(body, (pool, ids), None,
                                          length=n_steps)
            return ids

        return run

    n1, n2 = 16, 144
    walls = {}
    for n, run in ((n1, make(n1)), (n2, make(n2))):
        np.asarray(run(lm_params, pool, ids))  # compile + warm
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(run(lm_params, pool, ids))
            best = min(best, time.perf_counter() - t0)
        walls[n] = best
    dispatch = walls[n1] - n1 * (walls[n2] - walls[n1]) / (n2 - n1)
    return (walls[n2] - walls[n1]) / (n2 - n1), dispatch


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unified_audio_tpu.models.lm.llama import LlamaConfig
    from unified_audio_tpu.models.lm.sft import LLMSFT
    from unified_audio_tpu.serve.paged import init_pool
    from unified_audio_tpu.utils.initialization import init_on_cpu

    rng = np.random.default_rng(0)
    results = []
    # (slots, layers, capacity blocks/slot, USED blocks/slot, bound?, tag)
    # capacity 13/slot is the engine default (sized for the largest legal
    # request); a typical mixed-task request owns ~5 blocks (~300 tokens).
    # `bound` replays the engine's bucketed allocation high-water mark —
    # with the low-first allocator, used blocks pack the pool prefix.
    # kern: False = XLA einsum, True = stream kernel, ("owner", c) = the
    # round-4 ownership-aware kernel with chunk c over RegionAllocator-
    # style contiguous region tables (region = ceil(13/c)*c blocks).
    # Engine-real bounds: at 16 slots the live workload spans 192-256
    # blocks (13 cap/slot), where the stream kernel measured ~1.02-1.04 ms
    # — owner rows are the apples-to-apples replacement.
    configs = [
        (8, 12, 13, 13, None, False, "serving shape (engine default, full)"),
        (8, 12, 13, 5, True, False, "8 slots, typical occupancy, bounded"),
        (8, 12, 13, 5, True, True, "8 slots, typical occupancy, KERNEL"),
        (16, 12, 13, 5, True, False, "16 slots, typical occupancy, bounded"),
        (16, 12, 13, 5, True, True, "16 slots, typical occupancy, KERNEL"),
        (32, 12, 13, 5, True, False, "32 slots, typical occupancy, bounded"),
        (32, 12, 13, 5, True, True, "32 slots, typical occupancy, KERNEL"),
        (32, 12, 13, 13, True, False, "32 slots, full occupancy, bounded"),
        (32, 12, 13, 13, True, True, "32 slots, full occupancy, KERNEL"),
    ]
    owner_configs = [
        (16, 12, 13, 13, True, True, "16 slots, full occupancy, STREAM "
                                     "(engine-real bound)"),
        (16, 12, 13, 13, None, ("owner", 16), "16 slots, full, OWNER c16"),
        (16, 12, 13, 13, None, ("owner", 8), "16 slots, full, OWNER c8"),
        (16, 12, 13, 5, None, ("owner", 8), "16 slots, typical, OWNER c8"),
        (8, 12, 13, 13, None, ("owner", 16), "8 slots, full, OWNER c16"),
        (32, 12, 13, 13, None, ("owner", 16), "32 slots, full, OWNER c16"),
        (32, 12, 13, 13, None, ("owner", 8), "32 slots, full, OWNER c8"),
    ]
    # int8 pool through the owner kernel: the bf16 owner kernel measured
    # DMA-bound (577 GB/s), so halving pool bytes should halve the step —
    # where it measured NEUTRAL for the VPU-bound stream kernel (round 4)
    q8_configs = [
        (16, 12, 13, 13, None, ("owner_q8", 16), "16 slots, full, OWNER "
                                                 "q8 c16"),
        (8, 12, 13, 13, None, ("owner_q8", 16), "8 slots, full, OWNER "
                                                "q8 c16"),
        (32, 12, 13, 13, None, ("owner_q8", 16), "32 slots, full, OWNER "
                                                 "q8 c16"),
    ]
    # round-5 block-diagonal head restructure sweep: c16 re-measured, c14
    # (region = 14 = exact-fit-plus-one for the 13-block cap, ck=896 lanes),
    # and small chunks (c2/c4) where the clamped index map SKIPS dead-tail
    # chunk DMAs — occupancy-adaptive reads, viable only once per-chunk
    # compute stopped dominating
    owner2_configs = [
        (16, 12, 13, 13, None, ("owner", 16), "16 full, OWNER c16 r5"),
        (16, 12, 13, 13, None, ("owner", 14), "16 full, OWNER c14 r5"),
        (16, 12, 13, 13, None, ("owner", 4), "16 full, OWNER c4 r5"),
        (16, 12, 13, 13, None, ("owner", 2), "16 full, OWNER c2 r5"),
        (16, 12, 13, 5, None, ("owner", 4), "16 typical, OWNER c4 r5"),
        (16, 12, 13, 5, None, ("owner", 2), "16 typical, OWNER c2 r5"),
        (32, 12, 13, 13, None, ("owner", 14), "32 full, OWNER c14 r5"),
        (16, 12, 13, 13, None, ("owner_q8", 14), "16 full, OWNER q8 c14 r5"),
        (32, 12, 13, 13, None, ("owner_q8", 14), "32 full, OWNER q8 c14 r5"),
    ]
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which == "owner":
        configs = owner_configs
    elif which == "owner_q8":
        configs = q8_configs
    elif which == "owner2":
        configs = owner2_configs
    elif which == "all":
        configs = configs + owner_configs + q8_configs + owner2_configs
    for (slots, num_layers, max_blocks, used, bound, kern, tag) in configs:
        cfg = LlamaConfig(num_layers=num_layers)
        sft = LLMSFT(cfg, num_tasks=3, feats_dim=768)
        params = init_on_cpu(lambda: sft.init(
            jax.random.PRNGKey(0), 0, None,
            np.zeros((1, 8, 768), np.float32),
            np.zeros((1, 4), np.int32), np.zeros((1, 8), np.int32),
        ))
        lm = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params["params"]["lm"])

        bs = 64
        owner_c = 0
        quant = None
        if isinstance(kern, tuple):
            kname, owner_c = kern
            quant = "int8" if kname == "owner_q8" else None
            kern = "owner"
        if kern == "owner":
            # region layout (engine owner mode): region = ceil(cap/c)*c
            # blocks, slot s = region s+1 (region 0 reserved for trash)
            region = -(-max_blocks // owner_c) * owner_c
            nb = -(-((slots + 2) * region) // 64) * 64
            tables_np = np.full((slots, max_blocks), 0, np.int64)
            for s in range(slots):
                tables_np[s, :used] = (s + 1) * region + np.arange(used)
            nab = None
        else:
            # engines round capacity to the 64-block bucket granularity
            nb = -(-(1 + slots * max_blocks) // 64) * 64
            # low-first allocation: slot s owns [1 + s*used, 1+(s+1)*used)
            tables_np = np.full((slots, max_blocks), 0, np.int64)
            tables_np[:, :used] = 1 + np.arange(slots * used).reshape(
                slots, used)
            nab = None
            if bound:
                hw = 1 + slots * used
                nab = min(max(-(-hw // 64) * 64, 16), nb)
        pool = init_pool(cfg, nb, bs, dtype=jnp.bfloat16, quant=quant)
        tables = jnp.asarray(tables_np, jnp.int32)
        index = jnp.full((slots,), used * bs - 8, jnp.int32)
        active = jnp.ones((slots,), bool)
        ids = jnp.asarray(rng.integers(3, 100, (slots,)), jnp.int32)

        dt, dispatch = time_steps(cfg, lm, pool, tables, index, active, ids,
                                  bs, num_active_blocks=nab, use_kernel=kern,
                                  owner_chunk_blocks=owner_c or 8)
        if kern == "owner":
            read_blocks = slots * (-(-max_blocks // owner_c) * owner_c)
        else:
            read_blocks = nab if nab is not None else nb
        kv_bytes = 1 if quant else 2
        kv_mb = (2 * read_blocks * bs * cfg.num_heads * cfg.head_dim
                 * kv_bytes * num_layers / 1e6)
        w_mb = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(lm)) * 2 / 1e6
        rec = {
            "tag": tag, "slots": slots, "layers": num_layers,
            "kernel": kern, "owner_chunk": owner_c or None,
            "kv_quant": quant,
            "pool_blocks": nb, "read_blocks": int(read_blocks),
            "ms_per_step_device": round(dt * 1e3, 3),
            "dispatch_overhead_ms": round(dispatch * 1e3, 1),
            "tok_per_sec_ceiling": round(slots / dt, 1),
            "hbm_mb_per_step": round(kv_mb + w_mb, 1),
            "implied_gbps": round((kv_mb + w_mb) / 1e3 / dt, 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
