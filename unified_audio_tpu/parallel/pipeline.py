"""GPipe-style pipeline parallelism over the stacked layer axis.

The reference has no pipeline parallelism (SURVEY §2.4: Lightning DDP only).
This is the TPU-native construction for when a model outgrows one chip's HBM:
the layer stack — already stored as stacked ``nn.scan`` parameters with a
leading layer axis (models/lm/llama.py) — is sharded so each device along a
``pp`` mesh axis owns a contiguous block of layers, and microbatches flow
stage-to-stage over ICI via ``lax.ppermute`` on the classic GPipe schedule
(M + P - 1 ticks, fill/drain bubble of (P-1)/(M+P-1)).

Everything runs under ``shard_map``: per-device code is plain JAX, the
collective is a single neighbor permute per tick, and the whole schedule is a
``lax.scan`` so it stays one compiled program. ``jax.grad`` works through it
(the transpose of ``ppermute`` is the reverse permute), so the same function
serves pipeline-parallel training.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _leading_axis_specs(tree, axis: str):
    """PartitionSpec pytree: shard every leaf's leading (layer) axis."""
    return jax.tree_util.tree_map(lambda _: P(axis), tree)


def gpipe(
    stage_fn,
    stacked_params,
    x,
    *broadcast_args,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = "pp",
):
    """Run ``x`` through all L layers, pipelined over the ``axis`` mesh axis.

    Args:
      stage_fn: ``(local_params, x, *broadcast_args) -> y`` applying ONE
        stage's L/P layers. ``local_params`` is ``stacked_params`` with the
        leading layer axis sliced to this stage's block; ``y`` must have
        ``x``'s shape (a residual-stream stage).
      stacked_params: pytree whose every leaf has leading axis L (the
        ``nn.scan`` layout). L must be divisible by the ``axis`` size.
      x: (B, ...) activations entering layer 0. B divisible by
        ``n_microbatches``.
      broadcast_args: replicated extras (masks, rope tables, ...) passed to
        every stage unchanged.
      mesh: mesh containing ``axis``. Other axes are untouched — compose with
        dp/tp by sharding ``x``/params over them as usual.

    Returns activations after the last layer, shape of ``x``, replicated over
    ``axis``.
    """
    p_size = mesh.shape[axis]
    b = x.shape[0]
    m = n_microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by n_microbatches {m}")
    mb = b // m
    xs = x.reshape((m, mb) + x.shape[1:])

    param_specs = _leading_axis_specs(stacked_params, axis)
    bcast_specs = tuple(P() for _ in broadcast_args)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P()) + bcast_specs,
        out_specs=P(),
        check_vma=False,
    )
    def run(local_params, xs, *bargs):
        stage = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def tick(carry, t):
            recv, outbuf = carry
            # stage 0 injects microbatch t (clamped once the drain begins);
            # later stages consume what the previous tick permuted to them
            inject = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            x_in = jnp.where(stage == 0, inject, recv)
            y = stage_fn(local_params, x_in, *bargs)
            # the last stage finishes microbatch t-(P-1) at tick t
            m_idx = t - (p_size - 1)
            valid = (m_idx >= 0) & (stage == p_size - 1)
            slot = jnp.clip(m_idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outbuf, slot, 0,
                                               keepdims=False)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(valid, y, cur), slot, 0
            )
            recv = jax.lax.ppermute(y, axis, perm)
            return (recv, outbuf), None

        recv0 = jnp.zeros_like(xs[0])
        out0 = jnp.zeros_like(xs)
        (_, outbuf), _ = jax.lax.scan(
            tick, (recv0, out0), jnp.arange(m + p_size - 1)
        )
        # broadcast the last stage's buffer to every pp rank
        outbuf = jnp.where(stage == p_size - 1, outbuf, 0.0)
        return jax.lax.psum(outbuf, axis)

    out = run(stacked_params, xs, *broadcast_args)
    return out.reshape(x.shape)


def make_llama_stage_fn(cfg, n_stages: int):
    """Stage function for the Llama backbone's scanned layer stack.

    Rebuilds the per-stage ``nn.scan`` with length L/P so each pipeline rank
    runs only its own stacked-parameter block (training full-forward path:
    empty KV buffers, causal mask/rope passed as broadcast args).
    """
    import flax.linen as nn

    from ..models.lm.llama import LlamaLayer

    if cfg.num_layers % n_stages:
        raise ValueError(
            f"num_layers {cfg.num_layers} not divisible by pp={n_stages}")
    local = cfg.num_layers // n_stages
    scan = nn.scan(
        LlamaLayer,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
        out_axes=0,
        length=local,
    )
    mod = scan(cfg)

    def stage_fn(local_params, x, mask, cos, sin):
        empty = jnp.zeros((local, 0, 0, 0, 0), x.dtype)
        carry = (x, empty, empty, jnp.int32(0), jnp.int32(0))
        (y, _, _, _, _), _ = mod.apply({"params": local_params}, carry,
                                       mask, cos, sin)
        return y

    return stage_fn


def llama_pipeline_forward(cfg, layer_params, embeds, mesh,
                           n_microbatches: int, axis: str = "pp"):
    """Full causal forward of the scanned Llama layer stack, pipelined.

    ``layer_params`` is ``params["backbone"]["layers"]`` from a standard
    LlamaBackbone init (leading axis = num_layers). Returns pre-final-norm
    hidden states — numerically identical to the dense layer scan
    (tests/test_parallel.py pins equality on the virtual mesh).
    """
    from ..models.lm.llama import NEG_INF
    from ..nn.transformer import rope_cos_sin

    s = embeds.shape[1]
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.head_dim, cfg.rope_theta)
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = jnp.where(col <= row, 0.0, NEG_INF)[None, None]
    stage_fn = make_llama_stage_fn(cfg, mesh.shape[axis])
    return gpipe(stage_fn, layer_params, embeds, mask, cos, sin,
                 mesh=mesh, n_microbatches=n_microbatches, axis=axis)


def sft_pipeline_loss(sft, params, task_id, enroll_feats, mix_feats,
                      global_ids, semantic_ids, mesh, n_microbatches: int,
                      axis: str = "pp"):
    """SFT loss with the backbone pipelined over the ``axis`` mesh axis
    (SURVEY §2.4 pp integrated into training, not just the dryrun).

    Mirrors LLMSFT.__call__ (models/lm/sft.py) exactly — prompt assembly,
    input/target id layout, final RMSNorm, label-smoothed KL — but routes
    the layer stack through :func:`llama_pipeline_forward` (differentiable
    GPipe; grads == dense pinned in tests/test_parallel.py). Used by
    train.sft_trainer.SFTTrainer(pp_mesh=...).
    """
    cfg = sft.cfg
    b = global_ids.shape[0]
    g = global_ids.astype(jnp.int32) + cfg.global_offset
    s = semantic_ids.astype(jnp.int32) + cfg.semantic_offset
    gsos = jnp.full((b, 1), cfg.global_sos, jnp.int32)
    ssos = jnp.full((b, 1), cfg.semantic_sos, jnp.int32)
    seos = jnp.full((b, 1), cfg.semantic_eos, jnp.int32)
    input_ids = jnp.concatenate([gsos, g, ssos, s], axis=1)
    target_ids = jnp.concatenate([g, ssos, s, seos], axis=1)

    prompt = sft.apply(params, task_id, enroll_feats, mix_feats,
                       method="_prompt")
    code_emb = sft.apply(params, input_ids,
                         method=lambda m, i: m.lm.embed_codes(i))
    embeds = jnp.concatenate([prompt, code_emb], axis=1)

    lm_p = params["params"]["lm"]
    hidden = llama_pipeline_forward(
        cfg, lm_p["backbone"]["layers"], embeds, mesh, n_microbatches, axis)
    # final RMSNorm (nn/transformer.py RMSNorm, eps 1e-6)
    var = jnp.mean(jnp.square(hidden.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    hidden = (hidden * jax.lax.rsqrt(var + 1e-6)).astype(hidden.dtype)
    hidden = hidden * lm_p["backbone"]["norm"]["weight"]

    t = target_ids.shape[-1]
    hidden = hidden[:, -t:]
    logits = hidden @ lm_p["output_head"]["kernel"]
    loss = sft.apply(params, logits, target_ids,
                     method=lambda m, lg, tg: m.lm.loss_function(lg, tg))
    acc = jnp.mean(
        (jnp.argmax(logits, axis=-1) == target_ids).astype(jnp.float32))
    return loss, acc
