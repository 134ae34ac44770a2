"""Pallas TPU kernel: fused VQ nearest-neighbor search.

Keeps the codebook resident in VMEM (1024 x 512 fp32 = 2 MB — fits easily) and
fuses distance computation (one MXU matmul per tile) with the argmin reduction,
so per-tile distance matrices never round-trip through HBM. This is the hot op
of RVQ encode (SURVEY §7 step 2): the XLA path materializes the (M, N) distance
matrix in HBM; this kernel reduces it on-chip.

Falls back to interpret mode off-TPU so the same code path is test-covered on
the CPU mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nn_kernel(x_ref, cbsq_ref, cb_ref, idx_ref):
    """One grid step: x tile (TM, D), codebook (N, D) -> indices (TM/128, 128).

    Output is lane-aligned 2-D (Mosaic rejects 1-D int tiles)."""
    x = x_ref[:]  # (TM, D)
    cb = cb_ref[:]  # (N, D)
    # dist = |e|^2 - 2 x.e  (|x|^2 constant in argmin)
    dots = jax.lax.dot_general(
        x,
        cb,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TM, N)
    dist = cbsq_ref[:] - 2.0 * dots
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TM,)
    idx_ref[:] = idx.reshape(idx_ref.shape)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def nearest_code_pallas(
    x: jnp.ndarray,
    codebook: jnp.ndarray,
    tile_m: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """argmin_j ||x_i - e_j||^2. x (..., D), codebook (N, D) -> (...,) int32.

    Same math/tie-break as ops.quant.nearest_code, at the MXU's default
    precision (Mosaic rejects HIGHEST-precision f32 dots) — the XLA path pins
    HIGHEST and is the token-ID parity reference; this kernel is the
    throughput variant (<1%% near-tie assignment drift on random data).
    """
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    n = codebook.shape[0]
    # Mosaic tiling: output blocks are (tile_m/128, 128) int32; the sublane
    # count must be a multiple of 8 -> tile_m multiple of 1024
    tile_m = max(1024, _round_up(tile_m, 1024))
    flat = x.reshape(-1, d)
    m = flat.shape[0]
    m_pad = _round_up(max(m, 128), tile_m)
    if m_pad != m:
        flat = jnp.pad(flat, ((0, m_pad - m), (0, 0)))
    cbsq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :]  # (1, N)

    rows = tile_m // 128
    grid = (m_pad // tile_m,)
    out = pl.pallas_call(
        _nn_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad // 128, 128), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_m, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * d,
            bytes_accessed=m_pad * d * 4 + n * d * 4 + m_pad * 4,
            transcendentals=0,
        ),
    )(flat, cbsq, codebook)
    return out.reshape(-1)[:m].reshape(batch_shape)


def rvq_encode_pallas(x, codebooks, tile_m: int = 1024, interpret: bool = False):
    """Residual VQ encode with the fused kernel per layer.

    x (B, T, D), codebooks (nq, N, D) -> codes (B, T, nq).
    """
    nq = codebooks.shape[0]
    residual = x
    out = []
    for i in range(nq):
        idx = nearest_code_pallas(residual, codebooks[i], tile_m, interpret)
        residual = residual - jnp.take(codebooks[i], idx, axis=0)
        out.append(idx)
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Fully fused residual-VQ encode: ALL nq layers inside one kernel. The
# residual never leaves VMEM between layers (the staged version round-trips
# it through HBM nq times) and the dequantize-for-residual step runs as a
# one-hot matmul on the MXU instead of an HBM gather.
# ---------------------------------------------------------------------------

def _rvq_kernel(nq: int):
    def kernel(x_ref, cbsq_ref, cb_ref, idx_ref):
        residual = x_ref[:]  # (TM, D)
        n = cb_ref.shape[1]
        for l in range(nq):
            cb = cb_ref[l]  # (N, D)
            dots = jax.lax.dot_general(
                residual, cb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dist = cbsq_ref[l] - 2.0 * dots  # (TM, N)
            idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TM,)
            idx_ref[l] = idx.reshape(idx_ref.shape[1:])
            if l < nq - 1:
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
                    == idx[:, None]
                ).astype(residual.dtype)
                quant = jax.lax.dot_general(
                    onehot, cb,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(residual.dtype)
                residual = residual - quant

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def rvq_encode_fused_pallas(
    x: jnp.ndarray,
    codebooks: jnp.ndarray,
    tile_m: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (..., D), codebooks (nq, N, D) -> codes (..., nq) in ONE kernel."""
    batch_shape = x.shape[:-1]
    nq, n, d = codebooks.shape
    tile_m = max(1024, _round_up(tile_m, 1024))
    flat = x.reshape(-1, d)
    m = flat.shape[0]
    m_pad = _round_up(max(m, 128), tile_m)
    if m_pad != m:
        flat = jnp.pad(flat, ((0, m_pad - m), (0, 0)))
    cbsq = jnp.sum(codebooks.astype(jnp.float32) ** 2, axis=-1)[:, None, :]

    rows = tile_m // 128
    out = pl.pallas_call(
        _rvq_kernel(nq),
        out_shape=jax.ShapeDtypeStruct((nq, m_pad // 128, 128), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=(m_pad // tile_m,),
            in_specs=[
                pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, 1, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, n, d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((nq, rows, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nq * m_pad * n * d,
            bytes_accessed=m_pad * d * 4 + nq * n * d * 4 + nq * m_pad * 4,
            transcendentals=0,
        ),
    )(flat, cbsq, codebooks)
    codes = out.reshape(nq, -1)[:, :m]  # (nq, M)
    return jnp.moveaxis(codes, 0, -1).reshape(*batch_shape, nq)
