"""Pallas TPU kernel: fused masked Hamming best-2 matching.

The matchers' hot pattern is `distance_matrix -> mask -> argmin/second`
(frontend/matching.py, ops/hamming.py). Composed from XLA ops that
materializes an (M, N) int32 distance matrix in HBM (18 MB at 2176^2) and
re-reads it twice. This kernel fuses the whole pattern: per (TM, TN) tile it
computes distances on the MXU via the bit-matmul identity
popcount(xor) = |a| + |b| - 2 A.B^T, applies the candidate mask, and folds a
running (best, second, argbest) per row in VMEM scratch — the distance
matrix never exists in HBM.

Grid: (M/TM, N/TN) with N innermost (sequential on TPU), scratch persists
across the N sweep; outputs are written on the last N tile.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import hamming

TM = 256
TN = 256
_INF = float(hamming.INF_DIST)


def _kernel(a_ref, b_ref, m_ref, bi_ref, bd_ref, sd_ref,
            best_s, sec_s, idx_s):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, _INF)
        sec_s[:] = jnp.full_like(sec_s, _INF)
        idx_s[:] = jnp.zeros_like(idx_s)

    a = a_ref[:]                       # (TM, 256) bf16 bits
    b = b_ref[:]                       # (TN, 256) bf16 bits
    ab = jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TM, TN)
    na = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
    nb = jnp.sum(b.astype(jnp.float32), axis=1, keepdims=True)
    dist = na + nb.T - 2.0 * ab
    dist = jnp.where(m_ref[:] != 0, dist, _INF)      # candidate gate

    # best-2 within the tile
    t_best = jnp.min(dist, axis=1, keepdims=True)            # (TM, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    is_best = dist == t_best
    # first column achieving the min (deterministic tie-break)
    t_arg = jnp.min(jnp.where(is_best, cols, jnp.int32(TN)), axis=1,
                    keepdims=True)
    masked_first = jnp.where(cols == t_arg, _INF, dist)
    t_sec = jnp.min(masked_first, axis=1, keepdims=True)

    o_best = best_s[:]
    o_sec = sec_s[:]
    o_idx = idx_s[:]
    t_arg_g = (t_arg + j * TN).astype(jnp.float32)
    new_best = jnp.minimum(o_best, t_best)
    new_sec = jnp.minimum(jnp.maximum(o_best, t_best),
                          jnp.minimum(o_sec, t_sec))
    new_idx = jnp.where(t_best < o_best, t_arg_g, o_idx)
    best_s[:] = new_best
    sec_s[:] = new_sec
    idx_s[:] = new_idx

    @pl.when(j == n_j - 1)
    def _():
        bi_ref[:] = new_idx.astype(jnp.int32)
        bd_ref[:] = jnp.minimum(new_best, _INF).astype(jnp.int32)
        sd_ref[:] = jnp.minimum(new_sec, _INF).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def masked_best2(a_packed, b_packed, mask, interpret: bool = False):
    """Fused masked best-2 Hamming matcher.

    a_packed (M, 8) uint32, b_packed (N, 8) uint32, mask (M, N) bool.
    Returns (best_idx (M,) int32, best (M,) int32, second (M,) int32) with
    hamming.INF_DIST sentinels on fully-masked rows — identical contract to
    hamming.masked_argmin(hamming.distance_matrix(a, b), mask).
    M and N must be multiples of the 256 tile.
    """
    M = a_packed.shape[0]
    N = b_packed.shape[0]
    assert M % TM == 0 and N % TN == 0, (M, N)
    A = hamming.unpack_bits(a_packed)
    B = hamming.unpack_bits(b_packed)
    m8 = mask.astype(jnp.int8)

    grid = (M // TM, N // TN)
    out_shape = [
        jax.ShapeDtypeStruct((M, 1), jnp.int32),
        jax.ShapeDtypeStruct((M, 1), jnp.int32),
        jax.ShapeDtypeStruct((M, 1), jnp.int32),
    ]
    bi, bd, sd = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, 256), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TM, 1), jnp.float32),
            pltpu.VMEM((TM, 1), jnp.float32),
            pltpu.VMEM((TM, 1), jnp.float32),
        ],
        interpret=interpret,
    )(A, B, m8)
    return bi[:, 0], bd[:, 0], sd[:, 0]
