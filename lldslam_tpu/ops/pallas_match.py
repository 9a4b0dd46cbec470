"""Pallas TPU kernel: fused masked Hamming best-2 matching.

The matchers' hot pattern is `distance_matrix -> mask -> argmin/second`
(frontend/matching.py, ops/hamming.py). Composed from XLA ops that
materializes an (M, N) int32 distance matrix in HBM (18 MB at 2176^2) and
re-reads it twice. This kernel fuses the whole pattern: per (TM, TN) tile it
computes distances on the MXU via the bit-matmul identity
popcount(xor) = |a| + |b| - 2 A.B^T, applies the candidate mask, and folds a
running (best, second, argbest, argsecond) per row in VMEM scratch — the
distance matrix never exists in HBM.

Grid: (M/TM, N/TN) with N innermost (sequential on TPU), scratch persists
across the N sweep; outputs are written on the last N tile.

Wired into frontend.matching.search_by_projection on TPU backends
(use_pallas_match), replacing the XLA distance_matrix + two argmin passes.
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


def _kernel(a_ref, b_ref, m_ref, bi_ref, bd_ref, sd_ref, si_ref,
            best_s, sec_s, idx_s, sidx_s):
    """Per-row running state lives in (TM, 128) buffers (the TPU lane
    minimum — (TM, 1) shapes crash Mosaic); every lane carries the same
    value, the wrapper reads column 0."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_s[:] = jnp.full_like(best_s, _INF)
        sec_s[:] = jnp.full_like(sec_s, _INF)
        idx_s[:] = jnp.zeros_like(idx_s)
        sidx_s[:] = jnp.zeros_like(sidx_s)

    # cast the bit tiles to f32 IN VMEM: this environment's Mosaic rejects
    # bf16 x bf16 -> f32 tpu.matmul (the "exit 1, no diagnostics" crash
    # that kept this kernel gated off for three rounds was exactly this —
    # found round 5 via the same failure in ops/patch_sample.py)
    a = a_ref[:].astype(jnp.float32)   # (TM, 256) bits
    bt = b_ref[:].astype(jnp.float32)  # (256, TN) bits, pre-transposed
    # standard (M,K)x(K,N) contraction — Mosaic rejects the K-contracted
    # rhs form ("Bad lhs type"), so B ships transposed from the wrapper
    ab = jax.lax.dot_general(
        a, bt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TM, TN)
    na = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
    nb = jnp.sum(bt.astype(jnp.float32), axis=0, keepdims=True)
    dist = na + nb - 2.0 * ab
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
    is_sec = masked_first == t_sec
    t_sarg = jnp.min(jnp.where(is_sec, cols, jnp.int32(TN)), axis=1,
                     keepdims=True)

    o_best = best_s[:]
    o_sec = sec_s[:]
    o_idx = idx_s[:]
    o_sidx = sidx_s[:]
    t_arg_g = (t_arg + j * TN).astype(jnp.float32)
    t_sarg_g = (t_sarg + j * TN).astype(jnp.float32)
    new_best = jnp.minimum(o_best, t_best)
    new_idx = jnp.where(t_best < o_best, t_arg_g, o_idx)
    # second = min of the loser-of-the-best contest, old second, tile second
    loser_v = jnp.maximum(o_best, t_best)
    loser_i = jnp.where(t_best < o_best, o_idx, t_arg_g)
    new_sec = jnp.minimum(loser_v, jnp.minimum(o_sec, t_sec))
    new_sidx = jnp.where(
        loser_v <= jnp.minimum(o_sec, t_sec), loser_i,
        jnp.where(o_sec <= t_sec, o_sidx, t_sarg_g))
    best_s[:] = new_best
    sec_s[:] = new_sec
    idx_s[:] = new_idx
    sidx_s[:] = new_sidx

    @pl.when(j == n_j - 1)
    def _():
        bi_ref[:] = jnp.broadcast_to(new_idx, bi_ref.shape).astype(jnp.int32)
        bd_ref[:] = jnp.broadcast_to(
            jnp.minimum(new_best, _INF), bd_ref.shape).astype(jnp.int32)
        sd_ref[:] = jnp.broadcast_to(
            jnp.minimum(new_sec, _INF), sd_ref.shape).astype(jnp.int32)
        si_ref[:] = jnp.broadcast_to(new_sidx, si_ref.shape).astype(jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def masked_best2(a_packed, b_packed, mask, interpret: bool = False):
    """Fused masked best-2 Hamming matcher.

    a_packed (M, 8) uint32, b_packed (N, 8) uint32, mask (M, N) bool.
    Returns (best_idx (M,), best (M,), second (M,), second_idx (M,)) int32
    with hamming.INF_DIST sentinels on fully-masked rows — same contract as
    hamming.masked_argmin over hamming.distance_matrix, plus the runner-up
    column (the octave ratio gate of ORBmatcher.cc:117-127 needs it).
    M and N must be multiples of the 256 tile.
    """
    M = a_packed.shape[0]
    N = b_packed.shape[0]
    assert M % TM == 0 and N % TN == 0, (M, N)
    A = hamming.unpack_bits(a_packed)
    BT = hamming.unpack_bits(b_packed).T    # (256, N)
    m8 = mask.astype(jnp.int8)

    grid = (M // TM, N // TN)
    out_shape = [
        jax.ShapeDtypeStruct((M, 128), jnp.int32),
        jax.ShapeDtypeStruct((M, 128), jnp.int32),
        jax.ShapeDtypeStruct((M, 128), jnp.int32),
        jax.ShapeDtypeStruct((M, 128), jnp.int32),
    ]
    row = pl.BlockSpec((TM, 128), lambda i, j: (i, 0),
                       memory_space=pltpu.VMEM)
    bi, bd, sd, si = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row, row, row, row],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TM, 128), jnp.float32),
            pltpu.VMEM((TM, 128), jnp.float32),
            pltpu.VMEM((TM, 128), jnp.float32),
            pltpu.VMEM((TM, 128), jnp.float32),
        ],
        interpret=interpret,
    )(A, BT, m8)
    return bi[:, 0], bd[:, 0], sd[:, 0], si[:, 0]
