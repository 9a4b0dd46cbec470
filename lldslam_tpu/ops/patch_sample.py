"""Pallas TPU kernel: batched per-keypoint patch sampling.

The descriptor/refinement stages need `img[y_i + dy_s, x_i + dx_s]` for a few
hundred data-dependent offsets per keypoint (rotated BRIEF taps,
ORBextractor.cc:108-147; stereo SAD windows, Frame.cc:615-687). XLA lowers
that (n, S) 2-D gather element-by-element on TPU — measured ~6 ms per level
pair at the KITTI workload, the single largest cost in frame build.

This kernel reformulates the gather as MXU work: each keypoint slices a
(ROWS=48, COLS=256) window out of the in-VMEM image (the window always
contains every tap: |dy|,|dx| <= 19 and the column origin is 128-aligned),
builds a one-hot row selector R (ROWS, S) and column selector C (COLS, S),
and computes

    vals[s] = sum_rc patch[r, c] * R[r, s] * C[c, s]
            = sum_c (R^T patch)[s, c] * C^T[s, c]

i.e. one (S, ROWS) x (ROWS, COLS) matmul plus a masked VPU reduction — no
gather instruction anywhere. Image values are integers in [0, 255], exact in
bfloat16, so the result is exact.

Row/column bookkeeping (window origins, in-window tap coordinates) is plain
XLA on the caller side; the kernel only slices + samples.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 48          # window rows: 8-aligned origin covering y +- 19 taps
COLS = 256         # window cols: 128-aligned origin covering x +- 19
KB = 8             # keypoints per grid step


def _kernel(meta_ref, iy_ref, ix_ref, img_ref, out_ref):
    # meta_ref (KB, 4) int32 SMEM: [view, r0, c0, _]
    # iy_ref/ix_ref (KB, S) int32 VMEM: in-window tap coords
    # img_ref (V, H, Wp) f32 VMEM (whole stack)
    # out_ref (KB, S) f32
    S = iy_ref.shape[1]
    for j in range(KB):
        v = meta_ref[j, 0]
        r0 = pl.multiple_of(meta_ref[j, 1], 8)
        c0 = pl.multiple_of(meta_ref[j, 2], 128)
        # the HBM->VMEM image block may be bf16 (integer intensities are
        # exact); the matmul runs f32 — this Mosaic rejects bf16xbf16->f32
        # tpu.matmul, and the cast is VMEM-local so it costs no HBM traffic
        patch = img_ref[v, pl.ds(r0, ROWS), pl.ds(c0, COLS)] \
            .astype(jnp.float32)                              # (ROWS, COLS)
        iy = iy_ref[j:j + 1, :].reshape(S, 1)                 # (S, 1)
        ix = ix_ref[j:j + 1, :].reshape(S, 1)
        R = (jax.lax.broadcasted_iota(jnp.int32, (S, ROWS), 1) == iy
             ).astype(jnp.float32)                            # (S, ROWS)
        m1 = jax.lax.dot_general(
            R, patch,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (S, COLS)
        C = jax.lax.broadcasted_iota(jnp.int32, (S, COLS), 1) == ix
        out_ref[j:j + 1, :] = jnp.sum(
            jnp.where(C, m1, 0.0), axis=1).reshape(1, S)


@partial(jax.jit, static_argnames=("interpret",))
def sample_patches(img, meta, iy, ix, interpret: bool = False):
    """vals (n, S) f32 where vals[i, s] = img[meta[i,0], meta[i,1] + iy[i,s],
    meta[i,2] + ix[i,s]].

    img  (V, H, Wp) f32, Wp a multiple of 128, H >= ROWS, Wp >= COLS.
    meta (n, 4) int32: [view, row0(8-aligned), col0(128-aligned), unused];
         row0 in [0, H-ROWS], col0 in [0, Wp-COLS].
    iy   (n, S) int32 in [0, ROWS); ix (n, S) int32 in [0, COLS).
    n must be a multiple of KB; S a multiple of 128.
    """
    n, S = iy.shape
    assert n % KB == 0 and S % 128 == 0, (n, S)
    V, H, Wp = img.shape
    assert Wp % 128 == 0 and H >= ROWS and Wp >= COLS, img.shape
    grid = (n // KB,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((KB, 4), lambda k: (k, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((KB, S), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KB, S), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, H, Wp), lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KB, S), lambda k: (k, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, S), jnp.float32),
        interpret=interpret,
    )(meta, iy, ix, img)
