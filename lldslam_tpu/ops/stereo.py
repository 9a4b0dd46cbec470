"""Stereo keypoint matching: row-banded Hamming argmin + subpixel SAD parabola.

Replaces `Frame::ComputeStereoMatches` (reference src/Frame.cc:530-704):
- candidates: right keypoints whose row is within +-2 * scale(octave) of the
  left keypoint's row (Frame.cc:552-565) and whose disparity lies in
  [minD, maxD] = [0, bf/b_min] (Frame.cc:572-574: minZ = baseline),
- best Hamming match under TH_HIGH (Frame.cc:600-613, th = ORBmatcher::TH_HIGH),
- subpixel refinement: 11x11 SAD over a +-5 disparity sweep on the octave-level
  images around the matched pair, parabola fit over the best 3 (Frame.cc:615-687),
- outlier sweep by 2x median SAD cost kept as a mask (Frame.cc:689-704).

Output: per-left-keypoint `u_right` (level-0 coords, subpixel) and `depth`,
with -1 sentinels, exactly the convention of `Frame::mvuRight`/`mvDepth`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.camera import StereoCamera
from . import hamming
from .orb import Keypoints, OrbConfig


def _sample_windows(kp_l, ul, vl, ur, pyr_l, pyr_r, cfg, W: int, L: int):
    """Per-level SAD window extraction through ops/patch_sample: returns
    (patch (n, 11, 11) from the left level image, strip (n, 11, 11+2L) from
    the right). Keypoint slots are level-ordered with static ranges, so the
    level loop uses static slices only."""
    from . import patch_sample as psmp

    n = ul.shape[0]
    budgets = cfg.per_level_budget()
    patch = jnp.zeros((n, 2 * W + 1, 2 * W + 1), jnp.float32)
    strip = jnp.zeros((n, 2 * W + 1, 2 * W + 1 + 2 * L), jnp.float32)
    oy = jnp.arange(-W, W + 1)
    ox_p = jnp.arange(-W, W + 1)
    ox_s = jnp.arange(-W - L, W + L + 1)
    off = 0
    for l, n_l in enumerate(budgets):
        imL, imR = pyr_l[l], pyr_r[l]
        h, w = imL.shape
        wp = ((w + 127) // 128) * 128
        stack = jnp.stack([jnp.pad(imL, ((0, 0), (0, wp - w))),
                           jnp.pad(imR, ((0, 0), (0, wp - w)))])
        sl = slice(off, off + n_l)
        ul_l = jnp.clip(ul[sl], 0, w - 1)
        vl_l = jnp.clip(vl[sl], 0, h - 1)
        ur_l = jnp.clip(ur[sl], 0, w - 1)
        r0 = jnp.clip(((vl_l - W) // 8) * 8, 0, h - psmp.ROWS)

        def taps(ucenter, view, ox, S_pad):
            c0 = jnp.clip(((ucenter - W - L) // 128) * 128, 0, wp - psmp.COLS)
            gy = jnp.clip(vl_l[:, None, None] + oy[None, :, None], 0, h - 1)
            gx = jnp.clip(ucenter[:, None, None] + ox[None, None, :], 0, w - 1)
            iy = jnp.broadcast_to(gy - r0[:, None, None],
                                  (n_l, len(oy), len(ox))).reshape(n_l, -1)
            ix = jnp.broadcast_to(gx - c0[:, None, None],
                                  (n_l, len(oy), len(ox))).reshape(n_l, -1)
            S = iy.shape[1]
            iy = jnp.pad(iy, ((0, 0), (0, S_pad - S)))
            ix = jnp.pad(ix, ((0, 0), (0, S_pad - S)))
            meta = jnp.stack([jnp.full_like(r0, view), r0, c0,
                              jnp.zeros_like(r0)], axis=-1)
            npad = (-n_l) % psmp.KB
            if npad:
                iy = jnp.pad(iy, ((0, npad), (0, 0)))
                ix = jnp.pad(ix, ((0, npad), (0, 0)))
                meta = jnp.pad(meta, ((0, npad), (0, 0)))
            vals = psmp.sample_patches(stack, meta, iy, ix)[:n_l, :S]
            return vals.reshape(n_l, len(oy), len(ox))

        patch = patch.at[sl].set(taps(ul_l, 0, ox_p, 128))
        strip = strip.at[sl].set(taps(ur_l, 1, ox_s, 256))
        off += n_l
    return patch, strip


@partial(jax.jit, static_argnames=("cfg", "cam"))
def match_stereo(
    kp_l: Keypoints,
    kp_r: Keypoints,
    pyr_l,
    pyr_r,
    cam: StereoCamera,
    cfg: OrbConfig = OrbConfig(),
):
    """Returns (u_right (N,), depth (N,)) float32 with -1 for unmatched.

    pyr_l / pyr_r: image pyramids (lists) of the two views, used for the
    subpixel SAD refinement at each keypoint's octave.
    """
    scales = jnp.asarray(cfg.scale_factors(), jnp.float32)
    sl = scales[kp_l.octave]
    # --- candidate gating (row band, octave band, disparity range) ---
    row_tol = 2.0 * sl  # 2 * scale of the left kp's octave (Frame.cc:552)
    dv = jnp.abs(kp_l.xy[:, 1:2] - kp_r.xy[None, :, 1])
    row_ok = dv <= row_tol[:, None]
    oct_ok = (
        jnp.abs(kp_l.octave[:, None] - kp_r.octave[None, :]) <= 1
    )  # Frame.cc:560: octave within [octL-1, octL+1]
    min_d = 0.0
    max_d = cam.bf / cam.baseline  # minZ = baseline (Frame.cc:572-574)
    disp = kp_l.xy[:, 0:1] - kp_r.xy[None, :, 0]
    disp_ok = (disp >= min_d) & (disp <= max_d)
    cand = row_ok & oct_ok & disp_ok

    idx, ok, dist = hamming.match_descriptors(
        kp_l.desc, kp_l.valid, kp_r.desc, kp_r.valid,
        max_dist=hamming.TH_HIGH, cand_mask=cand, mutual=False,
    )

    # --- subpixel SAD refinement on the octave-level images ---
    # Work at the left keypoint's octave: scaled coords.
    W = 5  # half window (11x11, Frame.cc:622)
    L = 5  # disparity sweep +-5 (Frame.cc:627)
    u_r0 = kp_r.xy[idx, 0]
    inv_s = 1.0 / sl
    ul = jnp.round(kp_l.xy[:, 0] * inv_s).astype(jnp.int32)
    vl = jnp.round(kp_l.xy[:, 1] * inv_s).astype(jnp.int32)
    ur = jnp.round(u_r0 * inv_s).astype(jnp.int32)

    from .orb import use_pallas_brief
    from . import patch_sample as psmp
    pallas_ok = use_pallas_brief() and all(
        p.shape[0] >= psmp.ROWS and ((p.shape[1] + 127) // 128) * 128
        >= psmp.COLS for p in pyr_l)
    if pallas_ok:
        # window extraction via the Pallas patch sampler, per level: the
        # keypoint array is level-ordered with STATIC per-level ranges
        # (orb.extract_stack_pyr concatenation), so each level's slice reads
        # its own (2, H_l, Wp_l) image stack — no giant stacked-pyramid
        # gather (that XLA element-gather was ~8 ms/frame at KITTI size)
        patch, strip = _sample_windows(
            kp_l, ul, vl, ur, pyr_l, pyr_r, cfg, W, L)
    else:
        # XLA fallback: one gather from a level-stacked pyramid
        H0, W0 = pyr_l[0].shape
        stk_l = jnp.stack([jnp.pad(p, ((0, H0 - p.shape[0]), (0, W0 - p.shape[1])))
                           for p in pyr_l])  # (levels, H0, W0)
        stk_r = jnp.stack([jnp.pad(p, ((0, H0 - p.shape[0]), (0, W0 - p.shape[1])))
                           for p in pyr_r])
        lh = jnp.asarray([p.shape[0] for p in pyr_l], jnp.int32)
        lw = jnp.asarray([p.shape[1] for p in pyr_l], jnp.int32)
        lvl = jnp.clip(kp_l.octave, 0, len(pyr_l) - 1)
        hk = lh[lvl]  # (n,) per-keypoint level dims
        wk = lw[lvl]

        oy = jnp.arange(-W, W + 1)
        ox_p = jnp.arange(-W, W + 1)
        ox_s = jnp.arange(-W - L, W + L + 1)
        yy = jnp.clip(vl[:, None] + oy[None, :], 0, hk[:, None] - 1)    # (n, 11)
        xxp = jnp.clip(ul[:, None] + ox_p[None, :], 0, wk[:, None] - 1)  # (n, 11)
        xxs = jnp.clip(ur[:, None] + ox_s[None, :], 0, wk[:, None] - 1)  # (n, 11+2L)
        l3 = lvl[:, None, None]
        patch = stk_l[l3, yy[:, :, None], xxp[:, None, :]]  # (n, 11, 11)
        strip = stk_r[l3, yy[:, :, None], xxs[:, None, :]]  # (n, 11, 11+2L)
    # center-subtract both (Frame.cc:624,644: IL - IL(center))
    patch_c = patch - patch[:, W, W][:, None, None]
    costs = []
    for d in range(2 * L + 1):
        win = jax.lax.dynamic_slice_in_dim(strip, d, 2 * W + 1, axis=2)
        win_c = win - win[:, W, W][:, None, None]
        costs.append(jnp.sum(jnp.abs(patch_c - win_c), axis=(1, 2)))
    sad = jnp.stack(costs, axis=-1)  # (n, 2L+1)

    best_d = jnp.argmin(sad, axis=-1)
    best_c = jnp.take_along_axis(sad, best_d[:, None], axis=-1)[:, 0]
    interior = (best_d > 0) & (best_d < 2 * L)
    cm1 = jnp.take_along_axis(sad, jnp.maximum(best_d - 1, 0)[:, None], axis=-1)[:, 0]
    cp1 = jnp.take_along_axis(sad, jnp.minimum(best_d + 1, 2 * L)[:, None], axis=-1)[:, 0]
    denom = jnp.maximum(2.0 * (cm1 + cp1 - 2.0 * best_c), 1e-6)
    delta = (cm1 - cp1) / denom  # parabola vertex offset (Frame.cc:659-663)
    delta = jnp.clip(jnp.where(interior, delta, 0.0), -1.0, 1.0)
    # refined right-u at octave scale -> level-0 coords (Frame.cc:665-668)
    u_r_ref = (ur.astype(jnp.float32) + (best_d - L).astype(jnp.float32) + delta) * sl

    disparity = kp_l.xy[:, 0] - u_r_ref
    ok = ok & (disparity > 1e-3) & (disparity <= max_d)
    # median-SAD outlier sweep (Frame.cc:689-704): cost <= 2 * median(cost)
    valid_costs = jnp.where(ok, best_c, jnp.nan)
    med = jnp.nanmedian(valid_costs)
    ok = ok & (best_c <= 2.0 * jnp.where(jnp.isnan(med), jnp.inf, med))

    depth = jnp.where(ok, cam.bf / jnp.maximum(disparity, 1e-6), -1.0)
    u_right = jnp.where(ok, u_r_ref, -1.0)
    return u_right, depth
