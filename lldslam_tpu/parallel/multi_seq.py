"""Batched multi-sequence evaluation: one device program tracks S sequences.

The BASELINE.json configs include "full combined KITTI+EuRoC 13-sequence
benchmark sweep, batched multi-sequence on one host". Every per-frame kernel
in this framework is fixed-shape, so the whole fused tracking step vmaps over
a leading sequence axis: S stereo pairs in, S poses out, one XLA program.
The host-side keyframe bookkeeping stays per-sequence (it runs at keyframe
rate), but the 99%-of-compute per-frame path batches perfectly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..frontend.frame import build_frame
from ..geometry.camera import StereoCamera
from ..ops.orb import OrbConfig
from ..pipeline.tracker import _track_step


@partial(jax.jit, static_argnames=("cam", "cfg"))
def batched_build_frame(imgs_l, imgs_r, cam: StereoCamera, cfg: OrbConfig):
    """(S, H, W) x2 -> vmapped FrameData batch."""
    return jax.vmap(lambda l, r: build_frame(l, r, cam, cfg))(imgs_l, imgs_r)


@partial(jax.jit, static_argnames=("cam", "n_levels", "scale", "min_mm",
                                   "close_depth"))
def batched_track_step(cam, T_pred, last_feats, last_ptpos, last_haspt,
                       cur, depth, view, inv_sigma2_lut,
                       n_levels, scale, min_mm, close_depth):
    """vmap of the fused per-frame tracking step over the sequence axis.
    All array arguments carry a leading S dim; returns the same packed
    outputs batched."""
    def one(T_pred, last_feats, last_ptpos, last_haspt, cur, depth, view):
        return _track_step(cam, T_pred, last_feats, last_ptpos, last_haspt,
                           cur, depth, view, inv_sigma2_lut,
                           n_levels, scale, min_mm, close_depth)
    return jax.vmap(one)(T_pred, last_feats, last_ptpos, last_haspt,
                         cur, depth, view)
