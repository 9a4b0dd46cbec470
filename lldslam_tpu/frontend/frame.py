"""Frame construction: one jitted program per stereo pair.

Replaces the stereo `Frame::Frame` constructor (reference src/Frame.cc:76-161):
dual ORB extraction (the reference forks 2 threads, Frame.cc:101-104 — here
one batched kernel), stereo matching, and the feature bookkeeping the
pipeline needs. The 64x48 keypoint grid (Frame.cc:294) is not materialized:
projection matching uses dense masked distance matrices instead (matching.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.camera import StereoCamera
from ..ops import image, orb, stereo
from .matching import FrameFeatures


class FrameData(NamedTuple):
    """Everything tracking needs from one stereo frame (device arrays)."""

    feats: FrameFeatures     # left keypoints + stereo ur
    depth: jnp.ndarray       # (N,) stereo depth or -1
    right: orb.Keypoints     # right keypoints (for line/stereo debugging)


@jax.jit
def pack_frame(fd: FrameData) -> jnp.ndarray:
    """Flatten the host-bound keyframe snapshot (left features + depth) into
    ONE int32 buffer: each device->host leaf costs a full tunnel round trip
    (~35 ms), so the 6-leaf snapshot download at keyframe rate was ~0.2 s."""
    f = fd.feats
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
    return jnp.concatenate([
        bc(f.xy.reshape(-1)), bc(f.ur), bc(f.angle), bc(fd.depth),
        f.octave, bc(f.desc.reshape(-1)), f.valid.astype(jnp.int32),
    ])


def unpack_frame_np(buf: np.ndarray, n: int):
    """Inverse of pack_frame on host. Returns (feats dict, depth)."""
    o = 0
    xy = buf[o:o + 2 * n].view(np.float32).reshape(n, 2); o += 2 * n
    ur = buf[o:o + n].view(np.float32); o += n
    angle = buf[o:o + n].view(np.float32); o += n
    depth = buf[o:o + n].view(np.float32); o += n
    octave = buf[o:o + n]; o += n
    desc = buf[o:o + 8 * n].view(np.uint32).reshape(n, 8); o += 8 * n
    valid = buf[o:o + n].astype(bool)
    feats = dict(xy=xy, ur=ur, octave=octave, angle=angle, desc=desc,
                 valid=valid)
    return feats, depth


@partial(jax.jit, static_argnames=("cam", "cfg"))
def build_frame(
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    cam: StereoCamera,
    cfg: orb.OrbConfig = orb.OrbConfig(),
) -> FrameData:
    # accept uint8 frames: callers upload 1 byte/px through the (slow)
    # host->device link and the cast runs on device
    img_l = img_l.astype(jnp.float32)
    img_r = img_r.astype(jnp.float32)
    kp_l = orb.extract(img_l, cfg)
    kp_r = orb.extract(img_r, cfg)
    pyr_l = image.build_pyramid(img_l, cfg.n_levels, cfg.scale)
    pyr_r = image.build_pyramid(img_r, cfg.n_levels, cfg.scale)
    u_right, depth = stereo.match_stereo(kp_l, kp_r, pyr_l, pyr_r, cam, cfg)
    feats = FrameFeatures(
        xy=kp_l.xy,
        ur=u_right,
        octave=kp_l.octave,
        angle=kp_l.angle,
        desc=kp_l.desc,
        valid=kp_l.valid,
    )
    return FrameData(feats=feats, depth=depth, right=kp_r)
