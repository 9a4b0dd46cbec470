"""Pinhole + rectified-stereo camera model, batched.

Replaces the projection math scattered through the reference
(Frame::UnprojectStereo src/Frame.cc:725-741, Frame::isInFrustum src/Frame.cc:333,
stereo edge u_R = u_L - bf/z in Optimizer.cc:100-105 and
g2o EdgeStereoSE3ProjectXYZ::cam_project).

A `StereoCamera` is a NamedTuple of scalars so it is a static-friendly pytree;
all methods broadcast over leading batch dims of the point arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class StereoCamera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float  # baseline * fx  (reference `Camera.bf`, Tracking.cc:104)
    width: int
    height: int

    @property
    def baseline(self) -> float:
        return self.bf / self.fx

    def K(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )


def project(cam: StereoCamera, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixel (..., 2) (u, v). No cheirality check."""
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * Xc[..., 0] / z_safe + cam.cx
    v = cam.fy * Xc[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: StereoCamera, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> (..., 3) (uL, v, uR) with uR = uL - bf/z."""
    uv = project(cam, Xc)
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf / z_safe
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(cam: StereoCamera, uv: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Pixel (..., 2) + depth (...,) -> camera-frame (..., 3)
    (Frame::UnprojectStereo, src/Frame.cc:725-741)."""
    x = (uv[..., 0] - cam.cx) * z / cam.fx
    y = (uv[..., 1] - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def disparity_to_depth(cam: StereoCamera, uL: jnp.ndarray, uR: jnp.ndarray) -> jnp.ndarray:
    """depth = bf / (uL - uR); invalid (<=0 disparity) mapped to -1
    (ComputeStereoMatches depth convention, src/Frame.cc:690-704)."""
    disp = uL - uR
    ok = disp > 1e-6
    return jnp.where(ok, cam.bf / jnp.where(ok, disp, 1.0), -1.0)


def in_image(cam: StereoCamera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Bounds check (...,) bool (Frame::isInFrustum image-bounds part)."""
    u, v = uv[..., 0], uv[..., 1]
    return (
        (u >= margin)
        & (u < cam.width - margin)
        & (v >= margin)
        & (v < cam.height - margin)
    )
