"""Stereo undistortion + rectification.

Replaces the cv::initUndistortRectifyMap / cv::remap pair the reference's
EuRoC driver runs per frame on the CPU (Examples/Stereo/stereo_euroc.cc:
101-151, using the LEFT./RIGHT. K, D, R, P blocks of EuRoC_*.yaml): the maps
are precomputed once on host (inverse mapping with radial-tangential
distortion), the per-frame bilinear remap is a jitted device gather.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_rectify_maps(K, D, R, P, size):
    """Inverse rectification maps, one-off on host.

    K (3,3) intrinsics, D (k1,k2,p1,p2[,k3]) distortion, R (3,3) rectifying
    rotation, P (3,4 or 3,3) new projection, size (w, h).
    Returns (map_x, map_y) float32 (h, w): source pixel per rectified pixel.
    """
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64).reshape(-1)
    k1, k2 = D[0], D[1]
    p1, p2 = (D[2], D[3]) if len(D) >= 4 else (0.0, 0.0)
    k3 = D[4] if len(D) >= 5 else 0.0
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    w, h = size
    fx_n, fy_n = P[0, 0], P[1, 1]
    cx_n, cy_n = P[0, 2], P[1, 2]

    u, v = np.meshgrid(np.arange(w), np.arange(h))
    x = (u - cx_n) / fx_n
    y = (v - cy_n) / fy_n
    ray = np.stack([x, y, np.ones_like(x)], -1) @ np.linalg.inv(R).T
    xn = ray[..., 0] / ray[..., 2]
    yn = ray[..., 1] / ray[..., 2]
    r2 = xn * xn + yn * yn
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 ** 3
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn
    map_x = (K[0, 0] * xd + K[0, 2]).astype(np.float32)
    map_y = (K[1, 1] * yd + K[1, 2]).astype(np.float32)
    return map_x, map_y


@jax.jit
def remap(img: jnp.ndarray, map_x: jnp.ndarray, map_y: jnp.ndarray):
    """Bilinear remap on device (cv::remap equivalent)."""
    img = img.astype(jnp.float32)
    h, w = img.shape
    x = jnp.clip(map_x, 0.0, w - 1.001)
    y = jnp.clip(map_y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    dx = x - x0
    dy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = ((1 - dy) * (1 - dx) * v00 + (1 - dy) * dx * v01
           + dy * (1 - dx) * v10 + dy * dx * v11)
    # out-of-source pixels -> 0 (BORDER_CONSTANT)
    inside = (map_x >= 0) & (map_x <= w - 1) & (map_y >= 0) & (map_y <= h - 1)
    return jnp.where(inside, out, 0.0)


class StereoRectifier:
    """Per-sequence rectifier built from the EuRoC config blocks."""

    def __init__(self, cfg_dict: dict):
        def mat(key):
            rows, cols, vals = cfg_dict[key]
            return np.asarray(vals, np.float64).reshape(rows, cols)

        wl = int(cfg_dict["LEFT.width"])
        hl = int(cfg_dict["LEFT.height"])
        self.maps_l = make_rectify_maps(
            mat("LEFT.K"), mat("LEFT.D"), mat("LEFT.R"), mat("LEFT.P"),
            (wl, hl))
        self.maps_r = make_rectify_maps(
            mat("RIGHT.K"), mat("RIGHT.D"), mat("RIGHT.R"), mat("RIGHT.P"),
            (int(cfg_dict["RIGHT.width"]), int(cfg_dict["RIGHT.height"])))
        self._jl = tuple(jnp.asarray(m) for m in self.maps_l)
        self._jr = tuple(jnp.asarray(m) for m in self.maps_r)

    def __call__(self, img_l, img_r):
        return (remap(jnp.asarray(img_l), *self._jl),
                remap(jnp.asarray(img_r), *self._jr))
