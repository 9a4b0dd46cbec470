"""Monocular initializer (optim/initializer.py): H/F RANSAC, model
selection, reconstruction — synthetic two-view ground truth."""
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.geometry import se3
from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.optim import initializer

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                   width=640, height=480)


def _two_view(rng, n=300, planar=False, noise=0.3, outlier_frac=0.1):
    if planar:
        X = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                      np.full(n, 10.0)], -1).astype(np.float32)
    else:
        X = np.stack([rng.uniform(-5, 5, n), rng.uniform(-3, 3, n),
                      rng.uniform(6, 20, n)], -1).astype(np.float32)
    xi = np.array([0.6, 0.1, 0.05, 0.0, -0.03, 0.0], np.float32)
    T = np.asarray(se3.exp(jnp.asarray(xi)))
    R, t = T[:3, :3], T[:3, 3]

    def proj(P):
        return np.stack([CAM.fx * P[:, 0] / P[:, 2] + CAM.cx,
                         CAM.fy * P[:, 1] / P[:, 2] + CAM.cy], -1)

    x1 = proj(X) + rng.normal(0, noise, (n, 2))
    x2 = proj(X @ R.T + t) + rng.normal(0, noise, (n, 2))
    out = rng.uniform(size=n) < outlier_frac
    x2[out] += rng.uniform(20, 80, (out.sum(), 2))
    return (x1.astype(np.float32), x2.astype(np.float32), ~out, R, t, X)


def test_general_scene_selects_f_and_reconstructs():
    rng = np.random.default_rng(0)
    x1, x2, clean, R_gt, t_gt, X_gt = _two_view(rng)
    n = len(x1)
    ok, R, t, X, good = initializer.initialize(
        CAM, jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool),
        jax.random.PRNGKey(0))
    assert ok
    # rotation error (translation only up to scale)
    dR = R @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01, ang
    tdir = t / np.linalg.norm(t)
    tgt = t_gt / np.linalg.norm(t_gt)
    assert abs(tdir @ tgt) > 0.999
    # triangulated structure correct up to the global scale
    s = np.median(np.linalg.norm(X[good], axis=-1)
                  / np.linalg.norm(X_gt[good], axis=-1))
    err = np.linalg.norm(X[good] / s - X_gt[good], axis=-1)
    assert np.median(err) < 0.3  # ~z^2*sigma/(f*b) triangulation noise


def test_planar_scene_selects_h_and_reconstructs():
    rng = np.random.default_rng(1)
    x1, x2, clean, R_gt, t_gt, X_gt = _two_view(rng, planar=True,
                                                outlier_frac=0.05)
    n = len(x1)
    H, sh, inh, F, sf, inf_ = initializer.ransac_models(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool),
        jax.random.PRNGKey(1))
    rh = float(sh) / (float(sh) + float(sf))
    assert rh > 0.40, rh  # planar scene must prefer the homography
    ok, R, t, X, good = initializer.initialize(
        CAM, jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n, bool),
        jax.random.PRNGKey(1))
    assert ok
    dR = R @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.02, ang
