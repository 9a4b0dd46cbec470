"""Batched EPnP RANSAC (optim/pnp.py) against synthetic ground truth."""
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.geometry import se3
from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.optim import pnp

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                   width=640, height=480)


def _scene(rng, n, T_cw):
    Pw = np.stack([rng.uniform(-6, 6, n), rng.uniform(-4, 4, n),
                   rng.uniform(6, 25, n)], -1).astype(np.float32)
    Xc = (T_cw[:3, :3] @ Pw.T).T + T_cw[:3, 3]
    u = CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx
    v = CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy
    return Pw, np.stack([u, v], -1).astype(np.float32)


def test_epnp_exact():
    rng = np.random.default_rng(0)
    xi = np.array([0.1, -0.15, 0.05, 0.3, -0.2, 0.5], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi)))
    Pw, uv = _scene(rng, 8, T_true)
    T = np.asarray(pnp.epnp(CAM, jnp.asarray(Pw), jnp.asarray(uv)))
    err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T) @ T_true)))
    assert np.linalg.norm(err[:3]) < 1e-2
    assert np.linalg.norm(err[3:]) < 5e-2


def test_ransac_pnp_with_outliers():
    rng = np.random.default_rng(1)
    xi = np.array([0.05, 0.2, -0.1, -0.4, 0.1, 0.8], np.float32)
    T_true = np.asarray(se3.exp(jnp.asarray(xi)))
    n = 128
    Pw, uv = _scene(rng, n, T_true)
    out = rng.uniform(size=n) < 0.35
    uv[out] += rng.uniform(20, 80, (out.sum(), 2)).astype(np.float32)
    T, inl, n_inl = pnp.ransac_pnp(
        CAM, jnp.asarray(Pw), jnp.asarray(uv), jnp.ones(n),
        jnp.ones(n, bool), jax.random.PRNGKey(0))
    T = np.asarray(T)
    assert int(n_inl) >= 0.9 * (~out).sum()
    err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T) @ T_true)))
    assert np.linalg.norm(err[:3]) < 2e-2
    assert np.linalg.norm(err[3:]) < 1e-1


def test_ransac_pnp_degenerate_all_invalid():
    T, inl, n_inl = pnp.ransac_pnp(
        CAM, jnp.zeros((16, 3)), jnp.zeros((16, 2)), jnp.ones(16),
        jnp.zeros(16, bool), jax.random.PRNGKey(0))
    assert int(n_inl) == 0
