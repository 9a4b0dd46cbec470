"""Monocular end-to-end: H/F bootstrap + scale-free tracking."""
import numpy as np
import jax.numpy as jnp
import pytest

from test_pipeline import _config, _make_world, _render
from lldslam_tpu.geometry import se3
from lldslam_tpu.system import System


@pytest.mark.slow
def test_monocular_bootstrap_and_tracking():
    rng = np.random.default_rng(17)
    pts, patches = _make_world(rng, n=500)
    cfg = _config()
    cam = cfg.camera.stereo_camera()
    sys = System(cfg)
    sys.tracker.local_pt_cap = 2048
    sys.tracker.mapper.p_cap = 2048
    sys.tracker.mapper.o_cap = 6144

    # sideways-dominant motion gives the bootstrap parallax
    n_frames = 12
    gt = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        gt.append(T.copy())
        xi = np.array([0.18, 0.0, -0.12, 0.0, 0.003, 0.0], np.float32)
        T = np.asarray(se3.exp(jnp.asarray(xi)) @ jnp.asarray(T))

    states = []
    for i in range(n_frames):
        imL, _ = _render(cam, gt[i], pts, patches)
        _, m = sys.track_monocular(imL, timestamp=i * 0.1)
        states.append(m.state)
    assert "OK" in states, states
    first_ok = states.index("OK")
    assert first_ok <= 4, states
    assert all(s == "OK" for s in states[first_ok:]), states
    assert sys.map.n_pt > 50

    # mono trajectory is correct up to a global scale: compare directions.
    # Logs begin at the frame the bootstrap completed; align on the tail.
    _, T_wc = sys.tracker.trajectory()
    est_p = T_wc[:, :3, 3]
    off = n_frames - len(est_p)
    # SLAM world = pose of the bootstrap reference frame (frame 0 here)
    gt_p = np.stack([np.linalg.inv(g @ np.linalg.inv(gt[0]))[:3, 3]
                     for g in gt[off:]])
    s_est = np.linalg.norm(est_p[-1] - est_p[0])
    s_gt = np.linalg.norm(gt_p[-1] - gt_p[0])
    assert s_est > 1e-3
    # median-depth normalization makes per-frame motion ~1% of scene depth,
    # comparable to mono triangulation noise — only the overall direction of
    # travel is a meaningful smoke check here
    d_est = (est_p[-1] - est_p[0]) / s_est
    d_gt = (gt_p[-1] - gt_p[0]) / s_gt
    assert d_est @ d_gt > 0.7, (d_est, d_gt)