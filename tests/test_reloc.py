"""End-to-end relocalization: blind the camera mid-sequence, then return to
a mapped place — the tracker must re-enter OK via the BoW + EPnP path
(Tracking::Relocalization, Tracking.cc:1837-1998)."""
import numpy as np
import pytest

from test_pipeline import _config, _make_world, _render, W, H
from lldslam_tpu.geometry import se3
from lldslam_tpu.system import System

import jax.numpy as jnp


@pytest.mark.slow
def test_relocalization_after_blackout():
    rng = np.random.default_rng(3)
    pts, patches = _make_world(rng)
    cfg = _config()
    cam = cfg.camera.stereo_camera()
    sys = System(cfg)
    sys.tracker.local_pt_cap = 2048
    sys.tracker.mapper.p_cap = 2048
    sys.tracker.mapper.o_cap = 6144

    gt = []
    T = np.eye(4, dtype=np.float32)
    for i in range(34):
        gt.append(T.copy())
        xi = np.array([0.0, 0.0, -0.25, 0.0, 0.004, 0.0], np.float32)
        T = np.asarray(se3.exp(jnp.asarray(xi)) @ jnp.asarray(T))

    for i in range(28):
        imL, imR = _render(cam, gt[i], pts, patches)
        _, m = sys.track_stereo(imL, imR, timestamp=i * 0.1)
        assert m.state == "OK"
    # the auto-reset path (Tracking.cc:482-488) must NOT fire: the map has
    # grown past 5 keyframes by now
    assert sys.map.n_kf > 5

    # blackout: featureless frames -> LOST
    blank = np.full((H, W), 15.0, np.float32)
    for i in range(3):
        _, m = sys.track_stereo(blank, blank, timestamp=1.0 + i * 0.1)
    assert m.state == "LOST"

    # return to a previously mapped pose (frame 4's view)
    imL, imR = _render(cam, gt[4], pts, patches)
    _, m = sys.track_stereo(imL, imR, timestamp=2.0)
    assert m.state == "OK", "relocalization failed"
    # pose must match frame 4's ground truth
    T_est = sys.tracker.T_cw
    err = np.asarray(se3.log(jnp.asarray(
        np.linalg.inv(T_est) @ gt[4])))
    assert np.linalg.norm(err[:3]) < 0.1   # translation (m)
    assert np.linalg.norm(err[3:]) < 0.02  # rotation (rad)
