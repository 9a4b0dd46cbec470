"""RGB-D tracking path, headless viewer rendering, map checkpoint round trip."""
import numpy as np
import jax.numpy as jnp
import pytest

from test_pipeline import _config, _make_world, _stamp, PS, W, H
from lldslam_tpu.geometry import se3
from lldslam_tpu.system import System


def _render_rgbd(cam, T_cw, pts, patches):
    """Gray image + dense depth map (patch regions carry the point depth,
    background is a far wall)."""
    img = np.full((H, W), 15.0, np.float32)
    depth = np.full((H, W), 60.0, np.float32)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    Xc = (R @ pts.T).T + t
    u = cam.fx * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + cam.cx
    v = cam.fy * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + cam.cy
    h = PS // 2
    order = np.argsort(-Xc[:, 2])
    for i in order:
        if Xc[i, 2] > 0.5 and h + 1 < u[i] < W - h - 1 and h + 1 < v[i] < H - h - 1:
            _stamp(img, patches[i], u[i], v[i])
            iu, iv = int(u[i]), int(v[i])
            depth[iv - h:iv + h + 1, iu - h:iu + h + 1] = Xc[i, 2]
    return img, depth


@pytest.mark.slow
def test_rgbd_tracking_and_viewer_and_checkpoint(tmp_path):
    rng = np.random.default_rng(9)
    pts, patches = _make_world(rng, n=400)
    cfg = _config()
    cam = cfg.camera.stereo_camera()
    sys = System(cfg)
    sys.tracker.local_pt_cap = 2048
    sys.tracker.mapper.p_cap = 2048
    sys.tracker.mapper.o_cap = 6144

    n_frames = 10
    gt = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        gt.append(T.copy())
        xi = np.array([0.0, 0.0, -0.2, 0.0, 0.003, 0.0], np.float32)
        T = np.asarray(se3.exp(jnp.asarray(xi)) @ jnp.asarray(T))

    for i in range(n_frames):
        img, depth = _render_rgbd(cam, gt[i], pts, patches)
        T_est, m = sys.track_rgbd(img, depth, timestamp=i * 0.1)
        assert m.state == "OK", f"RGB-D lost at frame {i}"
    # pose error at the end
    err = np.asarray(se3.log(jnp.asarray(
        np.linalg.inv(sys.tracker.T_cw) @ gt[-1])))
    assert np.linalg.norm(err[:3]) < 0.1

    # viewer renders
    from lldslam_tpu.viewer import render
    _, T_wc = sys.tracker.trajectory()
    img_map = render.render_topdown(sys.map, T_wc,
                                    path=tmp_path / "map.png", size=256)
    assert img_map.shape == (256, 256, 3)
    assert (tmp_path / "map.png").exists()
    # tracked-point dots must appear (not all background)
    assert (img_map != render.BG).any(axis=-1).sum() > 100

    # checkpoint round trip
    sys.save_map(tmp_path / "map.npz")
    from lldslam_tpu.config import SlamConfig
    sys2 = System(cfg)
    sys2.load_map(tmp_path / "map.npz")
    assert sys2.map.n_kf == sys.map.n_kf
    assert sys2.map.n_pt == sys.map.n_pt
    np.testing.assert_array_equal(sys2.map.kf_pose[:sys.map.n_kf],
                                  sys.map.kf_pose[:sys.map.n_kf])
    np.testing.assert_array_equal(sys2.map.pt_pos[:sys.map.n_pt],
                                  sys.map.pt_pos[:sys.map.n_pt])
