"""End-to-end pipeline regression on a rendered synthetic sequence.

The SURVEY.md §4 test strategy: a short synthetic stereo sequence (textured
3D points, known camera trajectory) through the full deterministic pipeline
(System.track_stereo), asserting near-zero ATE. This is the rebuild's
replacement for the reference's run-a-KITTI-sequence-and-eyeball evaluation.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
from lldslam_tpu.geometry import se3
from lldslam_tpu.io.trajectory import ate_rmse
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.system import System

W, H = 512, 384
PS = 41


def _make_world(rng, n=500, depth_lo=4.0, depth_hi=40.0, spread=30.0):
    """Random textured 3D points in a corridor along +z."""
    pts = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-6.0, 6.0, n),
        rng.uniform(depth_lo, depth_hi + 20.0, n),
    ], -1).astype(np.float32)
    patches = rng.uniform(0, 120, (n, PS, PS)).astype(np.float32)
    patches[:, PS // 2 - 2:PS // 2 + 3, PS // 2 - 2:PS // 2 + 3] = 40.0
    bright = rng.uniform(180, 250, n)
    patches[:, PS // 2 - 1:PS // 2 + 2, PS // 2 - 1:PS // 2 + 2] = bright[:, None, None]
    return pts, patches


def _stamp(im, patch, uc, vc):
    """Bilinear subpixel stamp of `patch` centered at float (uc, vc)."""
    h = PS // 2
    iu, iv = int(np.floor(uc)), int(np.floor(vc))
    dx, dy = uc - iu, vc - iv
    pp = np.pad(patch, 1, mode="edge")
    shifted = ((1 - dy) * (1 - dx) * pp[1:-1, 1:-1]
               + (1 - dy) * dx * pp[1:-1, :-2]
               + dy * (1 - dx) * pp[:-2, 1:-1]
               + dy * dx * pp[:-2, :-2])
    im[iv - h:iv + h + 1, iu - h:iu + h + 1] = shifted


def _render(cam, T_cw, pts, patches):
    imL = np.full((H, W), 15.0, np.float32)
    imR = np.full((H, W), 15.0, np.float32)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    Xc = (R @ pts.T).T + t
    front = Xc[:, 2] > 0.5
    u = cam.fx * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + cam.cx
    v = cam.fy * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + cam.cy
    ur = u - cam.bf / np.maximum(Xc[:, 2], 1e-6)
    h = PS // 2
    order = np.argsort(-Xc[:, 2])  # far first: near patches overwrite
    for i in order:
        if not front[i]:
            continue
        if h + 1 < u[i] < W - h - 1 and h + 1 < v[i] < H - h - 1 \
                and h + 1 < ur[i] < W - h - 1:
            _stamp(imL, patches[i], u[i], v[i])
            _stamp(imR, patches[i], ur[i], v[i])
    return imL, imR


def _config():
    cam = CameraConfig(fx=400.0, fy=400.0, cx=W / 2, cy=H / 2, bf=200.0,
                       fps=10.0, width=W, height=H)
    return SlamConfig(
        camera=cam,
        orb=OrbConfig(n_features=600),
        tracking=TrackingConfig(min_init_points=100),
    )


@pytest.mark.slow
def test_synthetic_sequence_ate():
    rng = np.random.default_rng(7)
    pts, patches = _make_world(rng)
    cfg = _config()
    cam = cfg.camera.stereo_camera()
    sys = System(cfg)
    sys.tracker.local_pt_cap = 2048
    sys.tracker.mapper.p_cap = 2048
    sys.tracker.mapper.o_cap = 6144

    # forward motion with a slow yaw: 0.25 m/frame, 0.004 rad/frame
    n_frames = 20
    gt = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        gt.append(T.copy())
        xi = np.array([0.0, 0.0, -0.25, 0.0, 0.004, 0.0], np.float32)
        T = np.asarray(se3.exp(jnp.asarray(xi)) @ jnp.asarray(T))

    est = []
    for i in range(n_frames):
        imL, imR = _render(cam, gt[i], pts, patches)
        T_cw, m = sys.track_stereo(imL, imR, timestamp=i * 0.1)
        est.append(T_cw)
        assert m.state != "LOST", f"lost at frame {i}: {m}"

    ts, T_wc = sys.tracker.trajectory()
    assert len(T_wc) == n_frames
    gt_wc = np.stack([np.linalg.inv(g) for g in gt])
    ate = ate_rmse(T_wc, gt_wc, align=False)
    # translation over the sequence is ~5 m; demand cm-level consistency
    assert ate < 0.10, f"ATE {ate:.3f} m too large"
    assert sys.map.n_kf >= 2  # forward motion must trigger keyframes
