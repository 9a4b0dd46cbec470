"""End-to-end point+line tracking (ldType native): the full pipeline with
the line frontend, temporal line association, joint point/line pose
optimization, and map-line creation/culling."""
import numpy as np
import jax.numpy as jnp
import pytest

from test_pipeline import _make_world, _stamp, PS, W, H
from test_lines_frontend import _draw_segment
from lldslam_tpu.config import (CameraConfig, LineConfig, SlamConfig,
                                TrackingConfig)
from lldslam_tpu.geometry import se3
from lldslam_tpu.io.trajectory import ate_rmse
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.system import System


def _segs3d(rng, n=10):
    segs = []
    for i in range(n):
        mid = np.array([rng.uniform(-8, 8), rng.uniform(-3, 3),
                        rng.uniform(6, 25)])
        d = rng.normal(size=3)
        d[1] *= 2.0  # bias away from horizontal (stereo-degenerate) lines
        d /= np.linalg.norm(d)
        half = rng.uniform(1.5, 3.0)
        segs.append((mid - half * d, mid + half * d))
    return segs


def _render(cam, T_cw, pts, patches, segs):
    imL = np.full((H, W), 15.0, np.float32)
    imR = np.full((H, W), 15.0, np.float32)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    styles = [(2, 90.0, 250.0), (2, 250.0, 120.0), (3, 160.0, 160.0),
              (2, 95.0, 160.0), (1, 230.0, 230.0), (3, 120.0, 255.0),
              (2, 200.0, 90.0), (1, 150.0, 95.0), (2, 180.0, 240.0),
              (3, 100.0, 210.0)]

    def draw_view(img, shift_x):
        for i, (A, B) in enumerate(segs):
            Ac = R @ A + t + np.array([shift_x, 0, 0])
            Bc = R @ B + t + np.array([shift_x, 0, 0])
            if Ac[2] < 0.5 or Bc[2] < 0.5:
                continue
            a = np.array([cam.fx * Ac[0] / Ac[2] + cam.cx,
                          cam.fy * Ac[1] / Ac[2] + cam.cy])
            b = np.array([cam.fx * Bc[0] / Bc[2] + cam.cx,
                          cam.fy * Bc[1] / Bc[2] + cam.cy])
            w, v1, v2 = styles[i % len(styles)]
            _draw_segment(img, a, b, width=w, value=v1, value2=v2)

    # point texture first; segments drawn on top so they stay contiguous
    Xc = (R @ pts.T).T + t
    front = Xc[:, 2] > 0.5
    u = cam.fx * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + cam.cx
    v = cam.fy * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + cam.cy
    ur = u - cam.bf / np.maximum(Xc[:, 2], 1e-6)
    h = PS // 2
    order = np.argsort(-Xc[:, 2])
    for i in order:
        if not front[i]:
            continue
        if h + 1 < u[i] < W - h - 1 and h + 1 < v[i] < H - h - 1 \
                and h + 1 < ur[i] < W - h - 1:
            _stamp(imL, patches[i], u[i], v[i])
            _stamp(imR, patches[i], ur[i], v[i])
    draw_view(imL, 0.0)
    draw_view(imR, -cam.baseline)
    return imL, imR


@pytest.mark.slow
def test_point_line_pipeline():
    rng = np.random.default_rng(21)
    pts, patches = _make_world(rng, n=300)
    segs = _segs3d(rng)
    cam_cfg = CameraConfig(fx=400.0, fy=400.0, cx=W / 2, cy=H / 2, bf=200.0,
                           fps=10.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam_cfg,
        orb=OrbConfig(n_features=600),
        line=LineConfig(ld_type="native"),
        tracking=TrackingConfig(min_init_points=80),
    )
    cam = cam_cfg.stereo_camera()
    sys = System(cfg)
    sys.tracker.local_pt_cap = 2048
    sys.tracker.mapper.p_cap = 2048
    sys.tracker.mapper.o_cap = 6144

    n_frames = 16
    gt = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        gt.append(T.copy())
        xi = np.array([0.0, 0.0, -0.25, 0.0, 0.004, 0.0], np.float32)
        T = np.asarray(se3.exp(jnp.asarray(xi)) @ jnp.asarray(T))

    line_matches = []
    for i in range(n_frames):
        imL, imR = _render(cam, gt[i], pts, patches, segs)
        _, m = sys.track_stereo(imL, imR, timestamp=i * 0.1)
        assert m.state != "LOST", f"lost at frame {i}"
        line_matches.append(m.n_line_matches)

    assert sys.map.n_ln > 0, "no map lines created"
    assert sum(line_matches) >= 5, f"line association too rare: {line_matches}"
    ts, T_wc = sys.tracker.trajectory()
    gt_wc = np.stack([np.linalg.inv(g) for g in gt])
    ate = ate_rmse(T_wc, gt_wc, align=False)
    assert ate < 0.12, f"ATE {ate:.3f} m with lines enabled"


@pytest.mark.slow
def test_point_line_pipeline_pipelined():
    """Lines run inside the pipelined (lag-N) tracker: the line association
    + joint pose refinement is chained into the per-frame device program
    (_track_step_chained_lines), and the joint point+line local BA runs on
    the staged packed path."""
    rng = np.random.default_rng(21)
    pts, patches = _make_world(rng, n=300)
    segs = _segs3d(rng)
    cam_cfg = CameraConfig(fx=400.0, fy=400.0, cx=W / 2, cy=H / 2, bf=200.0,
                           fps=10.0, width=W, height=H)
    cfg = SlamConfig(
        camera=cam_cfg,
        orb=OrbConfig(n_features=600),
        line=LineConfig(ld_type="native"),
        tracking=TrackingConfig(min_init_points=80),
    )
    cam = cam_cfg.stereo_camera()
    n_frames = 14
    gt = []
    T = np.eye(4, dtype=np.float32)
    xi = np.array([0.0, 0.0, -0.25, 0.0, 0.004, 0.0], np.float32)
    dT = np.asarray(se3.exp(jnp.asarray(xi)))
    for i in range(n_frames):
        gt.append(T.copy())
        T = dT @ T
    frames = [_render(cam, gt[i], pts, patches, segs)
              for i in range(n_frames)]

    sync = System(cfg, enable_loops=False)
    for i, (l, r) in enumerate(frames):
        sync.track_stereo(l, r, timestamp=i * 0.1)
    _, T_s = sync.tracker.trajectory()

    pipe = System(cfg, enable_loops=False, pipeline=True)
    for i, (l, r) in enumerate(frames):
        Tp, _ = pipe.track_stereo(l, r, timestamp=i * 0.1)
        assert np.isfinite(Tp).all()
    pipe.flush()
    _, T_p = pipe.tracker.trajectory()

    assert len(pipe.tracker.metrics) == n_frames
    assert pipe.tracker.state.name == "OK"
    assert pipe.map.n_ln > 0, "no map lines created in pipelined mode"
    n_line = [m.n_line_matches for m in pipe.tracker.metrics]
    assert sum(n_line) >= 5, f"line association too rare: {n_line}"
    dp = np.linalg.norm(T_p[:, :3, 3] - T_s[:, :3, 3], axis=-1)
    assert dp.max() < 0.25, dp.max()
