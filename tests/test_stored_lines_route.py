"""ldType routing: `LBDFloat` + lineDetectionsPath must load stored lines
(the reference's benchmark configuration, stereo_kitti.cc:61-85), while
`empty` disables lines; mdThr maps onto the active descriptor gate."""
import numpy as np
import pytest

from lldslam_tpu.config import (CameraConfig, LineConfig, SlamConfig,
                                TrackingConfig)
from lldslam_tpu.io.stored_lines import save_frame_lines
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.pipeline.tracker import StereoTracker


def _cfg(line):
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=120.0, bf=200.0,
                       fps=10.0, width=640, height=240)
    return SlamConfig(camera=cam, orb=OrbConfig(n_features=400),
                      tracking=TrackingConfig(min_init_points=10000),
                      line=line)


def test_stored_route_selected(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    for cam_dir in ("left", "right"):
        for f in range(2):
            n = 6
            p1 = rng.uniform(50, 200, (n, 2))
            p2 = p1 + rng.uniform(30, 60, (n, 2))
            save_frame_lines(tmp_path / cam_dir, f, p1, p2,
                             np.zeros(n, np.int32),
                             rng.normal(0, 1, (n, 40)))
    cfg = _cfg(LineConfig(ld_type="LBDFloat", md_thr=1.5,
                          detections_path=str(tmp_path)))
    tr = StereoTracker(cfg, enable_loops=False)
    assert tr._line_source is not None
    assert tr._md_gate == 1.5  # raw mdThr on the stored-LBD scale

    # the native detector must never run on this route
    import lldslam_tpu.frontend.line_extract as le
    def boom(*a, **k):
        raise AssertionError("native detector called on stored-line route")
    monkeypatch.setattr(le, "detect_lines", boom)
    img = rng.uniform(0, 255, (240, 640)).astype(np.float32)
    tr.process(img, img, timestamp=0.0)  # init gated off; lines still load
    assert tr._cur_fl is not None
    # loaded left endpoints round-trip through the frame-line pipeline
    z = np.load(tmp_path / "left" / "000000.npz")
    got_p1 = np.asarray(tr._cur_fl.kl.p1)[np.asarray(tr._cur_fl.kl.valid)]
    assert len(got_p1) >= 1
    assert np.isin(np.round(got_p1[:, 0], 3),
                   np.round(z["p1"][:, 0], 3)).all()


def test_native_route_maps_mdthr():
    cfg = _cfg(LineConfig(ld_type="LBDFloat", md_thr=4.0))  # no path -> native
    tr = StereoTracker(cfg, enable_loops=False)
    assert tr._line_source is None
    # native gate scales proportionally from the LBDMOD default 2.0
    assert tr._md_gate == pytest.approx(tr.line_cfg.desc_thr * 2.0)


def test_empty_disables_lines():
    cfg = _cfg(LineConfig(ld_type="empty"))
    tr = StereoTracker(cfg, enable_loops=False)
    assert not tr.enable_lines


def test_truncation_logged(tmp_path):
    """Capacity overflow must be LOGGED (no silent caps) and keep the
    LONGEST lines (the reference's stored-LBD files carry hundreds of
    lines/frame, KITTI04-12_LBD.yaml:73-77)."""
    from lldslam_tpu.io.stored_lines import StoredLineSource
    rng = np.random.default_rng(3)
    n = 300
    p1 = rng.uniform(10, 600, (n, 2)).astype(np.float32)
    # lengths strictly increasing with index so the kept set is known
    p2 = p1 + np.stack([5.0 + np.arange(n), np.zeros(n)], -1)
    save_frame_lines(tmp_path, 0, p1, p2, np.zeros(n, np.int32),
                     rng.normal(0, 1, (n, 40)))
    src = StoredLineSource(tmp_path, cap=256, desc_dim=40)
    q1, q2, octv, length, desc, valid = src._frame_np(0)
    assert valid.sum() == 256
    assert src.cap_events == 1 and src.cap_dropped == 44
    # the 44 SHORTEST lines (lowest indices) were dropped
    assert length.min() >= 5.0 + 44 - 1e-3


@pytest.mark.slow
def test_reference_scale_density_floor():
    """At the reference's stored-LBD workload scale (hundreds of lines per
    frame) the tracker must sustain a real association density: median
    line matches/frame >= 10 (the old floor allowed a run with median 0)."""
    import sys
    sys.path.insert(0, ".")
    from bench import _make_sequence, _gen_stored_lines_ref_scale
    import tempfile
    from lldslam_tpu.system import System

    cam_cfg = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=120.0, bf=200.0,
                           fps=10.0, width=640, height=240)
    cam = cam_cfg.stereo_camera()
    n_frames = 14
    frames, poses, world = _make_sequence(cam, n_frames, seed=4,
                                          with_lines=True, return_poses=True)
    tmp = tempfile.mkdtemp(prefix="lines_density_")
    left, right = f"{tmp}/left", f"{tmp}/right"
    _gen_stored_lines_ref_scale(cam, poses, world, left, right, dz=1.1)
    cfg = SlamConfig(
        camera=cam_cfg, orb=OrbConfig(n_features=600),
        line=LineConfig(ld_type="LBDFloat", md_thr=0.6,
                        detections_path=left, descriptors_path=right),
        tracking=TrackingConfig(min_init_points=60))
    sysm = System(cfg, enable_loops=False, pipeline=True)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, timestamp=i * 0.1)
    sysm.flush()
    n_line = [m.n_line_matches for m in sysm.tracker.metrics]
    assert sysm.tracker.state.name == "OK"
    assert np.median(n_line) >= 10, n_line
    assert sysm.map.n_ln >= 50
