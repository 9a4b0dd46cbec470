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
