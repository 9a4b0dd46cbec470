"""Probe: per-frame on-device KF-decision inputs on the bench corridor
(pipelined path). Prints n_in / close counts / fired flag per frame plus the
host-side ref_matches and kappa at each keyframe, to diagnose cadence
divergence between the device decision (_kf_decision) and the synchronous
host schedule (_need_new_kf)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LLDSLAM_FORCE_CPU"):
    os.environ.setdefault("LLDSLAM_NO_COMPILE_CACHE", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from bench import _make_sequence
from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.system import System


def main():
    n = int(os.environ.get("PROBE_FRAMES", "30"))
    cam_cfg = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                           bf=386.1448, fps=10.0, width=1241, height=376)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=2000),
                     tracking=TrackingConfig(min_init_points=100))
    sysm = System(cfg, pipeline=os.environ.get("PROBE_SYNC") != "1")
    frames = _make_sequence(cam_cfg.stereo_camera(), n)
    tr = sysm.tracker
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, timestamp=i * 0.1)
    sysm.flush()
    for m in tr.metrics:
        rm = tr._ref_matches
        print(f"fid={m.frame_id} st={m.state} n_in={m.n_inliers}"
              f" tc={m.n_tracked_close} utc={m.n_untracked_close}"
              f" kf={int(m.new_kf)}", file=sys.stderr)
    print("KFs:", [m.frame_id for m in tr.metrics if m.new_kf],
          file=sys.stderr)
    print("ref_matches:", tr._ref_matches, "kappa:", tr._kappa,
          file=sys.stderr)


if __name__ == "__main__":
    main()
