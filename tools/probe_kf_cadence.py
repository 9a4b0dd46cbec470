"""Probe: which NeedNewKeyFrame condition fires on the bench sequence."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LLDSLAM_FORCE_CPU"):
    # sitecustomize ignores JAX_PLATFORMS in this environment
    os.environ.setdefault("LLDSLAM_NO_COMPILE_CACHE", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from bench import _make_sequence
from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.system import System


def main():
    cam_cfg = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                           bf=386.1448, fps=10.0, width=1241, height=376)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=2000),
                     tracking=TrackingConfig(min_init_points=100))
    print("close_depth:", cfg.close_depth, file=sys.stderr)
    sysm = System(cfg, pipeline=True)
    frames = _make_sequence(cam_cfg.stereo_camera(), 24)

    tr = sysm.tracker
    orig = tr._need_new_kf

    def probe(n_in, tracked_close, untracked_close, fid=None):
        r = orig(n_in, tracked_close, untracked_close, fid=fid)
        rm = tr._ref_matches
        print(f"fid={fid} n_in={n_in} ref={rm} weak={n_in < 0.75 * rm}"
              f" tc={tracked_close} utc={untracked_close}"
              f" need_close={tracked_close < 100 and untracked_close > 70}"
              f" -> KF={r}", file=sys.stderr)
        return r

    tr._need_new_kf = probe
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, timestamp=i * 0.1)
    sysm.flush()


if __name__ == "__main__":
    main()
