"""Diagnostic: stage-by-stage survivor counts of local-map projection
association on the bench world (why is tracked_close small?).

Replays search_by_projection's gates with host numpy on the tracker's own
view/frame state after a few frames, printing how many (close) map points
survive each gate. One-off probe for the KF-cadence investigation.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("LLDSLAM_FORCE_CPU", "1"):
    os.environ.setdefault("LLDSLAM_NO_COMPILE_CACHE", "1")
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from bench import _make_sequence
from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.ops import hamming
from lldslam_tpu.system import System


def main():
    cam_cfg = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                           bf=386.1448, fps=10.0, width=1241, height=376)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=2000),
                     tracking=TrackingConfig(min_init_points=100))
    sysm = System(cfg, enable_loops=False)
    n = 8
    frames = _make_sequence(cam_cfg.stereo_camera(), n + 1)
    for i in range(n):
        sysm.track_stereo(*frames[i], timestamp=i * 0.1)
        m = sysm.tracker.metrics[-1]
        print(f"fid={i} state={m.state} n_in={m.n_inliers} "
              f"n_mm={m.n_motion_matches}", file=sys.stderr)

    tr = sysm.tracker
    cam = tr.cam
    fd = tr._build_frame(*frames[n]) if hasattr(tr, "_build_frame") else None
    # use last frame's features as "current" (appearance one frame apart)
    feats = tr._last_feats
    view = tr._view
    T = tr.T_cw
    pos = np.asarray(view.pos)
    valid = np.asarray(view.valid)
    mind = np.asarray(view.min_dist)
    maxd = np.asarray(view.max_dist)
    normal = np.asarray(view.normal)
    fxy = np.asarray(feats.xy)
    foct = np.asarray(feats.octave)
    fvalid = np.asarray(feats.valid)
    fur = np.asarray(feats.ur) if hasattr(feats, "ur") else None
    print(f"view points: {valid.sum()} / {len(valid)}", file=sys.stderr)

    R, t = T[:3, :3], T[:3, 3]
    Xc = pos @ R.T + t
    z = Xc[:, 2]
    u = cam.fx * Xc[:, 0] / np.maximum(z, 1e-6) + cam.cx
    v = cam.fy * Xc[:, 1] / np.maximum(z, 1e-6) + cam.cy
    C = -R.T @ t
    PO = pos - C
    dist = np.linalg.norm(PO, axis=-1)
    viewcos = (PO * normal).sum(-1) / np.maximum(dist, 1e-6)

    g_valid = valid
    g_z = g_valid & (z > 0)
    g_img = g_z & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
    g_dist = g_img & (dist >= mind) & (dist <= maxd)
    g_cos = g_dist & (viewcos > 0.5)
    close = z < float(cfg.close_depth)
    for name, g in [("valid", g_valid), ("z>0", g_z), ("in-img", g_img),
                    ("dist-range", g_dist), ("viewcos", g_cos)]:
        print(f"{name:>10}: {g.sum():5d}  (close: {(g & close).sum():5d})",
              file=sys.stderr)
    # below/above dist range split for in-img close points
    lo = g_img & close & (dist < mind)
    hi = g_img & close & (dist > maxd)
    print(f"close in-img but dist<min: {lo.sum()}  dist>max: {hi.sum()}",
          file=sys.stderr)

    # octave window + radius + hamming for survivors
    scales = 1.2 ** np.arange(8)
    log_s = np.log(1.2)
    pred = np.ceil(np.log(np.maximum((maxd / 1.2) / np.maximum(dist, 1e-6),
                                     1e-6)) / log_s).astype(int)
    pred = np.clip(pred, 0, 7)
    r = np.where(viewcos > 0.998, 2.5, 4.0) * scales[pred]
    du = np.abs(u[:, None] - fxy[None, :, 0])
    dv = np.abs(v[:, None] - fxy[None, :, 1])
    win = (du <= r[:, None]) & (dv <= r[:, None])
    octw = (foct[None, :] >= pred[:, None] - 1) & (foct[None, :] <= pred[:, None])
    fv = fvalid[None, :]
    any_win = (win & fv).any(1)
    any_oct = (win & octw & fv).any(1)
    g = g_cos
    print(f"  +radius window: {(g & any_win).sum():5d} "
          f"(close {(g & any_win & close).sum():5d})", file=sys.stderr)
    print(f"  +octave window: {(g & any_oct).sum():5d} "
          f"(close {(g & any_oct & close).sum():5d})", file=sys.stderr)
    # hamming over the candidates
    pd = np.asarray(view.desc)
    fdsc = np.asarray(feats.desc)
    dm = np.asarray(hamming.distance_matrix(pd, fdsc))
    cand = win & octw & fv & g[:, None]
    dmm = np.where(cand, dm, 10_000)
    best = dmm.min(1)
    okh = best <= hamming.TH_HIGH
    print(f"  +hamming<=TH_HIGH: {(g & any_oct & okh).sum():5d} "
          f"(close {(g & any_oct & okh & close).sum():5d})", file=sys.stderr)
    # octave stats: predicted vs detected at the matched keypoint
    bkp = dmm.argmin(1)
    sel = g & any_win & close
    if sel.sum():
        det = foct[bkp[sel]]
        print(f"close predicted-octave hist: "
              f"{np.bincount(pred[sel], minlength=8)}", file=sys.stderr)
        print(f"close detected-octave hist (best-in-window): "
              f"{np.bincount(det, minlength=8)}", file=sys.stderr)


if __name__ == "__main__":
    main()
