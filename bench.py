"""Headline benchmark: stereo tracking throughput at the KITTI workload.

Runs the full deterministic pipeline (System.track_stereo: ORB extraction,
stereo matching, projection association, pose optimization, keyframe +
local-BA at KF rate) on a synthetic KITTI-sized sequence (1241x376, 2000
features, 8 levels — the reference workload, KITTI04-12_LBD.yaml:38-51) and
reports frames/second on the available device.

Baseline: the reference's real-time budget on an i7 CPU is 10 fps at this
workload (BASELINE.md: KITTI pacing, stereo_kitti.cc:116-124).
`vs_baseline` = measured fps / 10; the BASELINE.json target is >= 3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _make_sequence(cam, n_frames: int, n_pts: int = 1200, seed: int = 0):
    """Synthetic forward-motion stereo sequence with stable textures."""
    import jax.numpy as jnp
    from lldslam_tpu.geometry import se3

    rng = np.random.default_rng(seed)
    W, H = cam.width, cam.height
    PS = 41
    # points spread along the whole travel corridor (camera advances ~1 m per
    # frame): fresh structure keeps entering the frustum, giving the natural
    # KITTI-like keyframe cadence (~1 KF per 4-8 frames) instead of a KF
    # every other frame as the initial structure dies off
    depth_far = 120.0 + 1.05 * n_frames
    n_pts = int(n_pts * depth_far / 120.0)
    pts = np.stack([
        rng.uniform(-40.0, 40.0, n_pts),
        rng.uniform(-4.0, 10.0, n_pts),
        rng.uniform(5.0, depth_far, n_pts),
    ], -1).astype(np.float32)
    patches = rng.uniform(0, 120, (n_pts, PS, PS)).astype(np.float32)
    patches[:, PS // 2 - 2:PS // 2 + 3, PS // 2 - 2:PS // 2 + 3] = 40.0
    bright = rng.uniform(180, 250, n_pts)
    patches[:, PS // 2 - 1:PS // 2 + 2, PS // 2 - 1:PS // 2 + 2] = bright[:, None, None]

    h = PS // 2
    frames = []
    T = np.eye(4, dtype=np.float32)
    xi = np.array([0.0, 0.0, -1.0, 0.0, 0.003, 0.0], np.float32)  # ~10 m/s fwd @10fps, slow yaw
    for _ in range(n_frames):
        imL = np.full((H, W), 15.0, np.float32)
        imR = np.full((H, W), 15.0, np.float32)
        Xc = (T[:3, :3] @ pts.T).T + T[:3, 3]
        u = cam.fx * Xc[:, 0] / np.maximum(Xc[:, 2], 1e-6) + cam.cx
        v = cam.fy * Xc[:, 1] / np.maximum(Xc[:, 2], 1e-6) + cam.cy
        ur = u - cam.bf / np.maximum(Xc[:, 2], 1e-6)
        order = np.argsort(-Xc[:, 2])
        for i in order:
            if Xc[i, 2] > 0.5 and h < u[i] < W - h and h < v[i] < H - h \
                    and h < ur[i] < W - h:
                iu, iv, iur = int(u[i]), int(v[i]), int(ur[i])
                imL[iv - h:iv + h + 1, iu - h:iu + h + 1] = patches[i]
                imR[iv - h:iv + h + 1, iur - h:iur + h + 1] = patches[i]
        frames.append((imL, imR))
        T = np.asarray(se3.exp(jnp.asarray(xi))) @ T
    return frames


def main():
    from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from lldslam_tpu.ops.orb import OrbConfig
    from lldslam_tpu.system import System

    cam_cfg = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                           bf=386.1448, fps=10.0, width=1241, height=376)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=2000),
                     tracking=TrackingConfig(min_init_points=100))
    sys = System(cfg, pipeline=True)

    n_warm, n_meas = 4, 30
    _log("bench: generating sequence...")
    frames = _make_sequence(cam_cfg.stereo_camera(), n_warm + n_meas,
                            n_pts=4000)
    _log("bench: pre-compiling loop-closure programs...")
    sys.warmup()
    _log("bench: warmup (first-compile)...")
    for i in range(n_warm):
        t = time.perf_counter()
        sys.track_stereo(*frames[i], timestamp=i * 0.1)
        _log(f"bench: warm frame {i}: {time.perf_counter() - t:.1f}s")
    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_meas):
        sys.track_stereo(*frames[i], timestamp=i * 0.1)
    sys.flush()
    dt = time.perf_counter() - t0
    _log(f"bench: {n_meas} frames in {dt:.2f}s")
    ms = sys.tracker.metrics[n_warm:]
    _log("bench: avg dispatch {:.1f}ms get {:.1f}ms".format(
        1e3 * np.mean([x.t_dispatch for x in ms]),
        1e3 * np.mean([x.t_get for x in ms])))
    _log("bench: avg build {:.1f}ms step {:.1f}ms kf {:.1f}ms ({} KFs)".format(
        1e3 * np.mean([x.t_build for x in ms]),
        1e3 * np.mean([x.t_step for x in ms]),
        1e3 * np.sum([x.t_kf for x in ms]) / max(1, sum(x.new_kf for x in ms)),
        sum(x.new_kf for x in ms)))
    if sys.tracker.kf_timings:
        kt = sys.tracker.kf_timings
        _log("bench: kf breakdown avg mapper {:.0f}ms loop {:.0f}ms view {:.0f}ms".format(
            1e3 * np.mean([x["mapper"] for x in kt]),
            1e3 * np.mean([x["loop"] for x in kt]),
            1e3 * np.mean([x["view"] for x in kt])))
        ms_ = sys.tracker.mapper.stage_times
        if ms_.get("n"):
            _log("bench: mapper stages avg " + " ".join(
                f"{k}={1e3*v/ms_['n']:.0f}ms" for k, v in ms_.items()
                if k != "n"))
        if sys.tracker.loop_closer is not None:
            lc = sys.tracker.loop_closer
            ls = lc.stage_times
            if ls.get("n"):
                _log("bench: loop stages avg " + " ".join(
                    f"{k}={1e3*v/ls['n']:.0f}ms" for k, v in ls.items()
                    if k != "n"))
            if lc.events:
                _log("bench: LOOP EVENTS (should be none on this corridor): "
                     + ", ".join(f"{e.query_kf}<->{e.matched_kf}"
                                 f"({e.n_inliers})" for e in lc.events))
    fps = n_meas / dt
    print(json.dumps({
        "metric": "kitti_stereo_tracking_throughput",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
