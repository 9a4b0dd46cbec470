"""Headline-only bench: points staged throughput with a readback-window
sweep and repeats. Mirrors bench.py's headline section exactly (same world,
same workload) but runs ONLY that part so W sweeps and repeat runs fit in
minutes instead of the full suite's quarter hour.

Usage: python tools/bench_headline.py [--w 4 8 16] [--reps 2] [--frames 40]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _log(m):
    print(m, file=sys.stderr, flush=True)


def run_once(cfg, frames, n_warm, n_meas, w, ba_interval=1, loops=True):
    import jax
    from lldslam_tpu.system import System
    from bench import _report, _snap_times

    import os
    sys_ = System(cfg, pipeline=True, enable_loops=loops)
    sys_.tracker.readback_window = w
    sys_.tracker.mapper.ba_interval = ba_interval
    if os.environ.get("LLD_MAX_INFLIGHT"):
        sys_.tracker.max_inflight_windows = int(
            os.environ["LLD_MAX_INFLIGHT"])
    sys_.warmup()
    for i in range(n_warm):
        sys_.track_stereo(*frames[i], timestamp=i * 0.1)
    staged = [sys_.tracker.stage_pair(l, r)
              for l, r in frames[n_warm:n_warm + n_meas]]
    jax.block_until_ready(staged[-1])
    m0 = len(sys_.tracker.metrics)
    kt0 = len(sys_.tracker.kf_timings)
    t_snap = _snap_times(sys_)
    import gc
    gc.collect()
    gc.disable()
    t0 = time.perf_counter()
    walls = []
    for i, h in enumerate(staged):
        tf = time.perf_counter()
        sys_.track_stereo(None, None, timestamp=(n_warm + i) * 0.1,
                          pair_dev=h)
        walls.append(time.perf_counter() - tf)
    tf = time.perf_counter()
    sys_.flush()
    walls.append(time.perf_counter() - tf)
    gc.enable()
    _log("   per-call ms: " + " ".join(f"{1e3 * w:.0f}" for w in walls))
    dt = time.perf_counter() - t0
    fps = n_meas / dt
    _log(f"== W={w}: {n_meas} frames in {dt:.2f}s -> {fps:.2f} fps ==")
    ms = sys_.tracker.metrics[m0:]
    wins = [m for m in ms if m.t_fetch_lat > 0]
    if wins:
        _log("   fetch windows: " + " ".join(
            f"lat={1e3 * m.t_fetch_lat:.0f}/lead={1e3 * m.t_fetch_lead:.0f}"
            f"/wait={1e3 * m.t_get:.0f}" for m in wins))
    _report(sys_, ms, f"W{w}", kt0=kt0, t_snap=t_snap)
    return fps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, nargs="+", default=[4])
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--ba-interval", type=int, default=1)
    ap.add_argument("--no-loops", action="store_true")
    args = ap.parse_args()

    from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from lldslam_tpu.ops.orb import OrbConfig
    from bench import _make_sequence

    cam_cfg = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                           bf=386.1448, fps=10.0, width=1241, height=376)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=2000),
                     tracking=TrackingConfig(min_init_points=100))
    n_warm, n_meas = 6, args.frames
    _log("gen sequence...")
    frames = _make_sequence(cam_cfg.stereo_camera(), n_warm + n_meas)
    results = {}
    for w in args.w:
        vals = [run_once(cfg, frames, n_warm, n_meas, w,
                         ba_interval=args.ba_interval,
                         loops=not args.no_loops)
                for _ in range(args.reps)]
        results[w] = vals
        _log(f"W={w}: {['%.2f' % v for v in vals]} median "
             f"{np.median(vals):.2f}")
    _log("SUMMARY " + " ".join(
        f"W={w}:{np.median(v):.2f}" for w, v in results.items()))


if __name__ == "__main__":
    main()
