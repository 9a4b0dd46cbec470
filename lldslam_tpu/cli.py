"""Sequence drivers — the stereo_kitti / stereo_euroc CLI equivalents.

Replaces Examples/Stereo/stereo_kitti.cc and stereo_euroc.cc: load a
sequence, feed frames through the System, report timing statistics
(median/mean tracking seconds, stereo_kitti.cc:130-139), and write the
trajectory (CameraTrajectory.txt, :142).

    python -m lldslam_tpu.cli kitti  <settings.yaml> <sequence_dir> [out]
    python -m lldslam_tpu.cli euroc  <settings.yaml> <sequence_dir> <times>
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_sequence(system, seq, realtime: bool = False, limit: int | None = None,
                 log=print):
    times = []
    n = len(seq) if limit is None else min(limit, len(seq))
    for i in range(n):
        img_l, img_r, ts = seq.frame(i)
        t0 = time.perf_counter()
        _, m = system.track_stereo(img_l, img_r, ts)
        dt = time.perf_counter() - t0
        times.append(dt)
        if i % 50 == 0:
            log(f"frame {i}/{n}: {m.state} inliers={m.n_inliers} "
                f"kfs={m.n_kfs} pts={m.n_points} {dt*1e3:.0f}ms")
        if realtime and i + 1 < n:
            wait = float(seq.timestamps[i + 1] - ts) - dt
            if wait > 0:
                time.sleep(wait)
    t = np.sort(np.array(times))
    log(f"median tracking time: {np.median(t):.4f}s")
    log(f"mean tracking time:   {t.mean():.4f}s")
    return times


def main(argv=None):
    from .io import datasets
    from .system import System

    p = argparse.ArgumentParser(prog="lldslam_tpu")
    p.add_argument("dataset", choices=["kitti", "euroc"])
    p.add_argument("settings", help="reference-format YAML settings file")
    p.add_argument("sequence", help="sequence directory")
    p.add_argument("times", nargs="?", help="EuRoC timestamp file")
    p.add_argument("--out", default="CameraTrajectory.txt")
    p.add_argument("--format", choices=["kitti", "tum"], default=None)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--realtime", action="store_true")
    p.add_argument("--save-map", default=None)
    p.add_argument("--metrics", default=None, help="JSONL per-frame metrics")
    args = p.parse_args(argv)

    if args.dataset == "kitti":
        seq = datasets.prefetch(datasets.load_kitti(args.sequence))
        fmt = args.format or "kitti"
        seq_name = args.sequence.rstrip("/").split("/")[-1]
    else:
        if not args.times:
            p.error("euroc requires a timestamp file")
        seq = datasets.load_euroc(args.sequence, args.times)
        fmt = args.format or "tum"
        seq_name = None
        # EuRoC raw images need undistort+rectify (stereo_euroc.cc:101-151)
        from .config import parse_opencv_yaml
        d = parse_opencv_yaml(args.settings)
        if "LEFT.K" in d:
            from .ops.rectify import StereoRectifier
            rect = StereoRectifier(d)

            class _RectSeq:
                def __init__(self, inner):
                    self.inner = inner
                    self.timestamps = inner.timestamps

                def __len__(self):
                    return len(self.inner)

                def frame(self, i):
                    il, ir, ts = self.inner.frame(i)
                    jl, jr = rect(il, ir)
                    return (np.asarray(jl).astype(np.uint8),
                            np.asarray(jr).astype(np.uint8), ts)

            seq = _RectSeq(seq)

    system = System(args.settings, sequence=seq_name)
    run_sequence(system, seq, realtime=args.realtime, limit=args.limit)

    if fmt == "kitti":
        system.save_trajectory_kitti(args.out)
    else:
        system.save_trajectory_tum(args.out)
    print(f"trajectory saved to {args.out}")
    if args.save_map:
        from .io.checkpoint import save_map
        save_map(system.map, args.save_map)
        print(f"map saved to {args.save_map}")
    if args.metrics:
        with open(args.metrics, "w") as f:
            for m in system.tracker.metrics:
                f.write(json.dumps(vars(m)) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
