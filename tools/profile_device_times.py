"""Measure pure DEVICE execution time of the hot per-frame / per-KF programs
at bench shapes.

Through the axon relay `jax.block_until_ready` is a NO-OP (returns
immediately; measured in tools -> memory), so the only reliable completion
probe is an actual device_get. Method: time N back-to-back dispatches (same
program, rotated inputs to defeat the relay's identical-computation cache)
followed by ONE tiny dependent readback, at two values of N; the per-
iteration device time is the slope (T_big - T_small) / (N_big - N_small),
which cancels the flat readback latency.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
from lldslam_tpu.ops.orb import OrbConfig
from lldslam_tpu.system import System
from bench import _make_sequence


def probe(out):
    """Tiny dependent readback forcing completion."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def timeit(name, fn, variants, n_small=3, n_big=15):
    fn(variants[0])
    probe(fn(variants[0]))  # warm + completion

    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(variants[i % len(variants)])
        probe(out)
        return time.perf_counter() - t0

    run(n_small)  # warm the timing path
    t_s = run(n_small)
    t_b = run(n_big)
    per = (t_b - t_s) / (n_big - n_small)
    print(f"{name}: {per * 1e3:6.1f} ms/iter "
          f"(T{n_small}={t_s:.3f}s T{n_big}={t_b:.3f}s)",
          file=sys.stderr, flush=True)
    return per


def main():
    cam_cfg = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                           bf=386.1448, fps=10.0, width=1241, height=376)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=2000),
                     tracking=TrackingConfig(min_init_points=100))
    sysm = System(cfg, pipeline=True)
    frames = _make_sequence(cam_cfg.stereo_camera(), 10)
    for i, (l, r) in enumerate(frames):
        sysm.track_stereo(l, r, timestamp=i * 0.1)
    sysm.flush()
    tr = sysm.tracker
    print("map:", tr.store.n_kf, "KFs", int(tr.store.pt_valid.sum()), "pts",
          "view cap", len(tr._view_pid), file=sys.stderr)

    from lldslam_tpu.frontend.frame import build_frame_pair, pack_frame
    from lldslam_tpu.pipeline import mapper_fast
    from lldslam_tpu.pipeline.tracker import _track_step_chained

    pairs = [tr.stage_pair(*frames[6 + (i % 4)]) for i in range(4)]
    fds = [build_frame_pair(p, tr.cam, tr.orb) for p in pairs]
    probe(fds[-1].feats)

    W = tr.readback_window
    L = 23 + 4 * tr.store.n_kp + len(tr._view_pid)
    ring = tr._dev_ring if tr._dev_ring is not None \
        else jnp.zeros(W * L, jnp.int32)

    def chained(fd):
        return _track_step_chained(
            tr.cam, tr._dev_T, tr._dev_vel, tr._last_feats, tr._last_ptpos,
            tr._last_haspt, fd.feats, fd.depth, tr._view,
            tr._inv_sigma2_lut, tr._last_ismap, tr._last_prov,
            tr._dev_since, tr._dev_refm, ring, 0,
            tr.orb.n_levels, tr.orb.scale, 7, float(cfg.close_depth), 3, 10)[0]

    timeit("chained step", chained, fds)
    timeit("build_frame_pair",
           lambda p: build_frame_pair(p, tr.cam, tr.orb).feats.desc, pairs)

    mp = tr.mapper
    lay = mp._stage_layout
    bufs = [jax.device_put(np.full(lay.offsets["_total"], i, np.int32))
            for i in range(2)]
    timeit("kf_stage(tri+fuse)",
           lambda b: mapper_fast.kf_stage_cached(
               tr.cam, lay, mp.cache.arrays, b, mp._lut_dev,
               tr.store.cfg.n_levels, tr.store.cfg.scale)[0], bufs)

    for P in (1024, 2048, 4096):
        tv = mp.fixed_tv_cap or 4096
        bl = mapper_fast.BaLayout(k_cap=mp.k_cap, p_bkt=P,
                                  o_bkt=mp._o_bkt(P), tv_cap=tv,
                                  n_kp=tr.store.n_kp)
        bbufs = [jax.device_put(np.full(bl.offsets["_total"], i, np.int32))
                 for i in range(2)]
        timeit(f"local BA p_bkt={P} tv={tv}",
               lambda b, bl=bl: mapper_fast.ba_view_cached(
                   tr.cam, bl, mp.cache.arrays, b, mp._lut_dev)[0],
               bbufs, n_small=2, n_big=8)

    lc = tr.loop_closer
    if lc is not None:
        timeit("bow descent",
               lambda fd: lc.dispatch_bow(fd.feats.desc, fd.feats.valid), fds)
    timeit("pack_frame", pack_frame, fds)


if __name__ == "__main__":
    main()
