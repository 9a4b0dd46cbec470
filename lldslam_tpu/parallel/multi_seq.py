"""Batched multi-sequence evaluation: one device program tracks S sequences.

The BASELINE.json configs include "full combined KITTI+EuRoC 13-sequence
benchmark sweep, batched multi-sequence on one host" (the reference runs its
per-sequence CLI loop — Examples/Stereo/stereo_kitti.cc:96-142 — once per
sequence; here the per-frame compute of S sequences shares ONE XLA program).

Every per-frame kernel in this framework is fixed-shape, so the fused
tracking step and the frame build vmap over a leading sequence axis:
S stereo pairs in, S packed results out. `MultiSequenceDriver` owns S
per-sequence `StereoTracker`s (each with its own `MapStore`); per frame it

1. stages ONE (S, 2, H, W) uint8 upload,
2. runs the vmapped frame build + vmapped fused track step,
3. reads ONE packed (S, L) buffer back, and
4. finalizes each sequence through its own tracker's host bookkeeping
   (`StereoTracker._track_finalize`) — keyframes, local mapping, loop
   closing all stay per-sequence and run at keyframe rate.

Sequences whose tracker is NOT_INITIALIZED or LOST fall back to their own
synchronous step for that frame (initialization and relocalization are
per-sequence control flow); everything in state OK rides the batch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SlamConfig
from ..frontend.frame import build_frame_pair
from ..geometry.camera import StereoCamera
from ..ops.orb import OrbConfig
from ..pipeline.tracker import StereoTracker, TrackMetrics, TrackState, \
    _track_step


@partial(jax.jit, static_argnames=("cam", "cfg"))
def batched_build_frame(pairs, cam: StereoCamera, cfg: OrbConfig):
    """(S, 2, H, W) stacked pairs -> vmapped FrameData batch."""
    return jax.vmap(lambda p: build_frame_pair(p, cam, cfg))(pairs)


@partial(jax.jit, static_argnames=("cam", "n_levels", "scale", "min_mm",
                                   "close_depth"))
def batched_track_step(cam, T_pred, last_feats, last_ptpos, last_haspt,
                       last_ismap, last_prov, cur, depth, view,
                       inv_sigma2_lut, n_levels, scale, min_mm, close_depth):
    """vmap of the fused per-frame tracking step over the sequence axis.
    All array arguments carry a leading S dim; returns the same packed
    outputs batched."""
    def one(T_pred, last_feats, last_ptpos, last_haspt, last_ismap,
            last_prov, cur, depth, view):
        return _track_step(cam, T_pred, last_feats, last_ptpos, last_haspt,
                           last_ismap, last_prov, cur, depth, view,
                           inv_sigma2_lut, n_levels, scale, min_mm,
                           close_depth)
    return jax.vmap(one)(T_pred, last_feats, last_ptpos, last_haspt,
                         last_ismap, last_prov, cur, depth, view)


class MultiSequenceDriver:
    """S per-sequence trackers stepped in lock-step with one device program
    per frame (view capacity pinned so all sequences share one shape)."""

    def __init__(self, cfg: SlamConfig, n_seq: int,
                 enable_loops: bool = False, view_cap: int = 2048):
        self.cfg = cfg
        self.n_seq = n_seq
        self.cam = cfg.camera.stereo_camera()
        self.trackers = []
        for _ in range(n_seq):
            tr = StereoTracker(cfg, enable_loops=enable_loops)
            tr.mapper.fixed_tv_cap = view_cap
            self.trackers.append(tr)

    def _batchable(self) -> list[int]:
        return [i for i, tr in enumerate(self.trackers)
                if tr.state == TrackState.OK and not tr.enable_lines]

    def process(self, pairs: list, timestamps: list[float]):
        """Track one frame of every sequence. pairs: list of S (imL, imR)
        uint8 arrays (None to skip a finished sequence). Returns list of
        (T_cw, TrackMetrics) per sequence."""
        import time as _time
        S = self.n_seq
        live = [i for i in range(S) if pairs[i] is not None]
        batch = [i for i in self._batchable() if i in live]
        solo = [i for i in live if i not in batch]
        results: list = [None] * S

        fds = {}
        if batch:
            stack = np.stack([np.stack(pairs[i]).astype(np.uint8)
                              for i in batch])
            pair_dev = jax.device_put(stack)
            fdb = batched_build_frame(pair_dev, self.cam,
                                      self.trackers[0].orb)
            t0 = _time.perf_counter()
            trs = [self.trackers[i] for i in batch]
            T_pred = jnp.asarray(np.stack([
                (tr.velocity @ tr.T_cw).astype(np.float32) for tr in trs]))
            stackf = lambda get: jax.tree.map(
                lambda *xs: jnp.stack(xs), *[get(tr) for tr in trs])
            last_feats = stackf(lambda tr: tr._last_feats)
            last_ptpos = stackf(lambda tr: tr._last_ptpos)
            last_haspt = stackf(lambda tr: tr._last_haspt)
            last_ismap = stackf(lambda tr: tr._last_ismap)
            last_prov = stackf(lambda tr: tr._last_prov)
            view = stackf(lambda tr: tr._view)
            tr0 = trs[0]
            out = batched_track_step(
                self.cam, T_pred, last_feats, last_ptpos, last_haspt,
                last_ismap, last_prov, fdb.feats, fdb.depth, view,
                tr0._inv_sigma2_lut,
                tr0.orb.n_levels, tr0.orb.scale,
                self.cfg.tracking.min_motion_matches,
                float(self.cfg.close_depth))
            t_disp = _time.perf_counter() - t0
            packed = np.asarray(out[0])
            for bi, i in enumerate(batch):
                tr = self.trackers[i]
                tr.frame_id += 1
                m = TrackMetrics(frame_id=tr.frame_id)
                m.t_dispatch = t_disp / len(batch)
                fd_i = jax.tree.map(lambda a: a[bi], fdb)
                t1 = _time.perf_counter()
                tr._track_finalize(fd_i, packed[bi], out[1][bi], out[2][bi],
                                   timestamps[i], m, tr.frame_id,
                                   dev_ismap=out[3][bi],
                                   dev_prov=out[4][0][bi],
                                   dev_final=out[5][bi])
                m.t_step = _time.perf_counter() - t1 - m.t_kf
                tr._finish_metrics(m)
                results[i] = (tr.T_cw.copy(), m)

        for i in solo:
            tr = self.trackers[i]
            results[i] = tr.process(pairs[i][0], pairs[i][1], timestamps[i])
        return results

    def trajectories(self):
        return [tr.trajectory() for tr in self.trackers]
