"""Batched multi-sequence tracking step (parallel/multi_seq.py): the vmapped
step must equal per-sequence results."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lldslam_tpu.frontend import matching
from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.parallel import multi_seq
from lldslam_tpu.pipeline.tracker import _track_step

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=225.0,
                   width=640, height=480)
N = 256
P = 512


def _feats(rng):
    return matching.FrameFeatures(
        xy=jnp.asarray(rng.uniform(0, 600, (N, 2)).astype(np.float32)),
        ur=jnp.asarray(rng.uniform(0, 600, N).astype(np.float32)),
        octave=jnp.zeros(N, jnp.int32),
        angle=jnp.zeros(N, jnp.float32),
        desc=jnp.asarray(rng.integers(0, 2**32, (N, 8),
                                      dtype=np.uint64).astype(np.uint32)),
        valid=jnp.ones(N, bool))


def _view(rng):
    pos = rng.normal(size=(P, 3)).astype(np.float32) + [0, 0, 15]
    d = np.linalg.norm(pos, axis=-1)
    return matching.MapPointView(
        pos=jnp.asarray(pos),
        desc=jnp.asarray(rng.integers(0, 2**32, (P, 8),
                                      dtype=np.uint64).astype(np.uint32)),
        normal=jnp.asarray(pos / d[:, None]),
        min_dist=jnp.asarray(0.2 * d), max_dist=jnp.asarray(1.2 * d),
        valid=jnp.ones(P, bool))


def test_batched_step_matches_individual():
    rng = np.random.default_rng(0)
    S = 3
    args_per_seq = []
    for _ in range(S):
        args_per_seq.append(dict(
            T=jnp.eye(4), last=_feats(rng),
            ptpos=jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) + [0, 0, 15]),
            haspt=jnp.asarray(rng.uniform(size=N) < 0.5),
            ismap=jnp.asarray(rng.uniform(size=N) < 0.4),
            prov=jnp.asarray(
                np.where(rng.uniform(size=N) < 0.2,
                         rng.integers(0, N, N), -1).astype(np.int32)),
            cur=_feats(rng),
            depth=jnp.asarray(rng.uniform(1, 30, N).astype(np.float32)),
            view=_view(rng)))

    singles = [
        _track_step(CAM, a["T"], a["last"], a["ptpos"], a["haspt"],
                    a["ismap"], a["prov"], a["cur"], a["depth"], a["view"],
                    jnp.ones(8), 8, 1.2, 7, 20.0)
        for a in args_per_seq
    ]
    stack = lambda key: jax.tree.map(lambda *xs: jnp.stack(xs),
                                     *[a[key] for a in args_per_seq])
    batched = multi_seq.batched_track_step(
        CAM, stack("T"), stack("last"), stack("ptpos"), stack("haspt"),
        stack("ismap"), stack("prov"), stack("cur"), stack("depth"),
        stack("view"), jnp.ones(8), 8, 1.2, 7, 20.0)
    for s in range(S):
        np.testing.assert_array_equal(np.asarray(batched[0][s]),
                                      np.asarray(singles[s][0]))


@pytest.mark.slow
def test_multi_sequence_driver_matches_solo():
    """MultiSequenceDriver: 4 sequences tracked in one batched device
    program per frame must match individually-tracked runs."""
    from bench import _make_sequence
    from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from lldslam_tpu.ops.orb import OrbConfig
    from lldslam_tpu.parallel.multi_seq import MultiSequenceDriver
    from lldslam_tpu.system import System

    cam_cfg = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=120.0,
                           bf=200.0, fps=10.0, width=640, height=240)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=512),
                     tracking=TrackingConfig(min_init_points=60))
    n_seq, n_frames = 4, 10
    seqs = [_make_sequence(cam_cfg.stereo_camera(), n_frames,
                           n_per_m=25.0, seed=10 + s)
            for s in range(n_seq)]

    solo_T = []
    for s in range(n_seq):
        sysm = System(cfg, enable_loops=False)
        sysm.tracker.mapper.fixed_tv_cap = 2048
        for i, (l, r) in enumerate(seqs[s]):
            sysm.track_stereo(l, r, timestamp=i * 0.1)
        _, T = sysm.tracker.trajectory()
        solo_T.append(T)

    drv = MultiSequenceDriver(cfg, n_seq, enable_loops=False)
    for i in range(n_frames):
        res = drv.process([seqs[s][i] for s in range(n_seq)],
                          [i * 0.1] * n_seq)
        assert all(r is not None for r in res)
    for s, (ts, T) in enumerate(drv.trajectories()):
        assert len(ts) == n_frames
        dp = np.linalg.norm(T[:, :3, 3] - solo_T[s][:, :3, 3], axis=-1)
        assert dp.max() < 0.05, (s, dp.max())
        assert drv.trackers[s].state.name == "OK"
    # the steady-state frames really were batched (one program, S results)
    batched_frames = [m for m in drv.trackers[0].metrics if m.frame_id >= 1]
    assert len(batched_frames) == n_frames - 1


@pytest.mark.slow
def test_pipelined_driver_matches_solo():
    """PipelinedMultiSequenceDriver: stacked chain state + one vmapped
    chained program per frame + a shared (S, W, L) readback ring must stay
    within pipelining tolerance of individually-tracked pipelined runs."""
    from bench import _make_sequence
    from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from lldslam_tpu.ops.orb import OrbConfig
    from lldslam_tpu.parallel.multi_seq import PipelinedMultiSequenceDriver
    from lldslam_tpu.system import System

    cam_cfg = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=120.0,
                           bf=200.0, fps=10.0, width=640, height=240)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=512),
                     tracking=TrackingConfig(min_init_points=60))
    n_seq, n_frames = 3, 14
    seqs = [_make_sequence(cam_cfg.stereo_camera(), n_frames,
                           n_per_m=25.0, seed=10 + s)
            for s in range(n_seq)]

    solo_T = []
    for s in range(n_seq):
        sysm = System(cfg, enable_loops=False, pipeline=True)
        sysm.tracker.mapper.fixed_tv_cap = 2048
        for i, (l, r) in enumerate(seqs[s]):
            sysm.track_stereo(l, r, timestamp=i * 0.1)
        sysm.flush()
        _, T = sysm.tracker.trajectory()
        solo_T.append(T)

    drv = PipelinedMultiSequenceDriver(cfg, n_seq, enable_loops=False)
    for f in range(n_frames):
        drv.process([seqs[s][f] for s in range(n_seq)], [f * 0.1] * n_seq)
    drv.flush()
    for s in range(n_seq):
        _, T = drv.trackers[s].trajectory()
        assert len(T) == n_frames
        assert drv.trackers[s].state.name == "OK"
        dp = np.linalg.norm(T[:, :3, 3] - solo_T[s][:, :3, 3], axis=-1)
        assert dp.max() < 0.35, (s, dp.max())


@pytest.mark.slow
def test_pipelined_driver_membership_churn():
    """A sequence ENDING mid-run forces _flush_batch(keep=survivors) and a
    re-stack. Kept members must continue from the LAST DISPATCHED chain
    state (the stacked rows are written back into the per-tracker fields) —
    without the write-back they re-enter the stack matching against a
    frames-old 'last frame' whose kp2last indices silently resolve to wrong
    global point ids (round-5 advisor finding)."""
    from bench import _make_sequence
    from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from lldslam_tpu.ops.orb import OrbConfig
    from lldslam_tpu.parallel.multi_seq import PipelinedMultiSequenceDriver
    from lldslam_tpu.system import System

    cam_cfg = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=120.0,
                           bf=200.0, fps=10.0, width=640, height=240)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=512),
                     tracking=TrackingConfig(min_init_points=60))
    n_seq, n_frames, n_short = 3, 16, 7
    seqs = [_make_sequence(cam_cfg.stereo_camera(), n_frames,
                           n_per_m=25.0, seed=30 + s)
            for s in range(n_seq)]

    solo_T = []
    for s in range(n_seq):
        sysm = System(cfg, enable_loops=False, pipeline=True)
        sysm.tracker.mapper.fixed_tv_cap = 2048
        end = n_short if s == 1 else n_frames
        for i in range(end):
            sysm.track_stereo(*seqs[s][i], timestamp=i * 0.1)
        sysm.flush()
        _, T = sysm.tracker.trajectory()
        solo_T.append(T)

    drv = PipelinedMultiSequenceDriver(cfg, n_seq, enable_loops=False)
    for f in range(n_frames):
        pairs = [seqs[s][f] if (s != 1 or f < n_short) else None
                 for s in range(n_seq)]
        drv.process(pairs, [f * 0.1] * n_seq)
    drv.flush()
    for s in range(n_seq):
        _, T = drv.trackers[s].trajectory()
        exp = n_short if s == 1 else n_frames
        assert len(T) == exp, (s, len(T))
        assert drv.trackers[s].state.name == "OK"
        dp = np.linalg.norm(T[:, :3, 3] - solo_T[s][:, :3, 3], axis=-1)
        assert dp.max() < 0.35, (s, dp.max())
