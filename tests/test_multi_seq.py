"""Batched multi-sequence tracking step (parallel/multi_seq.py): the vmapped
step must equal per-sequence results."""
import numpy as np
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
            cur=_feats(rng),
            depth=jnp.asarray(rng.uniform(1, 30, N).astype(np.float32)),
            view=_view(rng)))

    singles = [
        _track_step(CAM, a["T"], a["last"], a["ptpos"], a["haspt"], a["cur"],
                    a["depth"], a["view"], jnp.ones(8), 8, 1.2, 7, 20.0)
        for a in args_per_seq
    ]
    stack = lambda key: jax.tree.map(lambda *xs: jnp.stack(xs),
                                     *[a[key] for a in args_per_seq])
    batched = multi_seq.batched_track_step(
        CAM, stack("T"), stack("last"), stack("ptpos"), stack("haspt"),
        stack("cur"), stack("depth"), stack("view"), jnp.ones(8),
        8, 1.2, 7, 20.0)
    for s in range(S):
        np.testing.assert_array_equal(np.asarray(batched[0][s]),
                                      np.asarray(singles[s][0]))
