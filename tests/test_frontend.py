"""Frontend association tests on synthetic geometry.

Exercises the dense projection matchers (frontend/matching.py) that replace
ORBmatcher::SearchByProjection (reference src/ORBmatcher.cc:45-157, 1328-1470):
project known 3D points into a synthetic frame, perturb, and check the
association recovers ground truth under the reference's gates.
"""
import numpy as np
import jax.numpy as jnp

from lldslam_tpu.frontend import matching
from lldslam_tpu.geometry import se3
from lldslam_tpu.geometry.camera import StereoCamera

CAM = StereoCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=200.0,
                   width=640, height=480)


def _random_descs(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def _make_scene(rng, n=64):
    """Points in front of the identity camera, 4-20 m deep."""
    z = rng.uniform(4.0, 20.0, n)
    u = rng.uniform(40, CAM.width - 40, n)
    v = rng.uniform(40, CAM.height - 40, n)
    X = np.stack([(u - CAM.cx) * z / CAM.fx, (v - CAM.cy) * z / CAM.fy, z], -1)
    return X.astype(np.float32)


def _frame_from_points(X, T_cw, descs, noise=0.0, rng=None):
    Xc = np.asarray(se3.apply(jnp.asarray(T_cw), jnp.asarray(X)))
    u = CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx
    v = CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy
    ur = u - CAM.bf / Xc[:, 2]
    if noise and rng is not None:
        u = u + rng.normal(0, noise, len(u))
        v = v + rng.normal(0, noise, len(v))
    return matching.FrameFeatures(
        xy=jnp.asarray(np.stack([u, v], -1), jnp.float32),
        ur=jnp.asarray(ur, jnp.float32),
        octave=jnp.zeros(len(u), jnp.int32),
        angle=jnp.zeros(len(u), jnp.float32),
        desc=jnp.asarray(descs),
        valid=jnp.ones(len(u), bool),
    )


def test_search_by_projection_recovers_identity_association():
    rng = np.random.default_rng(0)
    X = _make_scene(rng)
    n = len(X)
    descs = _random_descs(rng, n)
    T = np.eye(4, dtype=np.float32)
    frame = _frame_from_points(X, T, descs, noise=0.3, rng=rng)
    dist = np.linalg.norm(X, axis=-1)
    pts = matching.MapPointView(
        pos=jnp.asarray(X),
        desc=jnp.asarray(descs),
        normal=jnp.asarray(X / dist[:, None]),  # ray camera->point (cam at origin)
        # store convention: slacked range for octave-0 reference observations
        min_dist=jnp.asarray(0.8 * dist / 1.2 ** 7, jnp.float32),
        max_dist=jnp.asarray(1.2 * dist, jnp.float32),
        valid=jnp.ones(n, bool),
    )
    pt2kp, kp2pt, _, _ = matching.search_by_projection(
        CAM, jnp.asarray(T), pts, frame, th=1.0
    )
    pt2kp = np.asarray(pt2kp)
    # identical descriptors at the true projection: association must be exact
    assert (pt2kp == np.arange(n)).mean() > 0.95


def test_search_by_projection_rejects_behind_camera():
    rng = np.random.default_rng(1)
    X = _make_scene(rng, 16)
    X[:, 2] *= -1  # all behind
    descs = _random_descs(rng, 16)
    frame = _frame_from_points(np.abs(X), np.eye(4, dtype=np.float32), descs)
    pts = matching.MapPointView(
        pos=jnp.asarray(X),
        desc=jnp.asarray(descs),
        normal=jnp.asarray(X / np.linalg.norm(X, axis=-1, keepdims=True)),
        min_dist=jnp.zeros(16), max_dist=jnp.full(16, 100.0),
        valid=jnp.ones(16, bool),
    )
    pt2kp, _, _, _ = matching.search_by_projection(
        CAM, jnp.asarray(np.eye(4, dtype=np.float32)), pts, frame
    )
    assert (np.asarray(pt2kp) == -1).all()


def test_match_last_frame_small_motion():
    rng = np.random.default_rng(2)
    X = _make_scene(rng)
    n = len(X)
    descs = _random_descs(rng, n)
    T0 = np.eye(4, dtype=np.float32)
    # small forward motion
    T1 = np.eye(4, dtype=np.float32)
    T1[2, 3] = -0.3  # camera moves +0.3 forward => points closer
    last = _frame_from_points(X, T0, descs)
    cur = _frame_from_points(X, T1, descs, noise=0.2, rng=rng)
    kp2last = matching.match_last_frame(
        CAM, jnp.asarray(T1), last,
        jnp.asarray(X), jnp.ones(n, bool), cur,
    )
    kp2last = np.asarray(kp2last)
    assert (kp2last == np.arange(n)).mean() > 0.9


def test_conflict_resolution_unique_keypoints():
    """Two points with identical descriptors projecting to the same keypoint:
    exactly one wins."""
    rng = np.random.default_rng(3)
    X = np.array([[0.0, 0.0, 10.0], [0.0, 0.0, 10.0]], np.float32)
    descs = _random_descs(rng, 1).repeat(2, axis=0)
    T = np.eye(4, dtype=np.float32)
    frame = _frame_from_points(X[:1], T, descs[:1])
    d = np.linalg.norm(X, axis=-1)
    pts = matching.MapPointView(
        pos=jnp.asarray(X), desc=jnp.asarray(descs),
        normal=jnp.asarray(X / d[:, None]),
        min_dist=jnp.asarray(0.1 * d), max_dist=jnp.asarray(1.2 * d),
        valid=jnp.ones(2, bool),
    )
    pt2kp, kp2pt, _, _ = matching.search_by_projection(CAM, jnp.asarray(T), pts, frame)
    assert (np.asarray(pt2kp) >= 0).sum() == 1
    assert (np.asarray(kp2pt) >= 0).sum() == 1
