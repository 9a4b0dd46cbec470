"""Epipolar triangulation + fuse kernels (pipeline/mapping_ops.py) and
keyframe culling."""
import numpy as np
import jax.numpy as jnp

from lldslam_tpu.geometry import se3
from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.pipeline import mapping_ops

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=225.0,
                   width=640, height=480)


def test_triangulate_pair_recovers_points():
    rng = np.random.default_rng(0)
    n = 128
    X = np.stack([rng.uniform(-6, 6, n), rng.uniform(-4, 4, n),
                  rng.uniform(8, 20, n)], -1).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    xi = np.array([0.4, 0.05, 0.0, 0.0, 0.02, 0.0], np.float32)  # sideways
    T2 = np.asarray(se3.exp(jnp.asarray(xi)))

    def proj(T):
        Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
        return np.stack([CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx,
                         CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy], -1)

    xy1 = proj(T1).astype(np.float32)
    xy2 = proj(T2).astype(np.float32)
    descs = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    lut = jnp.ones(8)
    buf = np.asarray(mapping_ops.triangulate_pair(
        CAM, jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(xy1), jnp.asarray(descs), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool),
        jnp.asarray(xy2), jnp.asarray(descs), jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool), lut))
    n_good, match, Xr = mapping_ops.unpack_triangulate_np(buf, n)
    good = match >= 0
    # rejections are the reference's own gates: parallax 0.9998 (far points
    # belong to stereo depth) and out-of-frame projections
    assert n_good > 0.5 * n
    assert (match[good] == np.nonzero(good)[0]).mean() > 0.95
    err = np.linalg.norm(Xr[good] - X[good], axis=-1)
    assert np.median(err) < 0.05


def test_triangulate_pair_rejects_low_parallax():
    """Nearly-identical poses: parallax gate must reject everything."""
    rng = np.random.default_rng(1)
    n = 32
    X = np.stack([rng.uniform(-4, 4, n), rng.uniform(-2, 2, n),
                  rng.uniform(10, 30, n)], -1).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.eye(4, dtype=np.float32)
    T2[0, 3] = 1e-4

    def proj(T):
        Xc = (T[:3, :3] @ X.T).T + T[:3, 3]
        return np.stack([CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx,
                         CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy], -1)

    descs = rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)
    buf = np.asarray(mapping_ops.triangulate_pair(
        CAM, jnp.asarray(T1), jnp.asarray(T2),
        jnp.asarray(proj(T1).astype(np.float32)), jnp.asarray(descs),
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        jnp.asarray(proj(T2).astype(np.float32)), jnp.asarray(descs),
        jnp.zeros(n, jnp.int32), jnp.ones(n, bool), jnp.ones(8)))
    n_good, match, _ = mapping_ops.unpack_triangulate_np(buf, n)
    assert n_good == 0


def test_keyframe_culling():
    from lldslam_tpu.config import CameraConfig, SlamConfig
    from lldslam_tpu.ops.orb import OrbConfig
    from lldslam_tpu.pipeline.local_mapping import LocalMapper
    from lldslam_tpu.slammap.map_store import MapStore

    rng = np.random.default_rng(2)
    cfg = SlamConfig(camera=CameraConfig(fx=CAM.fx, fy=CAM.fy, cx=CAM.cx,
                                         cy=CAM.cy, bf=CAM.bf,
                                         width=640, height=480),
                     orb=OrbConfig(n_features=256))
    store = MapStore(CAM, cfg.orb, max_kf=8, max_pt=4096)
    mapper = LocalMapper(store, cfg)
    n = store.n_kp

    def feats():
        return {
            "xy": rng.uniform(0, 600, (n, 2)).astype(np.float32),
            "ur": rng.uniform(0, 600, n).astype(np.float32),
            "octave": np.zeros(n, np.int32),
            "angle": np.zeros(n, np.float32),
            "desc": rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32),
            "valid": np.ones(n, bool),
        }

    k0 = store.add_keyframe(np.eye(4, dtype=np.float32), feats(),
                            np.full(n, 5.0, np.float32),
                            np.full(n, -1, np.int32), 0)
    ids = store.create_points(k0, np.arange(60),
                              rng.normal(size=(60, 3)).astype(np.float32) + [0, 0, 10])
    # 4 more KFs all observing the same 60 points -> massively redundant
    for i in range(1, 5):
        pt = np.full(n, -1, np.int32)
        pt[:60] = ids
        store.add_keyframe(np.eye(4, dtype=np.float32), feats(),
                           np.full(n, 5.0, np.float32), pt, i)
    store.refresh_obs_counts()
    mapper.cull_keyframes(4)
    # some middle keyframe must be culled (never KF0 or the current one)
    assert not store.kf_valid[1:4].all()
    assert store.kf_valid[0] and store.kf_valid[4]
