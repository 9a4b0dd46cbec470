"""Multi-process worker for the jax.distributed 2-process BA test.

Usage: python tools/dist_worker.py <process_id> <num_processes> <port>

Each process contributes 2 virtual CPU devices to a global 4-device mesh and
runs the landmark-sharded distributed Schur solve (parallel/dist_schur.py);
process 0 checks the replicated pose solution against the single-device
reference solver and prints DIST OK.
"""
import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=proc_id,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lldslam_tpu.geometry.camera import StereoCamera  # noqa: E402
from lldslam_tpu.optim import ba  # noqa: E402
from lldslam_tpu.parallel import dist_schur  # noqa: E402

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                   width=640, height=480)


def problem(O=512, K=8, P=128, seed=0, noise=0.02):
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    poses[:, 2, 3] = np.arange(K) * 0.1
    pts = np.stack([
        rng.uniform(-5, 5, P), rng.uniform(-3, 3, P), rng.uniform(8, 20, P),
    ], -1).astype(np.float32)
    k = rng.integers(0, K, O).astype(np.int32)
    p = rng.integers(0, P, O).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", poses[k, :3, :3], pts[p]) + poses[k, :3, 3]
    u = CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx
    v = CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy
    ur = u - CAM.bf / Xc[:, 2]
    uvr = np.stack([u, v, ur], -1).astype(np.float32)
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        points=jnp.asarray(
            pts + rng.normal(0, noise, pts.shape).astype(np.float32)),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
        point_valid=jnp.ones(P, bool),
        obs=ba.BAObs(
            k=jnp.asarray(k), p=jnp.asarray(p), uvr=jnp.asarray(uvr),
            inv_sigma2=jnp.ones(O), is_stereo=jnp.ones(O, bool),
            valid=jnp.ones(O, bool)))


def main():
    n_dev = len(jax.devices())
    assert n_dev == 2 * nprocs, (n_dev, nprocs)
    prob = problem()
    mesh = dist_schur.make_mesh()  # all global devices
    dp, _ = dist_schur.make_dist_problem(prob, n_dev)
    dp = dist_schur.place(dp, mesh)
    poses_d, points_d, chi2_d = dist_schur.dist_ba_solve(
        CAM, dp, mesh, iters=3, cg_iters=16)
    poses_np = np.asarray(poses_d)  # replicated output: readable anywhere
    ref, _ = ba.ba_solve(CAM, prob, iters=3, dense=False, cg_iters=16)
    err = np.abs(poses_np - np.asarray(ref.poses)).max()
    assert err < 2e-4, err
    assert not points_d.sharding.is_fully_replicated
    print(f"DIST OK proc={proc_id} devices={n_dev} pose_err={err:.2e}",
          flush=True)


main()
