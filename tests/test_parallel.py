"""Multi-device sharded BA (parallel/sharded_ba.py) on the 8-device CPU mesh.

Validates the SURVEY.md §5.7/§5.8 scale-out design: observation-sharded
normal-equation build must produce the same solution as the single-device
solver (collectives are a layout detail, not a math change)."""
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.optim import ba
from lldslam_tpu.parallel import sharded_ba

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                   width=640, height=480)


def _problem(O=512, K=8, P=128, seed=0, noise=0.02):
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
        points=jnp.asarray(pts + rng.normal(0, noise, pts.shape).astype(np.float32)),
        pose_fixed=jnp.asarray(np.arange(K) == 0),
        point_valid=jnp.ones(P, bool),
        obs=ba.BAObs(
            k=jnp.asarray(k), p=jnp.asarray(p), uvr=jnp.asarray(uvr),
            inv_sigma2=jnp.ones(O), is_stereo=jnp.ones(O, bool),
            valid=jnp.ones(O, bool),
        ),
    ), pts


def test_sharded_matches_single_device():
    problem, pts_true = _problem()
    mesh = sharded_ba.make_mesh(8)
    solved_sh, chi2_sh = sharded_ba.ba_solve_sharded(
        CAM, problem, mesh, iters=3, cg_iters=16)
    solved_1, chi2_1 = ba.ba_solve(CAM, problem, iters=3, dense=False,
                                   cg_iters=16)
    np.testing.assert_allclose(np.asarray(solved_sh.poses),
                               np.asarray(solved_1.poses), atol=2e-4)
    # both recover the true structure
    err = np.linalg.norm(np.asarray(solved_sh.points) - pts_true, axis=-1)
    assert np.median(err) < 0.01


def test_sharded_improves_cost():
    problem, _ = _problem(noise=0.05)
    mesh = sharded_ba.make_mesh(4)
    solved, chi2 = sharded_ba.ba_solve_sharded(CAM, problem, mesh,
                                               iters=4, cg_iters=16)
    r0 = np.asarray(jax.jit(lambda p: ba._total_cost(CAM, p, False))(problem))
    r1 = np.asarray(jax.jit(lambda p: ba._total_cost(CAM, p, False))(solved))
    assert r1 < 0.1 * r0


def test_dist_schur_matches_single_device():
    """Landmark-sharded shard_map Schur (parallel/dist_schur.py): explicit
    psum placement must reproduce the single-device CG solver (identical
    schedule; differences only from f32 reduction order)."""
    from lldslam_tpu.parallel import dist_schur

    problem, pts_true = _problem(O=768, K=8, P=160)
    mesh = dist_schur.make_mesh(8)
    dp, obs_src = dist_schur.make_dist_problem(problem, 8)
    dp = dist_schur.place(dp, mesh)
    poses_d, points_d, chi2_d = dist_schur.dist_ba_solve(
        CAM, dp, mesh, iters=3, cg_iters=16)
    solved_1, chi2_1 = ba.ba_solve(CAM, problem, iters=3, dense=False,
                                   cg_iters=16)
    np.testing.assert_allclose(np.asarray(poses_d),
                               np.asarray(solved_1.poses), atol=2e-4)
    # points come back in padded order; first P rows are the originals
    P = problem.points.shape[0]
    err = np.linalg.norm(np.asarray(points_d)[:P] - pts_true, axis=-1)
    assert np.median(err) < 0.01
    # chi2 maps back through obs_src and matches the reference solver's
    m = obs_src >= 0
    c_back = np.empty(chi2_1.shape[0], np.float32)
    c_back[obs_src[m]] = np.asarray(chi2_d)[m]
    np.testing.assert_allclose(c_back, np.asarray(chi2_1), atol=5e-2)


def test_dist_schur_solve_is_sharded():
    """The landmark state and observation table must actually live sharded
    over the mesh (one block per device), not replicated."""
    from lldslam_tpu.parallel import dist_schur

    problem, _ = _problem(O=512, K=6, P=128)
    mesh = dist_schur.make_mesh(4)
    dp, _ = dist_schur.make_dist_problem(problem, 4)
    dp = dist_schur.place(dp, mesh)
    assert not dp.points.sharding.is_fully_replicated
    assert not dp.obs.uvr.sharding.is_fully_replicated
    assert len(dp.points.sharding.device_set) == 4
    poses_d, points_d, _ = dist_schur.dist_ba_solve(
        CAM, dp, mesh, iters=2, cg_iters=8)
    assert not points_d.sharding.is_fully_replicated
    assert np.isfinite(np.asarray(points_d)).all()
    assert np.isfinite(np.asarray(poses_d)).all()


def test_dist_schur_two_process():
    """jax.distributed 2-process run on one machine: global 4-device mesh
    (2 virtual CPU devices per process), landmark-sharded solve, replicated
    pose output checked against the single-device solver in-worker."""
    import subprocess
    import sys
    import socket
    import os

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tools", "dist_worker.py"),
             str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root)
        for i in range(2)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {i} failed:\n{out}"
        assert "DIST OK" in out, f"proc {i} missing DIST OK:\n{out}"
