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
