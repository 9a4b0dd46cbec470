"""Estimation-layer tests: analytic Jacobians vs finite differences, pose-only
optimization convergence with outliers, and Schur BA (dense + CG paths) on a
synthetic multi-view scene (SURVEY.md §4 items 1-2)."""
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.geometry import se3
from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.optim import residuals as res
from lldslam_tpu.optim import pose_opt, ba

CAM = StereoCamera(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                   bf=386.1448, width=1241, height=376)
RNG = np.random.default_rng(42)


def make_scene(n_pts=200, n_kf=6, noise=0.3):
    pts = RNG.uniform([-10, -4, 5], [10, 4, 40], size=(n_pts, 3)).astype(np.float32)
    xi = np.stack(
        [
            np.linspace(0, 3, n_kf),
            np.zeros(n_kf),
            np.linspace(0, 0.5, n_kf),
            np.zeros(n_kf),
            np.linspace(0, 0.15, n_kf),
            np.zeros(n_kf),
        ],
        axis=-1,
    ).astype(np.float32)
    T = se3.exp(jnp.asarray(xi))
    from lldslam_tpu.geometry import camera as gcam

    obs = gcam.project_stereo(CAM, se3.apply(T[:, None], jnp.asarray(pts)[None]))
    obs = obs + noise * jnp.asarray(RNG.normal(size=obs.shape), jnp.float32)
    return jnp.asarray(pts), T, obs


class TestJacobians:
    def test_point_jacobians_fd(self):
        X = jnp.asarray(RNG.uniform([-5, -2, 4], [5, 2, 30], size=(16, 3)), jnp.float32)
        T = se3.exp(jnp.asarray(RNG.normal(size=(6,)) * 0.2, jnp.float32))
        obs = jnp.zeros((16, 3))
        Jc, Jp, _ = res.point_jacobians_stereo(CAM, T, X)
        # FD wrt pose tangent
        eps = 1e-3
        for d in range(6):
            e = jnp.zeros(6).at[d].set(eps)
            rp = res.point_residual_stereo(CAM, se3.exp(e) @ T, X, obs)
            rm = res.point_residual_stereo(CAM, se3.exp(-e) @ T, X, obs)
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(Jc[:, :, d]), np.asarray(fd), rtol=1e-2, atol=2e-2
            )
        # FD wrt point
        for d in range(3):
            e = jnp.zeros(3).at[d].set(eps)
            rp = res.point_residual_stereo(CAM, T, X + e, obs)
            rm = res.point_residual_stereo(CAM, T, X - e, obs)
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(Jp[:, :, d]), np.asarray(fd), rtol=1e-2, atol=2e-2
            )


class TestPoseOpt:
    def test_converges_from_perturbed(self):
        pts, T, obs = make_scene(noise=0.2)
        T_true = T[2]
        T0 = se3.exp(jnp.asarray([0.3, -0.2, 0.1, 0.02, -0.03, 0.01])) @ T_true
        p = pose_opt.PointPoseObs(
            X=pts,
            obs=obs[2],
            inv_sigma2=jnp.ones(pts.shape[0]),
            is_stereo=jnp.ones(pts.shape[0], bool),
            valid=jnp.ones(pts.shape[0], bool),
        )
        T_opt, inl, _, n = pose_opt.optimize_pose(CAM, T0, p)
        err = np.asarray(se3.log(T_opt @ se3.inv(T_true)))
        assert np.linalg.norm(err[:3]) < 0.02, err
        assert np.linalg.norm(err[3:]) < 0.005, err
        assert int(n) > 150

    def test_rejects_outliers(self):
        pts, T, obs = make_scene(noise=0.2)
        T_true = T[2]
        o = np.asarray(obs[2]).copy()
        bad = RNG.choice(len(pts), size=60, replace=False)
        o[bad, 0] += RNG.uniform(30, 120, size=60)  # gross outliers
        p = pose_opt.PointPoseObs(
            X=pts,
            obs=jnp.asarray(o),
            inv_sigma2=jnp.ones(pts.shape[0]),
            is_stereo=jnp.ones(pts.shape[0], bool),
            valid=jnp.ones(pts.shape[0], bool),
        )
        T0 = se3.exp(jnp.asarray([0.2, 0.1, -0.1, 0.01, 0.02, -0.01])) @ T_true
        T_opt, inl, _, n = pose_opt.optimize_pose(CAM, T0, p)
        err = np.asarray(se3.log(T_opt @ se3.inv(T_true)))
        assert np.linalg.norm(err[:3]) < 0.03, err
        inl = np.asarray(inl)
        assert inl[bad].mean() < 0.2  # outliers flagged
        assert inl.mean() > 0.5


def build_ba_problem(pts, T, obs, pose_noise=0.05, pt_noise=0.3):
    n_kf, n_pts = T.shape[0], pts.shape[0]
    ks, ps = np.meshgrid(np.arange(n_kf), np.arange(n_pts), indexing="ij")
    o = ba.BAObs(
        k=jnp.asarray(ks.ravel(), jnp.int32),
        p=jnp.asarray(ps.ravel(), jnp.int32),
        uvr=obs.reshape(-1, 3),
        inv_sigma2=jnp.ones(n_kf * n_pts),
        is_stereo=jnp.ones(n_kf * n_pts, bool),
        valid=jnp.ones(n_kf * n_pts, bool),
    )
    T_pert = se3.exp(
        jnp.asarray(
            np.concatenate(
                [np.zeros((1, 6)), RNG.normal(size=(n_kf - 1, 6)) * pose_noise]
            ),
            jnp.float32,
        )
    ) @ T
    pts_pert = pts + jnp.asarray(RNG.normal(size=pts.shape) * pt_noise, jnp.float32)
    fixed = jnp.zeros(n_kf, bool).at[0].set(True)
    return ba.BAProblem(
        poses=T_pert, points=pts_pert, pose_fixed=fixed,
        point_valid=jnp.ones(n_pts, bool), obs=o,
    )


class TestBA:
    def _run(self, dense):
        pts, T, obs = make_scene(n_pts=150, n_kf=5, noise=0.0)
        prob = build_ba_problem(pts, T, obs)
        # initial error
        e0 = np.linalg.norm(np.asarray(se3.log(prob.poses @ se3.inv(T))), axis=-1).max()
        prob2, chi2 = ba.ba_solve(CAM, prob, iters=10, dense=dense, cg_iters=40)
        e1 = np.linalg.norm(np.asarray(se3.log(prob2.poses @ se3.inv(T))), axis=-1).max()
        assert e1 < 0.01 * e0 + 1e-4, (e0, e1)
        # points recovered
        pe = np.linalg.norm(np.asarray(prob2.points - pts), axis=-1)
        assert np.median(pe) < 0.02, np.median(pe)

    def test_dense_schur(self):
        self._run(dense=True)

    def test_cg_schur(self):
        self._run(dense=False)

    def test_local_ba_drops_outliers(self):
        pts, T, obs = make_scene(n_pts=120, n_kf=5, noise=0.2)
        prob = build_ba_problem(pts, T, obs, pose_noise=0.02, pt_noise=0.1)
        o = np.asarray(prob.obs.uvr).copy()
        bad = RNG.choice(o.shape[0], size=60, replace=False)
        o[bad, 1] += RNG.uniform(20, 80, size=60)
        prob = prob._replace(obs=prob.obs._replace(uvr=jnp.asarray(o)))
        prob2, keep = ba.local_ba(CAM, prob)
        keep = np.asarray(keep)
        assert keep[bad].mean() < 0.2
        assert keep.mean() > 0.6
        e1 = np.linalg.norm(np.asarray(se3.log(prob2.poses @ se3.inv(T))), axis=-1).max()
        assert e1 < 0.02, e1
