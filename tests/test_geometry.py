"""Geometry unit tests: SE(3)/Sim(3) group laws + codec round trips, camera
projection, line codecs/triangulation/residuals vs numpy/OpenCV oracles.

Test strategy per SURVEY.md §4: kernel/geometry contracts validated against
small oracles and finite differences.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lldslam_tpu.geometry import se3, sim3, camera, lines

jax.config.update("jax_enable_x64", False)

RNG = np.random.default_rng(0)


def rand_xi(n, scale=1.0):
    return jnp.asarray(RNG.normal(size=(n, 6)) * scale, dtype=jnp.float32)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = rand_xi(64, 0.7)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-5)

    def test_exp_matches_rodrigues(self):
        import cv2

        w = np.asarray(RNG.normal(size=(3,)), dtype=np.float64)
        R_cv, _ = cv2.Rodrigues(w)
        R = np.asarray(se3.so3_exp(jnp.asarray(w, jnp.float32)))
        np.testing.assert_allclose(R, R_cv, atol=1e-5)

    def test_small_angle(self):
        xi = rand_xi(8, 1e-4)
        T = se3.exp(xi)
        # float32 quaternion extraction resolves small rotations to ~1e-6 abs
        np.testing.assert_allclose(np.asarray(se3.log(T)), np.asarray(xi), atol=2e-6)
        # gradient is finite at 0
        g = jax.grad(lambda x: jnp.sum(se3.exp(x)))(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_compose_inv(self):
        A = se3.exp(rand_xi(16))
        B = se3.exp(rand_xi(16))
        AB = A @ B
        ident = AB @ se3.inv(AB)
        np.testing.assert_allclose(
            np.asarray(ident), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5
        )

    def test_apply(self):
        T = se3.exp(rand_xi(4))
        X = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
        Y = se3.apply(T, X)
        Xh = jnp.concatenate([X, jnp.ones((4, 1))], axis=-1)
        Y2 = (T @ Xh[..., None])[..., :3, 0]
        np.testing.assert_allclose(np.asarray(Y), np.asarray(Y2), atol=1e-6)

    def test_quat_roundtrip(self):
        R = se3.exp(rand_xi(32))[:, :3, :3]
        q = se3.quat_from_mat(R)
        R2 = se3.mat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)

    def test_quat_near_pi(self):
        w = jnp.array([[3.1415, 0.001, 0.0]], jnp.float32)
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(32, 7)) * 0.5, jnp.float32)
        S = sim3.exp(xi)
        xi2 = sim3.log(S)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-5)

    def test_compose_apply(self):
        a = jnp.asarray(RNG.normal(size=(8, 7)) * 0.3, jnp.float32)
        b = jnp.asarray(RNG.normal(size=(8, 7)) * 0.3, jnp.float32)
        A, B = sim3.exp(a), sim3.exp(b)
        X = jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32)
        lhs = sim3.apply(sim3.compose(A, B), X)
        rhs = sim3.apply(A, sim3.apply(B, X))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)

    def test_inv(self):
        a = jnp.asarray(RNG.normal(size=(8, 7)) * 0.3, jnp.float32)
        A = sim3.exp(a)
        X = jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32)
        Y = sim3.apply(sim3.inv(A), sim3.apply(A, X))
        np.testing.assert_allclose(np.asarray(Y), np.asarray(X), atol=1e-5)

    def test_pack_unpack(self):
        a = jnp.asarray(RNG.normal(size=(8, 7)) * 0.3, jnp.float32)
        A = sim3.exp(a)
        B = sim3.unpack(sim3.pack(A))
        for x, y in zip(A, B):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)

    def test_se3_special_case(self):
        """sigma=0 Sim3 must match SE3."""
        xi6 = rand_xi(8, 0.5)
        xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
        R, t, s = sim3.exp(xi7)
        T = se3.exp(xi6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(T[:, :3, :3]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(T[:, :3, 3]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s), np.ones(8), atol=1e-6)


CAM = camera.StereoCamera(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                          bf=386.1448, width=1241, height=376)


class TestCamera:
    def test_project_backproject(self):
        z = jnp.asarray(RNG.uniform(2, 50, size=(64,)), jnp.float32)
        uv = jnp.asarray(
            RNG.uniform([0, 0], [CAM.width, CAM.height], size=(64, 2)), jnp.float32
        )
        X = camera.backproject(CAM, uv, z)
        uvr = camera.project_stereo(CAM, X)
        np.testing.assert_allclose(np.asarray(uvr[:, :2]), np.asarray(uv), atol=1e-3)
        depth = camera.disparity_to_depth(CAM, uvr[:, 0], uvr[:, 2])
        np.testing.assert_allclose(np.asarray(depth), np.asarray(z), rtol=1e-4)


class TestLines:
    def rand_line(self, n):
        P = RNG.normal(size=(n, 3)) * 3 + np.array([0, 0, 10.0])
        d = RNG.normal(size=(n, 3))
        return jnp.asarray(P, jnp.float32), jnp.asarray(d, jnp.float32)

    def test_minimal_codec_roundtrip(self):
        P, d = self.rand_line(32)
        X0, du = lines.closest_point_form(P, d)
        q, alpha = lines.minimal_from_x0dir(X0, du)
        X0b, db = lines.x0dir_from_minimal(q, alpha)
        np.testing.assert_allclose(np.asarray(X0b), np.asarray(X0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(du), atol=1e-5)

    def test_plucker_roundtrip(self):
        P, d = self.rand_line(32)
        X0, du = lines.closest_point_form(P, d)
        L = lines.plucker_from_x0dir(X0, du)
        X0b, db = lines.x0dir_from_plucker(L)
        np.testing.assert_allclose(np.asarray(X0b), np.asarray(X0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(du), atol=1e-5)

    def test_projection_residual_zero_on_line(self):
        """Points sampled on the 3D line project onto the projected line eq."""
        P, d = self.rand_line(16)
        X0, du = lines.closest_point_form(P, d)
        T = se3.exp(rand_xi(16, 0.1))
        # two points on the line, projected through the same camera
        for s1, s2 in [(0.0, 1.0), (-2.0, 3.0)]:
            Xa = se3.apply(T, X0 + s1 * du)
            Xb = se3.apply(T, X0 + s2 * du)
            pa = camera.project(CAM, Xa)
            pb = camera.project(CAM, Xb)
            r = lines.endpoint_residual(CAM, T, X0, du, pa, pb)
            np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-2)

    def test_two_view_triangulation_roundtrip(self):
        # Wide-baseline geometry: the reference's 0.975 parallel-plane guard
        # (vgl.cc:85, ~12.8 deg dihedral minimum) rejects narrow baselines.
        P = RNG.normal(size=(16, 3)) * 2 + np.array([0, 0, 5.0])
        d = RNG.normal(size=(16, 3))
        P, d = jnp.asarray(P, jnp.float32), jnp.asarray(d, jnp.float32)
        X0, du = lines.closest_point_form(P, d)
        T1 = se3.identity((16,))
        T2 = se3.exp(jnp.tile(jnp.array([[2.0, 0.3, 0.0, 0.0, 0.2, 0.0]]), (16, 1)))
        # observe: project two points on each view
        def obs(T):
            pa = camera.project(CAM, se3.apply(T, X0 - du))
            pb = camera.project(CAM, se3.apply(T, X0 + du))
            return lines.plane_normal_from_obs(CAM, T, pa, pb)
        n1, c1 = obs(T1)
        n2, c2 = obs(T2)
        X0t, dt, ok = lines.triangulate_two_view(n1, c1, n2, c2)
        ok = np.asarray(ok)
        # Lines near-parallel to the baseline are genuinely degenerate under
        # the 0.975 guard; random directions leave a decent fraction valid.
        assert ok.sum() >= 3
        X0t, dt = np.asarray(X0t), np.asarray(dt)
        X0n, dn = np.asarray(X0), np.asarray(du)
        # direction up to sign
        dots = np.abs(np.sum(dt * dn, axis=-1))
        np.testing.assert_allclose(dots[ok], 1.0, atol=1e-3)
        np.testing.assert_allclose(X0t[ok], X0n[ok], atol=5e-2)

    def test_multi_view_triangulation(self):
        P, d = self.rand_line(8)
        X0, du = lines.closest_point_form(P, d)
        poses = [se3.identity((8,))]
        for k in range(3):
            poses.append(
                se3.exp(
                    jnp.tile(
                        jnp.array([[0.4 * (k + 1), 0.1 * k, 0.0, 0.0, 0.03 * k, 0.0]]),
                        (8, 1),
                    )
                )
            )
        ns, cs = [], []
        for T in poses:
            pa = camera.project(CAM, se3.apply(T, X0 - du))
            pb = camera.project(CAM, se3.apply(T, X0 + du))
            n, c = lines.plane_normal_from_obs(CAM, T, pa, pb)
            ns.append(n)
            cs.append(c)
        N = jnp.stack(ns, axis=1)
        C = jnp.stack(cs, axis=1)
        mask = jnp.ones((8, 4), bool)
        X0t, dt, ok = lines.triangulate_multi_view(N, C, mask)
        ok = np.asarray(ok)
        assert ok.all()
        dots = np.abs(np.sum(np.asarray(dt) * np.asarray(du), axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(X0t), np.asarray(X0), atol=5e-2)

    def test_endpoints_3d_roundtrip(self):
        P, d = self.rand_line(8)
        X0, du = lines.closest_point_form(P, d)
        T = se3.exp(rand_xi(8, 0.1))
        E1 = X0 - 0.7 * du
        E2 = X0 + 1.3 * du
        p1 = camera.project(CAM, se3.apply(T, E1))
        p2 = camera.project(CAM, se3.apply(T, E2))
        R1, R2 = lines.endpoints_3d(X0, du, T, CAM, p1, p2)
        np.testing.assert_allclose(np.asarray(R1), np.asarray(E1), atol=1e-2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(E2), atol=1e-2)

    def test_hough_coords_range(self):
        p1 = jnp.asarray(RNG.uniform([0, 0], [1241, 376], size=(64, 2)), jnp.float32)
        p2 = jnp.asarray(RNG.uniform([0, 0], [1241, 376], size=(64, 2)), jnp.float32)
        diag = float(np.hypot(1241, 376))
        di, ai = lines.hough_coords(p1, p2, diag)
        assert (np.asarray(di) >= 0).all() and (np.asarray(di) < lines.DIST_CELLS).all()
        assert (np.asarray(ai) >= 0).all() and (np.asarray(ai) < lines.ANG_CELLS).all()
