"""Multi-device sharded BA (parallel/sharded_ba.py) on the 8-device CPU mesh.

Validates the SURVEY.md §5.7/§5.8 scale-out design: observation-sharded
normal-equation build must produce the same solution as the single-device
solver (collectives are a layout detail, not a math change)."""
import numpy as np
import pytest
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

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    def run_once():
        # free-port pick is TOCTOU-racy (another process can grab it before
        # the coordinator binds) -> retried by the caller on failure
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable,
                 os.path.join(root, "tools", "dist_worker.py"),
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
        return procs, outs

    for attempt in range(3):
        procs, outs = run_once()
        if all(pr.returncode == 0 for pr in procs):
            break
        bindfail = any("Address already in use" in o
                       or "Failed to bind" in o for o in outs)
        if not bindfail or attempt == 2:
            break
    for i, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {i} failed:\n{out}"
        assert "DIST OK" in out, f"proc {i} missing DIST OK:\n{out}"


@pytest.mark.slow
def test_global_ba_dist_matches_single():
    """LoopCloser.global_ba routed through the landmark-sharded dist_schur
    path (8-device mesh) matches the single-device CG path on the same map
    (SURVEY.md §5.7 — the distributed solver wired into the system)."""
    import numpy as np
    from lldslam_tpu.config import CameraConfig, SlamConfig, TrackingConfig
    from lldslam_tpu.loop.closing import LoopCloser
    from lldslam_tpu.loop.bow import Vocabulary
    from lldslam_tpu.ops.orb import OrbConfig
    from lldslam_tpu.slammap.map_store import MapStore

    rng = np.random.default_rng(5)
    cam_cfg = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=120.0, bf=200.0,
                           width=640, height=240)
    cfg = SlamConfig(camera=cam_cfg, orb=OrbConfig(n_features=256),
                     tracking=TrackingConfig())
    cam = cam_cfg.stereo_camera()

    def build_store():
        s = MapStore(cam, cfg.orb)
        K, P = 6, 500
        pts = np.stack([rng2.uniform(-8, 8, P), rng2.uniform(-3, 3, P),
                        rng2.uniform(6, 30, P)], -1).astype(np.float32)
        for k in range(K):
            T = np.eye(4, dtype=np.float32)
            T[2, 3] = -k * 0.4
            Xc = (T[:3, :3] @ pts.T).T + T[:3, 3]
            u = cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx
            v = cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy
            ur = u - cam.bf / Xc[:, 2]
            vis = (Xc[:, 2] > 1) & (u > 5) & (u < 635) & (v > 5) & (v < 235)
            sel = np.nonzero(vis)[0][: s.n_kp]
            feats = dict(
                xy=np.zeros((s.n_kp, 2), np.float32),
                ur=np.full(s.n_kp, -1.0, np.float32),
                octave=np.zeros(s.n_kp, np.int32),
                angle=np.zeros(s.n_kp, np.float32),
                desc=rng2.integers(0, 2**32, (s.n_kp, 8),
                                   dtype=np.uint32),
                valid=np.zeros(s.n_kp, bool))
            feats["xy"][: len(sel)] = np.stack([u[sel], v[sel]], -1) \
                + rng2.normal(0, 0.3, (len(sel), 2))
            feats["ur"][: len(sel)] = ur[sel]
            feats["valid"][: len(sel)] = True
            depth = np.full(s.n_kp, -1.0, np.float32)
            depth[: len(sel)] = Xc[sel, 2]
            kf = s.add_keyframe(T, feats, depth,
                                np.full(s.n_kp, -1, np.int32), k)
            if k == 0:
                ids = s.create_points(
                    kf, np.arange(len(sel)),
                    (pts[sel] + rng2.normal(0, 0.05, (len(sel), 3))
                     ).astype(np.float32))
                first_sel, first_ids = sel, ids
            else:
                # re-observe the same world points
                lut = {int(pp): int(ii)
                       for pp, ii in zip(first_sel, first_ids)}
                for j, pp in enumerate(sel):
                    if int(pp) in lut:
                        s.kf_pt_ids[kf, j] = lut[int(pp)]
                s.mark_obs_dirty()
        s.refresh_obs_counts()
        return s

    voc = Vocabulary.train(
        rng.integers(0, 2**32, (512, 8), dtype=np.uint32), k=4, L=2)
    rng2 = np.random.default_rng(7)
    s1 = build_store()
    rng2 = np.random.default_rng(7)
    s2 = build_store()
    c1 = LoopCloser(s1, voc, cfg)
    c2 = LoopCloser(s2, voc, cfg)
    c1.global_ba(iters=4, cg_iters=16, force_dist=False)
    c2.global_ba(iters=4, cg_iters=16, force_dist=True)
    dp = np.abs(s1.kf_pose[:6] - s2.kf_pose[:6]).max()
    dx = np.abs(s1.pt_pos[:500] - s2.pt_pos[:500]).max()
    assert dp < 2e-3, dp
    assert dx < 2e-2, dx


def test_dist_joint_matches_single_device():
    """Joint pose+point+LINE distributed solve
    (dist_schur.dist_joint_ba_solve): both landmark classes sharded must
    reproduce the single-device joint CG solver
    (lines_ba.joint_ba_solve_cg) — the same problem the reference's global
    BA builds (Optimizer.cc:473 via AddLineMinimalGlobal :149)."""
    from test_lines_ba import CAM as LCAM, _make_problem
    from lldslam_tpu.optim import lines_ba
    from lldslam_tpu.parallel import dist_schur

    rng = np.random.default_rng(3)
    problem, *_ = _make_problem(rng, K=6, P=48, L=10)
    solved_1, _, _ = lines_ba.joint_ba_solve_cg(
        LCAM, problem, iters=3, cg_iters=16, gamma=0.5)

    mesh = dist_schur.make_mesh(4)
    djp, obs_src, lobs_src = dist_schur.make_dist_joint_problem(problem, 4)
    djp = dist_schur.place_joint(djp, mesh)
    poses_d, points_d, q_d, a_d, chi2_d = dist_schur.dist_joint_ba_solve(
        LCAM, djp, mesh, iters=3, cg_iters=16, gamma=0.5)
    np.testing.assert_allclose(np.asarray(poses_d),
                               np.asarray(solved_1.base.poses), atol=3e-4)
    P = problem.base.points.shape[0]
    np.testing.assert_allclose(np.asarray(points_d)[:P],
                               np.asarray(solved_1.base.points), atol=3e-3)
    # line states come back in padded shard order; compare decoded geometry
    from lldslam_tpu.geometry import lines as gl
    L = problem.q.shape[0]
    X0_d, d_d = gl.x0dir_from_minimal(jnp.asarray(np.asarray(q_d)[:L]),
                                      jnp.asarray(np.asarray(a_d)[:L]))
    X0_1, d_1 = gl.x0dir_from_minimal(solved_1.q, solved_1.alpha)
    np.testing.assert_allclose(np.asarray(X0_d), np.asarray(X0_1), atol=5e-3)
    dd = np.abs(np.sum(np.asarray(d_d) * np.asarray(d_1), axis=-1))
    assert dd.min() > 1 - 1e-5

    # the sharded layout is real: line states live one block per device
    assert not djp.q.sharding.is_fully_replicated
    assert not djp.lobs.x1l.sharding.is_fully_replicated
