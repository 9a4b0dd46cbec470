"""Place recognition (loop/bow.py, loop/database.py), Sim3 RANSAC
(optim/sim3_solver.py) and Sim3 pose-graph optimization (optim/pose_graph.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.geometry import se3, sim3
from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.loop.bow import Vocabulary
from lldslam_tpu.loop.database import KeyFrameDatabase, l1_score
from lldslam_tpu.optim import pose_graph, sim3_solver

CAM = StereoCamera(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0,
                   width=640, height=480)


def _descs(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint64).astype(np.uint32)


def _perturb(rng, descs, n_bits):
    """Flip n_bits random bits in each descriptor."""
    out = descs.copy()
    for i in range(len(out)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            out[i, w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
    return out


class TestBow:
    def test_train_and_transform(self):
        rng = np.random.default_rng(0)
        corpus = _descs(rng, 2000)
        voc = Vocabulary.train(corpus, k=8, L=3, seed=0)
        assert voc.n_words > 50
        words = voc.transform_words(corpus[:100])
        assert words.shape == (100,)
        assert (words >= 0).all() and (words < voc.n_words).all()
        # transform is the Hamming-nearest walk: identical descriptors map
        # to identical words
        words2 = voc.transform_words(corpus[:100])
        assert (words == words2).all()

    def test_similar_frames_score_higher(self):
        rng = np.random.default_rng(1)
        corpus = _descs(rng, 3000)
        voc = Vocabulary.train(corpus, k=8, L=3, seed=0)
        frame_a = corpus[:300]
        frame_a2 = _perturb(rng, frame_a, 8)   # same place, slight noise
        frame_b = corpus[1000:1300]            # different place
        ia, va = voc.bow_vector(frame_a)
        ia2, va2 = voc.bow_vector(frame_a2)
        ib, vb = voc.bow_vector(frame_b)
        s_same = l1_score(ia, va, ia2, va2)
        s_diff = l1_score(ia, va, ib, vb)
        assert s_same > 2 * s_diff

    def test_database_loop_candidates(self):
        rng = np.random.default_rng(2)
        corpus = _descs(rng, 3000)
        voc = Vocabulary.train(corpus, k=8, L=3, seed=0)
        db = KeyFrameDatabase(voc)
        frames = [corpus[i * 300:(i + 1) * 300] for i in range(6)]
        # KF 5 revisits KF 1's place
        frames.append(_perturb(rng, frames[1], 6))
        for i, f in enumerate(frames):
            ids, vals = voc.bow_vector(f)
            db.add(i, ids, vals)
        cands = db.detect_loop_candidates(
            6, min_score=0.01, connected={5}, covis_groups={})
        assert 1 in cands

    def test_reloc_candidates(self):
        rng = np.random.default_rng(3)
        corpus = _descs(rng, 3000)
        voc = Vocabulary.train(corpus, k=8, L=3, seed=0)
        db = KeyFrameDatabase(voc)
        frames = [corpus[i * 300:(i + 1) * 300] for i in range(5)]
        for i, f in enumerate(frames):
            ids, vals = voc.bow_vector(f)
            db.add(i, ids, vals)
        q = _perturb(rng, frames[2], 6)
        ids, vals = voc.bow_vector(q)
        cands = db.detect_reloc_candidates(ids, vals)
        assert 2 in cands


class TestSim3Solver:
    def test_horn_exact(self):
        rng = np.random.default_rng(0)
        R_true = np.asarray(se3.exp(jnp.asarray(
            np.array([0, 0, 0, 0.1, -0.2, 0.15], np.float32))))[:3, :3]
        t_true = np.array([0.5, -1.0, 2.0], np.float32)
        P2 = rng.uniform(-5, 5, (10, 3)).astype(np.float32)
        P1 = (R_true @ P2.T).T + t_true
        R, t, s = sim3_solver.horn_sim3(jnp.asarray(P1), jnp.asarray(P2))
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)
        assert abs(float(s) - 1.0) < 1e-6

    def test_horn_with_scale(self):
        rng = np.random.default_rng(1)
        P2 = rng.uniform(-5, 5, (12, 3)).astype(np.float32)
        P1 = 1.7 * P2 + np.array([1.0, 0.0, -2.0], np.float32)
        R, t, s = sim3_solver.horn_sim3(
            jnp.asarray(P1), jnp.asarray(P2), fix_scale=False)
        assert abs(float(s) - 1.7) < 1e-4

    def test_ransac_with_outliers(self):
        rng = np.random.default_rng(2)
        n = 60
        R_true = np.asarray(se3.exp(jnp.asarray(
            np.array([0, 0, 0, 0.05, 0.1, -0.02], np.float32))))[:3, :3]
        t_true = np.array([0.3, 0.1, 0.5], np.float32)
        # points in front of both cameras
        P2 = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                       rng.uniform(5, 15, n)], -1).astype(np.float32)
        P1 = (R_true @ P2.T).T + t_true
        # 30% outliers
        out = rng.uniform(size=n) < 0.3
        P1[out] += rng.uniform(1.0, 3.0, (out.sum(), 3)).astype(np.float32)

        def proj(P):
            return np.stack([CAM.fx * P[:, 0] / P[:, 2] + CAM.cx,
                             CAM.fy * P[:, 1] / P[:, 2] + CAM.cy], -1)
        uv1 = proj((R_true @ P2.T).T + t_true)  # true observations in cam1
        uv2 = proj(P2)
        (R, t, s), inl, n_inl = sim3_solver.ransac_sim3(
            CAM, CAM, jnp.asarray(P1), jnp.asarray(P2),
            jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(n), jnp.ones(n), jnp.ones(n, bool),
            jax.random.PRNGKey(0))
        assert int(n_inl) >= 0.9 * (~out).sum()
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-2)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=5e-2)


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        """Circle trajectory with drifty odometry edges + one exact loop edge:
        optimization pulls the chain back to consistency."""
        rng = np.random.default_rng(0)
        K = 24
        # ground truth: poses on a circle, Sim3 with s=1
        gt = []
        for i in range(K):
            th = 2 * np.pi * i / K
            xi = np.array([5 * np.cos(th), 5 * np.sin(th), 0.0, 0, 0, th],
                          np.float32)
            gt.append(np.asarray(se3.exp(jnp.asarray(xi))))
        gt = np.stack(gt)

        # noisy sequential edges, exact loop edge K-1 -> 0
        e_i, e_j, mR, mt, ms = [], [], [], [], []

        def add_edge(i, j, noise):
            Ti = gt[i].copy()
            Tj = gt[j].copy()
            M = Ti @ np.linalg.inv(Tj)
            if noise:
                xi = rng.normal(0, 0.05, 6).astype(np.float32)
                xi[3:] = rng.normal(0, 0.01, 3)
                M = np.asarray(se3.exp(jnp.asarray(xi))) @ M
            e_i.append(i); e_j.append(j)
            mR.append(M[:3, :3]); mt.append(M[:3, 3]); ms.append(1.0)

        for i in range(1, K):
            add_edge(i, i - 1, noise=True)
        add_edge(0, K - 1, noise=False)  # loop edge

        # initial estimate: integrate the noisy chain
        est = [gt[0]]
        for i in range(1, K):
            M = np.eye(4, dtype=np.float32)
            M[:3, :3] = mR[i - 1]; M[:3, 3] = mt[i - 1]
            est.append(M @ est[i - 1])
        est = np.stack(est)

        g = pose_graph.PoseGraph(
            R=jnp.asarray(est[:, :3, :3]),
            t=jnp.asarray(est[:, :3, 3]),
            s=jnp.ones(K),
            fixed=jnp.asarray(np.arange(K) == 0),
            e_i=jnp.asarray(np.array(e_i, np.int32)),
            e_j=jnp.asarray(np.array(e_j, np.int32)),
            m_R=jnp.asarray(np.stack(mR)),
            m_t=jnp.asarray(np.stack(mt)),
            m_s=jnp.asarray(np.array(ms, np.float32)),
            e_valid=jnp.ones(len(e_i), bool),
        )
        err0 = float(pose_graph.total_error(g))
        g_opt = pose_graph.optimize_pose_graph(g, iters=15, cg_iters=32)
        err1 = float(pose_graph.total_error(g_opt))
        assert err1 < 0.1 * err0
        # loop endpoints consistent: S_{K-1} vs S_0 through the loop edge
        R_opt = np.asarray(g_opt.R)
        t_opt = np.asarray(g_opt.t)
        # chain drift before optimization is visible at the last pose
        drift_before = np.linalg.norm(est[K - 1][:3, 3] - gt[K - 1][:3, 3])
        drift_after = np.linalg.norm(t_opt[K - 1] - gt[K - 1][:3, 3])
        assert drift_after < 0.5 * drift_before


class TestRefineSim3:
    def test_refine_improves_noisy_ransac_estimate(self):
        rng = np.random.default_rng(5)
        n = 80
        R_true = np.asarray(se3.exp(jnp.asarray(
            np.array([0, 0, 0, 0.08, -0.05, 0.12], np.float32))))[:3, :3]
        t_true = np.array([0.4, -0.2, 0.3], np.float32)
        P2 = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                       rng.uniform(5, 15, n)], -1).astype(np.float32)
        P1 = (R_true @ P2.T).T + t_true

        def proj(P):
            return np.stack([CAM.fx * P[:, 0] / P[:, 2] + CAM.cx,
                             CAM.fy * P[:, 1] / P[:, 2] + CAM.cy], -1)
        uv1 = proj(P1).astype(np.float32)
        uv2 = proj(P2).astype(np.float32)
        # perturbed initial estimate
        dR = np.asarray(se3.exp(jnp.asarray(
            np.array([0, 0, 0, 0.01, -0.008, 0.012], np.float32))))[:3, :3]
        R0 = dR @ R_true
        t0 = t_true + np.array([0.05, -0.03, 0.02], np.float32)
        (R, t, s), inl, n_in = sim3_solver.refine_sim3(
            CAM, CAM, (jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(1.0)),
            jnp.asarray(P1), jnp.asarray(P2), jnp.asarray(uv1),
            jnp.asarray(uv2), jnp.ones(n), jnp.ones(n), jnp.ones(n, bool))
        assert int(n_in) > 0.95 * n
        np.testing.assert_allclose(np.asarray(R), R_true, atol=2e-3)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-2)
