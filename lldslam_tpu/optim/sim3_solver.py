"""Sim(3) relative pose: batched Horn closed form + all-hypotheses RANSAC.

Replaces `Sim3Solver` (reference src/Sim3Solver.cc): Horn 1987 absolute
orientation (centroids, M = Pr1 Pr2^T, 4x4 N-matrix top eigenvector ->
quaternion, Sim3Solver.cc:226-308) inside RANSAC over 3-point minimal sets
(:130-207). The reference iterates sequentially with adaptive termination;
on TPU every hypothesis is solved and scored in one batched program
(vmap over hypotheses, one (H, N) reprojection pass), then argmax —
the SURVEY.md §7 "sample all hypotheses in parallel" pattern.

Scale is fixed to 1 for stereo (`bFixScale`, LoopClosing.cc:276).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.camera import StereoCamera


def horn_sim3(P1: jnp.ndarray, P2: jnp.ndarray, fix_scale: bool = True):
    """Closed-form S12 = (R, t, s) aligning P2 -> P1 (both (N, 3), N >= 3).

    Horn's quaternion method (Sim3Solver::ComputeSim3, Sim3Solver.cc:226-308).
    """
    c1 = P1.mean(axis=-2)
    c2 = P2.mean(axis=-2)
    Pr1 = P1 - c1[..., None, :]
    Pr2 = P2 - c2[..., None, :]
    # M = sum Pr2 Pr1^T (Sim3Solver.cc:238: P2 * P1.t()): with the N-matrix
    # below this yields R s.t. X1 = R X2; the Pr1 Pr2^T transpose yields R^T
    # (caught by a real-rotation EPnP test; earlier tests used identity
    # rotations via a tangent-ordering mixup and missed it)
    M = jnp.einsum("...ni,...nj->...ij", Pr2, Pr1)
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
        jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], -2)
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., -1]  # top eigenvector: (w, x, y, z)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
    P3 = jnp.einsum("...ij,...nj->...ni", R, Pr2)
    if fix_scale:
        s = jnp.ones(P1.shape[:-2], P1.dtype)
    else:
        # s = <Pr1, R Pr2> / ||R Pr2||^2 (Sim3Solver.cc:292-303)
        num = jnp.sum(Pr1 * P3, axis=(-2, -1))
        den = jnp.sum(P3 * P3, axis=(-2, -1))
        s = num / jnp.maximum(den, 1e-12)
    t = c1 - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2)
    return R, t, s


def _project(cam: StereoCamera, X: jnp.ndarray) -> jnp.ndarray:
    z = jnp.maximum(X[..., 2], 1e-6)
    u = cam.fx * X[..., 0] / z + cam.cx
    v = cam.fy * X[..., 1] / z + cam.cy
    return jnp.stack([u, v], -1)


@partial(jax.jit, static_argnames=("cam1", "cam2", "fix_scale", "n_hyp"))
def ransac_sim3(
    cam1: StereoCamera,
    cam2: StereoCamera,
    P1: jnp.ndarray,        # (N, 3) matched points in KF1 camera coords
    P2: jnp.ndarray,        # (N, 3) matched points in KF2 camera coords
    uv1: jnp.ndarray,       # (N, 2) observed pixels in KF1
    uv2: jnp.ndarray,       # (N, 2) observed pixels in KF2
    sigma2_1: jnp.ndarray,  # (N,) per-match sigma^2 (octave scale)
    sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,     # (N,) bool
    key: jax.Array,
    fix_scale: bool = True,
    n_hyp: int = 256,
):
    """All-hypotheses Sim3 RANSAC. Returns ((R, t, s) best S12, inlier mask,
    n_inliers). Inlier check mirrors Sim3Solver::CheckInliers
    (Sim3Solver.cc:310-336): bidirectional reprojection with chi2 9.210."""
    N = P1.shape[0]
    # 3 distinct indices per hypothesis among valid entries
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, N, shape=(n_hyp, 3), replace=True, p=p)
    R, t, s = horn_sim3(P1[idx], P2[idx], fix_scale=fix_scale)  # (H, ...)

    # score: project P2 through S12 into cam1 and P1 through S21 into cam2
    X1 = s[:, None, None] * jnp.einsum("hij,nj->hni", R, P2) + t[:, None, :]
    err1 = jnp.sum((_project(cam1, X1) - uv1[None]) ** 2, -1) / sigma2_1[None]
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    X2 = s_inv[:, None, None] * jnp.einsum(
        "hij,hnj->hni", Rt, P1[None] - t[:, None, :])
    err2 = jnp.sum((_project(cam2, X2) - uv2[None]) ** 2, -1) / sigma2_2[None]
    inl = (err1 < 9.210) & (err2 < 9.210) & valid[None]
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    return (R[best], t[best], s[best]), inl[best], scores[best]
