"""Perspective-n-Point: batched EPnP inside all-hypotheses RANSAC.

Replaces `PnPsolver` (reference src/PnPsolver.cc): EPnP (Lepetit 2009 —
4 control points, barycentric coordinates, null-space betas; PnPsolver.cc:
257-441) wrapped in RANSAC over minimal 4-point sets (:164-236). The
reference iterates hypotheses sequentially with adaptive termination; here
every hypothesis runs in one batched program (vmap over hypotheses: batched
8x12 SVD + closed-form beta + Horn alignment), scored by one (H, N)
reprojection pass — used only in relocalization (Tracking.cc:1881-1907).

Only the N=1 beta case is solved closed-form (the dominant case; the
reference's N=2,3 cases are Gauss-Newton refinements of the same seed —
here the subsequent robust pose optimization plays that role).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.camera import StereoCamera
from .sim3_solver import horn_sim3


def _control_points(Pw: jnp.ndarray):
    """World control points: centroid + principal directions
    (PnPsolver::choose_control_points, PnPsolver.cc:260-290).
    Pw: (..., n, 3) -> (..., 4, 3)."""
    c0 = Pw.mean(axis=-2)
    Pc = Pw - c0[..., None, :]
    cov = jnp.einsum("...ni,...nj->...ij", Pc, Pc) / Pw.shape[-2]
    w, V = jnp.linalg.eigh(cov)  # ascending
    sig = jnp.sqrt(jnp.maximum(w, 1e-12))
    dirs = jnp.swapaxes(V, -1, -2) * sig[..., None]  # rows scaled
    return jnp.concatenate([c0[..., None, :], c0[..., None, :] + dirs], axis=-2)


def _barycentric(Pw: jnp.ndarray, C: jnp.ndarray):
    """alphas: (..., n, 4) with sum 1 (PnPsolver::compute_barycentric)."""
    B = jnp.swapaxes(C[..., 1:, :] - C[..., :1, :], -1, -2)  # (..., 3, 3)
    Binv = jnp.linalg.inv(B + 1e-9 * jnp.eye(3, dtype=Pw.dtype))
    a123 = jnp.einsum("...ij,...nj->...ni", Binv, Pw - C[..., :1, :])
    a0 = 1.0 - a123.sum(axis=-1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=-1)


def epnp(cam: StereoCamera, Pw: jnp.ndarray, uv: jnp.ndarray):
    """Single EPnP solve. Pw (..., n, 3) world points, uv (..., n, 2).
    Returns T_cw (..., 4, 4)."""
    C = _control_points(Pw)
    A = _barycentric(Pw, C)                        # (..., n, 4)
    n = Pw.shape[-2]
    fu, fv = cam.fx, cam.fy
    # M rows (PnPsolver::fill_M): per point, 2 rows over 12 unknowns
    du = cam.cx - uv[..., 0]                       # (..., n)
    dv = cam.cy - uv[..., 1]
    zeros = jnp.zeros_like(A)
    rows_u = jnp.stack([A * fu, zeros, A * du[..., None]], axis=-1)  # (...,n,4,3)
    rows_v = jnp.stack([zeros, A * fv, A * dv[..., None]], axis=-1)
    M = jnp.concatenate([
        rows_u.reshape(*Pw.shape[:-2], n, 12),
        rows_v.reshape(*Pw.shape[:-2], n, 12),
    ], axis=-2)                                     # (..., 2n, 12)
    _, _, Vt = jnp.linalg.svd(M, full_matrices=True)
    v = Vt[..., -1, :].reshape(*Pw.shape[:-2], 4, 3)  # null-space control pts

    # beta (N=1 case, PnPsolver::find_betas_approx_1 + scale from distances)
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    i0 = jnp.array([p[0] for p in pairs])
    i1 = jnp.array([p[1] for p in pairs])
    dv_cam = jnp.linalg.norm(v[..., i0, :] - v[..., i1, :], axis=-1)
    dc_w = jnp.linalg.norm(C[..., i0, :] - C[..., i1, :], axis=-1)
    beta = jnp.sum(dv_cam * dc_w, axis=-1) / jnp.maximum(
        jnp.sum(dv_cam * dv_cam, axis=-1), 1e-12)
    Xc_ctrl = beta[..., None, None] * v
    Pc = jnp.einsum("...ni,...ij->...nj", A, Xc_ctrl)  # camera-frame points
    # cheirality: flip if depths negative (PnPsolver::compute_ccs sign fix)
    flip = jnp.sum(Pc[..., 2], axis=-1) < 0
    Pc = jnp.where(flip[..., None, None], -Pc, Pc)
    # rigid world->camera from point correspondences (Horn, scale fixed)
    R, t, _ = horn_sim3(Pc, Pw, fix_scale=True)
    T = jnp.zeros(Pw.shape[:-2] + (4, 4), Pw.dtype)
    T = T.at[..., :3, :3].set(R).at[..., :3, 3].set(t).at[..., 3, 3].set(1.0)
    return T


@partial(jax.jit, static_argnames=("cam", "n_hyp"))
def ransac_pnp(
    cam: StereoCamera,
    Pw: jnp.ndarray,        # (N, 3) world points of candidate matches
    uv: jnp.ndarray,        # (N, 2) observed pixels
    sigma2: jnp.ndarray,    # (N,) per-octave sigma^2
    valid: jnp.ndarray,     # (N,) bool
    key: jax.Array,
    n_hyp: int = 256,
):
    """All-hypotheses EPnP RANSAC (PnPsolver::iterate semantics, per-octave
    chi2 < 5.991 sigma^2 inlier gate, PnPsolver.cc:120-156).
    Returns (T_cw best, inlier mask, n_inliers)."""
    N = Pw.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    # 6-point hypotheses: with 4-point minimal sets M's null space is
    # 4-dimensional and the N=1 beta case is invalid (the reference solves
    # the N=2,3 beta cases instead, PnPsolver.cc:340-441); 6 points give a
    # 1-dim null space and batching makes the larger sample free.
    idx = jax.random.choice(key, N, shape=(n_hyp, 6), replace=True, p=p)
    T = epnp(cam, Pw[idx], uv[idx])                 # (H, 4, 4)
    Xc = jnp.einsum("hij,nj->hni", T[:, :3, :3], Pw) + T[:, None, :3, 3]
    z = jnp.maximum(Xc[..., 2], 1e-6)
    u = cam.fx * Xc[..., 0] / z + cam.cx
    v = cam.fy * Xc[..., 1] / z + cam.cy
    err2 = ((u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2) / sigma2[None]
    inl = (err2 < 5.991) & (Xc[..., 2] > 0) & valid[None]
    finite = jnp.all(jnp.isfinite(T.reshape(n_hyp, -1)), axis=-1)
    scores = jnp.where(finite, inl.sum(-1), -1)
    best = jnp.argmax(scores)
    return T[best], inl[best], jnp.maximum(scores[best], 0)
