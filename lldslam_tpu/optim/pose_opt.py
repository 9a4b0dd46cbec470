"""Pose-only optimization: batched Gauss-Newton/LM with Huber IRLS and
round-based inlier reclassification.

Replaces `Optimizer::PoseOptimization` (reference src/Optimizer.cc:653-931):
- 4 rounds x 10 LM iterations on the single frame pose,
- mono/stereo point edges with per-octave information invSigma2,
- line edges (fixed line geometry, pose-only: EdgeSE3ProjectLineOnlyPose,
  types_six_dof_expmap.h:388-429): 2 edges per stereo line observation (left +
  right camera with baseline shift b = (-baseline, 0, 0), LineOptimizer.cc:72-77),
  information gamma^2 / LinePyrFactor^(2*octave) (LineOptimizer.cc:97-101,
  LinePyrFactor = 1.44, LineMatching.cc:27), Huber delta gamma-scaled
  (Optimizer.cc:700-708),
- after each round every edge is reclassified by chi2 against
  5.991 (mono) / 7.815 (stereo) / gamma^2-scaled (lines); outliers get zero
  weight next round but may return (Optimizer.cc:855-907 semantics).

All loops are `lax.fori_loop`s with fixed trip counts; data-dependent accept/
reject uses arithmetic `where`, so the whole solver jits to one XLA program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import se3, lines as glines
from ..geometry.camera import StereoCamera
from . import residuals as res

LINE_PYR_FACTOR = 1.44  # LineMatching.cc:27 (LinePyrFactor)


class PointPoseObs(NamedTuple):
    """Fixed-capacity point observations for one frame."""

    X: jnp.ndarray           # (N, 3) world points
    obs: jnp.ndarray         # (N, 3) (uL, v, uR); uR ignored when not stereo
    inv_sigma2: jnp.ndarray  # (N,) per-octave information
    is_stereo: jnp.ndarray   # (N,) bool
    valid: jnp.ndarray       # (N,) bool


class LinePoseObs(NamedTuple):
    """Fixed-capacity line observations (fixed 3D geometry) for one frame."""

    X0: jnp.ndarray       # (M, 3) world closest point
    d: jnp.ndarray        # (M, 3) world unit direction
    x1_l: jnp.ndarray     # (M, 2) observed left endpoints
    x2_l: jnp.ndarray     # (M, 2)
    x1_r: jnp.ndarray     # (M, 2) observed right endpoints
    x2_r: jnp.ndarray     # (M, 2)
    octave: jnp.ndarray   # (M,) int32
    has_right: jnp.ndarray  # (M,) bool (stereo observation present)
    valid: jnp.ndarray    # (M,) bool


def _point_terms(cam, T, p: PointPoseObs, inlier, delta_m2, delta_s2):
    r = res.point_residual_stereo(cam, T, p.X, p.obs)          # (N, 3)
    Jp, _, _ = res.point_jacobians_stereo(cam, T, p.X)         # (N, 3, 6)
    stereo = p.is_stereo
    # mono: zero out the uR row
    row_w = jnp.where(stereo[:, None], 1.0, jnp.array([1.0, 1.0, 0.0])[None, :])
    chi2 = p.inv_sigma2 * jnp.sum(r * r * row_w, axis=-1)
    delta_sq = jnp.where(stereo, delta_s2, delta_m2)
    w = p.inv_sigma2 * res.huber_weight(chi2, delta_sq) * inlier
    W = (w[:, None] * row_w)  # (N, 3) per-row weights
    H = jnp.einsum("nri,nr,nrj->ij", Jp, W, Jp)
    b = -jnp.einsum("nri,nr,nr->i", Jp, W, r)  # GN rhs: -J^T W r
    cost = jnp.sum(res.huber_rho(chi2, delta_sq) * inlier)
    return H, b, cost, chi2


def _line_terms(cam, T, l: LinePoseObs, inlier, gamma):
    info = (gamma * gamma) / (LINE_PYR_FACTOR ** (2.0 * l.octave.astype(jnp.float32)))
    delta_s2 = res.CHI2_STEREO * gamma * gamma
    delta_m2 = res.CHI2_MONO * gamma * gamma
    T_r = glines.right_camera_pose(T, cam.baseline)

    def terms_for(T_cam, x1, x2):
        r = glines.endpoint_residual(cam, T_cam, l.X0, l.d, x1, x2)  # (M, 2)
        # Jacobian wrt pose tangent via jacfwd on the increment around zero
        def f(eps):
            return glines.endpoint_residual(
                cam, se3.exp(eps)[None] @ T_cam, l.X0, l.d, x1, x2
            )
        J = jax.jacfwd(f)(jnp.zeros(6, T.dtype))  # (M, 2, 6)
        return r, J

    r_l, J_l = terms_for(T, l.x1_l, l.x2_l)
    r_r, J_r = terms_for(T_r, l.x1_r, l.x2_r)
    delta_sq = jnp.where(l.has_right, delta_s2, delta_m2)

    def accum(r, J, active):
        chi2 = info * jnp.sum(r * r, axis=-1)
        w = info * res.huber_weight(chi2, delta_sq) * active
        H = jnp.einsum("mri,m,mrj->ij", J, w, J)
        b = -jnp.einsum("mri,m,mr->i", J, w, r)  # GN rhs: -J^T W r
        cost = jnp.sum(res.huber_rho(chi2, delta_sq) * active)
        return H, b, cost, chi2

    Hl, bl, cl, chi2_l = accum(r_l, J_l, inlier)
    Hr, br, cr, chi2_r = accum(r_r, J_r, inlier * l.has_right)
    chi2 = chi2_l + jnp.where(l.has_right, chi2_r, 0.0)
    return Hl + Hr, bl + br, cl + cr, chi2, delta_sq


@partial(jax.jit, static_argnames=("cam", "rounds", "iters"))
def optimize_pose(
    cam: StereoCamera,
    T_init: jnp.ndarray,
    pts: PointPoseObs,
    lns: Optional[LinePoseObs] = None,
    gamma: float = 0.5,
    rounds: int = 4,
    iters: int = 10,
):
    """Returns (T_opt, point_inlier_mask, line_inlier_mask, n_inliers)."""
    delta_m2 = res.CHI2_MONO
    delta_s2 = res.CHI2_STEREO
    pt_in = pts.valid.astype(jnp.float32)
    ln_in = (
        lns.valid.astype(jnp.float32)
        if lns is not None
        else jnp.zeros((0,), jnp.float32)
    )

    def lm_round(carry, _):
        T, pt_in, ln_in = carry

        def body(i, state):
            T, lam = state
            H, b, cost, _ = _point_terms(cam, T, pts, pt_in, delta_m2, delta_s2)
            if lns is not None:
                Hl, bl, cl, _, _ = _line_terms(cam, T, lns, ln_in, gamma)
                H, b, cost = H + Hl, b + bl, cost + cl
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=T.dtype)
            dx = jnp.linalg.solve(Hd, b)
            T_new = se3.exp(dx) @ T
            _, _, cost_new, _ = _point_terms(cam, T_new, pts, pt_in, delta_m2, delta_s2)
            if lns is not None:
                _, _, cl2, _, _ = _line_terms(cam, T_new, lns, ln_in, gamma)
                cost_new = cost_new + cl2
            accept = cost_new < cost
            T = jnp.where(accept, T_new, T)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e3)
            return (T, lam)

        T, _ = jax.lax.fori_loop(0, iters, body, (T, jnp.asarray(1e-5, T.dtype)))

        # reclassify
        _, _, _, chi2 = _point_terms(cam, T, pts, pts.valid.astype(jnp.float32), delta_m2, delta_s2)
        th = jnp.where(pts.is_stereo, delta_s2, delta_m2)
        pt_in = (pts.valid & (chi2 <= th)).astype(jnp.float32)
        if lns is not None:
            _, _, _, chi2_l, th_l = _line_terms(cam, T, lns, lns.valid.astype(jnp.float32), gamma)
            ln_in = (lns.valid & (chi2_l <= 2.0 * th_l)).astype(jnp.float32)
        return (T, pt_in, ln_in), None

    (T, pt_in, ln_in), _ = jax.lax.scan(
        lm_round, (T_init, pt_in, ln_in), None, length=rounds
    )
    n_inliers = jnp.sum(pt_in).astype(jnp.int32)
    return T, pt_in > 0, ln_in > 0, n_inliers
