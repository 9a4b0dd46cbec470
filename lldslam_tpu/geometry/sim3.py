"""Batched Sim(3) operations for loop closure / essential-graph optimization.

Replaces g2o's `Sim3` type (reference: Thirdparty/g2o/g2o/types/sim3.h) and the
Sim3 vertex/edge machinery used by `Optimizer::OptimizeEssentialGraph` /
`OptimizeSim3` (src/Optimizer.cc:1391,1656).

Representation: a Sim3 element is the tuple of arrays `(R, t, s)` packed into a
(..., 8) vector [q(w,x,y,z), t(3), s] for storage, or handled as (R, t, s)
triples in compute. Tangent: (..., 7) ordered (upsilon, omega, sigma) where
sigma = log s.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8
_EPS_ANGLE = 1e-5


def make(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray):
    return R, t, jnp.asarray(s)


def identity(batch_shape=(), dtype=jnp.float32):
    I = jnp.broadcast_to(jnp.eye(3, dtype=dtype), tuple(batch_shape) + (3, 3))
    t = jnp.zeros(tuple(batch_shape) + (3,), dtype)
    s = jnp.ones(tuple(batch_shape), dtype)
    return I, t, s


def from_se3(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3], jnp.ones(T.shape[:-2], T.dtype)


def to_se3(S) -> jnp.ndarray:
    """Drop scale into translation (Sim3 -> SE3 recovery as in
    Optimizer.cc:1601-1612: R, t/s)."""
    R, t, s = S
    return se3.from_Rt(R, t / s[..., None])


def compose(A, B):
    """A * B: (sA RA, tA) after (sB RB, tB): R=RA RB, t = sA RA tB + tA, s = sA sB."""
    RA, tA, sA = A
    RB, tB, sB = B
    R = RA @ RB
    t = sA[..., None] * (RA @ tB[..., None])[..., 0] + tA
    return R, t, sA * sB


def inv(S):
    R, t, s = S
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * (Rt @ t[..., None])[..., 0]
    return Rt, t_inv, s_inv


def apply(S, X: jnp.ndarray) -> jnp.ndarray:
    """map(X) = s R X + t (sim3.h Sim3::map semantics)."""
    R, t, s = S
    return s[..., None] * (R @ X[..., None])[..., 0] + t


def exp(xi: jnp.ndarray):
    """Sim(3) exponential: (..., 7) (upsilon, omega, sigma) -> (R, t, s).

    Uses the closed-form W matrix of the similarity group (standard Sim3 exp;
    matches g2o sim3.h constructor from a 7-vector up to ordering).
    """
    v = xi[..., 0:3]
    w = xi[..., 3:6]
    sigma = xi[..., 6]
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS_ANGLE))
    small_t = theta_sq < _EPS_ANGLE
    s = jnp.exp(sigma)
    W = se3.hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    A_, B_, _ = se3._sinc_coeffs(theta_sq)
    R = I + A_[..., None, None] * W + B_[..., None, None] * WW

    small_s = jnp.abs(sigma) < 1e-4
    sigma_safe = jnp.where(small_s, jnp.ones_like(sigma), sigma)

    # Coefficients for V = A*I + B*W + C*WW (Sim3 left Jacobian), per Strasdat.
    A_coef = jnp.where(small_s, jnp.ones_like(sigma), (s - 1.0) / sigma_safe)

    den = theta_sq + sigma * sigma
    den_safe = jnp.where(den < _EPS, jnp.ones_like(den), den)
    theta_safe = jnp.where(small_t, jnp.ones_like(theta), theta)

    # General case (sigma != 0, theta != 0)
    B_gen = (
        (s * jnp.sin(theta) * sigma + (1.0 - s * jnp.cos(theta)) * theta)
        / (theta_safe * den_safe)
    )
    C_gen = (
        A_coef
        - ((s * jnp.cos(theta) - 1.0) * sigma + s * jnp.sin(theta) * theta) / den_safe
    ) / jnp.where(small_t, jnp.ones_like(theta_sq), theta_sq)
    # sigma == 0 limits
    B_s0 = B_
    C_s0 = jnp.where(
        small_t,
        jnp.full_like(theta_sq, 1.0 / 6.0),
        (1.0 - A_) / jnp.where(small_t, jnp.ones_like(theta_sq), theta_sq),
    )
    # theta == 0, sigma != 0 limits
    B_t0 = jnp.where(
        small_s,
        jnp.full_like(sigma, 0.5),
        (sigma_safe * s - s + 1.0) / (sigma_safe * sigma_safe),
    )
    C_t0 = jnp.where(
        small_s,
        jnp.full_like(sigma, 1.0 / 6.0),
        (0.5 * sigma_safe * sigma_safe * s - s + 1.0 + sigma_safe * s - sigma_safe)
        / jnp.where(small_s, jnp.ones_like(sigma), sigma_safe**3),
    ) - B_t0 * 0.0
    B_coef = jnp.where(small_s, B_s0, jnp.where(small_t, B_t0, B_gen))
    C_coef = jnp.where(small_s, C_s0, jnp.where(small_t, C_t0, C_gen))
    V = A_coef[..., None, None] * I + B_coef[..., None, None] * W + C_coef[..., None, None] * WW
    t = (V @ v[..., None])[..., 0]
    return R, t, s


def log(S) -> jnp.ndarray:
    """Sim(3) log map (inverse of `exp`), via solving V v = t.

    V depends only on (omega, sigma); its columns are recovered by pushing the
    three unit translations through `exp`, which keeps this in exact agreement
    with the forward map (no separately-maintained coefficient formulas).
    """
    R, t, s = S
    w = se3.so3_log(R)
    sigma = jnp.log(s)
    e = jnp.eye(3, dtype=w.dtype)
    cols = []
    for k in range(3):
        xi_k = jnp.concatenate(
            [jnp.broadcast_to(e[k], w.shape), w, sigma[..., None]], axis=-1
        )
        _, tk, _ = exp(xi_k)
        cols.append(tk)
    V = jnp.stack(cols, axis=-1)  # (..., 3, 3)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)


def retract(S, xi: jnp.ndarray):
    """Left-multiplicative retraction exp(xi) * S."""
    return compose(exp(xi), S)


def pack(S) -> jnp.ndarray:
    """(R, t, s) -> (..., 8) [quat wxyz, t, s] storage form."""
    R, t, s = S
    q = se3.quat_from_mat(R)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def unpack(p: jnp.ndarray):
    R = se3.mat_from_quat(p[..., 0:4])
    return R, p[..., 4:7], p[..., 7]
