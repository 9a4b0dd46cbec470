"""Batched SE(3) manifold operations as pure JAX functions.

Replaces the capability of g2o's `SE3Quat` / `se3_ops.h`
(reference: Thirdparty/g2o/g2o/types/se3quat.h, types_six_dof_expmap.{h,cpp}) with
vectorized closed-form exp/log/compose/apply usable under `jit`/`vmap`/`grad`.

Conventions:
- A pose is a 4x4 homogeneous matrix `T` (row-major, world->camera `T_cw` in the
  SLAM pipeline, matching the reference's `Tcw`).
- A tangent vector `xi` is shape (..., 6) ordered `(upsilon, omega)` =
  (translation part, rotation part), matching g2o's SE3Quat::exp ordering.
- All functions broadcast over arbitrary leading batch dimensions.

Small-angle branches use Taylor expansions selected with `jnp.where` on safe
operands, so everything is autodiff-safe (no NaN gradients at theta=0).
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8
# float32-safe small-angle cutoff for trig-ratio coefficients: below this
# theta^2, cos(theta) rounds to 1.0f and ratios like (1-cos)/theta^2 collapse.
_EPS_ANGLE = 1e-5


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3), Taylor-safe.

    These are the SO(3)/SE(3) exp coefficients; series used below ~1e-8 angle^2.
    """
    small = theta_sq < _EPS_ANGLE
    # Safe operands everywhere (including denominators): an inf/NaN in the
    # *untaken* where-branch still poisons gradients (0 * inf = NaN).
    ts_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(ts_safe)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / ts_safe)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (1.0 - A) / ts_safe)
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * WW


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle.

    Uses the quaternion route for numerical robustness near pi.
    """
    q = quat_from_mat(R)  # (w, x, y, z), w >= 0
    qw = q[..., 0]
    qv = q[..., 1:]
    nv = jnp.linalg.norm(qv, axis=-1)
    small = nv < _EPS
    nv_safe = jnp.where(small, jnp.ones_like(nv), nv)
    # angle = 2*atan2(|qv|, qw) in [0, pi] since qw >= 0
    angle = 2.0 * jnp.arctan2(nv, qw)
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), angle / nv_safe)
    return qv * scale[..., None]


def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z) with w >= 0.

    Branch-free Shepperd-style construction (all four candidates computed,
    best selected by `where`) so it is jit/vmap friendly.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Squared magnitudes (x4) of the four components.
    sw = jnp.maximum(1e-12, 1.0 + tr)
    sx = jnp.maximum(1e-12, 1.0 + m00 - m11 - m22)
    sy = jnp.maximum(1e-12, 1.0 - m00 + m11 - m22)
    sz = jnp.maximum(1e-12, 1.0 - m00 - m11 + m22)
    case = jnp.argmax(jnp.stack([sw, sx, sy, sz], axis=-1), axis=-1)
    # Each case: largest component from sqrt, the rest from off-diagonal
    # sums/differences (numerically stable for small residual components).
    rw = jnp.sqrt(sw)
    q_w = jnp.stack([rw, (m21 - m12) / rw, (m02 - m20) / rw, (m10 - m01) / rw], axis=-1)
    rx = jnp.sqrt(sx)
    q_x = jnp.stack([(m21 - m12) / rx, rx, (m10 + m01) / rx, (m02 + m20) / rx], axis=-1)
    ry = jnp.sqrt(sy)
    q_y = jnp.stack([(m02 - m20) / ry, (m10 + m01) / ry, ry, (m21 + m12) / ry], axis=-1)
    rz = jnp.sqrt(sz)
    q_z = jnp.stack([(m10 - m01) / rz, (m02 + m20) / rz, (m21 + m12) / rz, rz], axis=-1)
    qs = 0.5 * jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4 cases, 4)
    q = jnp.take_along_axis(qs, case[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalize w >= 0.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q


def mat_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2 * x, 2 * y, 2 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    return jnp.stack(
        [
            jnp.stack([1 - (tyy + tzz), txy - twz, txz + twy], axis=-1),
            jnp.stack([txy + twz, 1 - (txx + tzz), tyz - twx], axis=-1),
            jnp.stack([txz - twy, tyz + twx, 1 - (txx + tyy)], axis=-1),
        ],
        axis=-2,
    )


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) exponential map: (..., 6) (upsilon, omega) -> (..., 4, 4)."""
    v = xi[..., :3]
    w = xi[..., 3:]
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * WW
    V = I + B[..., None, None] * W + C[..., None, None] * WW
    t = (V @ v[..., None])[..., 0]
    return from_Rt(R, t)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map: (..., 4, 4) -> (..., 6) (upsilon, omega)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    WW = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    small = theta_sq < _EPS_ANGLE
    ts_safe = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    coef = jnp.where(small, 1.0 / 12.0, (1.0 - A / (2.0 * B)) / ts_safe)
    Vinv = I - 0.5 * W + coef[..., None, None] * WW
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3), (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid transform, (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_Rt(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def apply(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Transform points: T (..., 4, 4) applied to X (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (R @ X[..., None])[..., 0] + t


def retract(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction exp(xi) * T (g2o SE3 vertex oplus,
    types_six_dof_expmap VertexSE3Expmap::oplusImpl semantics)."""
    return exp(xi) @ T


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch_shape) + (4, 4))
