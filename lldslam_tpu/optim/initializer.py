"""Monocular map initialization: parallel H/F RANSAC + reconstruction.

Replaces `Initializer` (reference src/Initializer.cc): the reference launches
two CPU threads computing a homography and a fundamental matrix RANSAC in
parallel (Initializer.cc:74-82), scores both with symmetric transfer errors,
selects by the score ratio RH = SH/(SH+SF) > 0.40 (:104), then reconstructs
R, t and triangulates. Here each model's hypotheses are solved and scored as
one batched program (vmapped 4-pt/8-pt DLT + (H, N) transfer-error pass) —
the "all hypotheses in parallel" pattern (SURVEY.md §7).

Reconstruction: F -> E -> the 4 (R, t) candidates, each cheirality-scored by
triangulating every match (ReconstructF, Initializer.cc:452-556); H -> the
Faugeras 8-solution decomposition (ReconstructH, Initializer.cc:558-740).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.camera import StereoCamera

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991


def _normalize(x, valid):
    """Hartley normalization (Initializer::Normalize, Initializer.cc:744)."""
    w = valid.astype(x.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (x * w[:, None]).sum(0) / n
    dev = (jnp.abs(x - mean) * w[:, None]).sum(0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    xn = (x - mean) * s
    T = jnp.array([[s[0], 0, -mean[0] * s[0]],
                   [0, s[1], -mean[1] * s[1]],
                   [0, 0, 1]], x.dtype)
    return xn, T


def _dlt_h(x1, x2):
    """4-point homography DLT: x1, x2 (4, 2) -> H (3, 3) with x2 ~ H x1."""
    def rows(p, q):
        x, y = p
        u, v = q
        return jnp.array([
            [0, 0, 0, -x, -y, -1, v * x, v * y, v],
            [x, y, 1, 0, 0, 0, -u * x, -u * y, -u],
        ])
    A = jnp.concatenate([rows(x1[i], x2[i]) for i in range(4)])
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _dlt_f(x1, x2):
    """8-point fundamental DLT -> rank-2 F with x2^T F x1 = 0."""
    x, y = x1[:, 0], x1[:, 1]
    u, v = x2[:, 0], x2[:, 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], -1)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    U, s, Vt2 = jnp.linalg.svd(F)
    return (U * jnp.array([s[0], s[1], 0.0])) @ Vt2


def _h_transfer_err(H, x1, x2):
    """Symmetric transfer errors (N,) both directions (CheckHomography,
    Initializer.cc:287-373)."""
    def err(H, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], -1)
        p = ah @ H.T
        p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:]) < 1e-9, 1e-9, p[:, 2:])
        return jnp.sum((p - b) ** 2, -1)
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    return err(H, x1, x2), err(Hinv, x2, x1)


def _f_epi_err(F, x1, x2):
    """Point-to-epiline squared distances both directions (CheckFundamental,
    Initializer.cc:375-450)."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)
    l2 = h1 @ F.T
    l1 = h2 @ F
    d2 = (jnp.sum(h2 * l2, -1) ** 2) / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = (jnp.sum(h1 * l1, -1) ** 2) / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    return d1, d2


@partial(jax.jit, static_argnames=("n_hyp",))
def ransac_models(x1, x2, valid, key, sigma: float = 1.0, n_hyp: int = 256):
    """Run both model RANSACs. Returns (H, score_h, inl_h, F, score_f, inl_f).
    Scores follow the reference: sum over inliers of (th - err/sigma^2) for
    both directions, with the H/F-specific chi2 gates."""
    N = x1.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    k1, k2 = jax.random.split(key)
    s2 = sigma * sigma

    idx_h = jax.random.choice(k1, N, shape=(n_hyp, 4), replace=True, p=p)
    Hs = jax.vmap(lambda i: _dlt_h(x1[i], x2[i]))(idx_h)
    e12, e21 = jax.vmap(lambda H: _h_transfer_err(H, x1, x2))(Hs)
    in_h = (e12 / s2 < CHI2_H) & (e21 / s2 < CHI2_H) & valid[None]
    sc_h = (jnp.where(e12 / s2 < CHI2_H, SCORE_TH - e12 / s2, 0.0)
            + jnp.where(e21 / s2 < CHI2_H, SCORE_TH - e21 / s2, 0.0))
    sc_h = (sc_h * valid[None]).sum(-1)
    bh = jnp.argmax(sc_h)

    idx_f = jax.random.choice(k2, N, shape=(n_hyp, 8), replace=True, p=p)
    # Hartley-normalize once globally (sufficient for conditioning)
    x1n, T1 = _normalize(x1, valid)
    x2n, T2 = _normalize(x2, valid)
    Fs_n = jax.vmap(lambda i: _dlt_f(x1n[i], x2n[i]))(idx_f)
    Fs = jnp.einsum("ij,hjk,kl->hil", T2.T, Fs_n, T1)
    d1, d2 = jax.vmap(lambda F: _f_epi_err(F, x1, x2))(Fs)
    in_f = (d1 / s2 < CHI2_F) & (d2 / s2 < CHI2_F) & valid[None]
    sc_f = (jnp.where(d1 / s2 < CHI2_F, SCORE_TH - d1 / s2, 0.0)
            + jnp.where(d2 / s2 < CHI2_F, SCORE_TH - d2 / s2, 0.0))
    sc_f = (sc_f * valid[None]).sum(-1)
    bf = jnp.argmax(sc_f)

    # least-squares refit on the winning inlier sets: the 8-point minimal
    # estimate is noisy enough (~0.015 rad) that reconstruction's 2 px
    # reprojection gate would reject most true matches
    F_ref = _refit_f(x1n, x2n, in_f[bf])
    F_ref = T2.T @ F_ref @ T1
    H_ref = _refit_h(x1, x2, in_h[bh])
    d1, d2 = _f_epi_err(F_ref, x1, x2)
    in_fr = (d1 / s2 < CHI2_F) & (d2 / s2 < CHI2_F) & valid
    e12, e21 = _h_transfer_err(H_ref, x1, x2)
    in_hr = (e12 / s2 < CHI2_H) & (e21 / s2 < CHI2_H) & valid

    return (H_ref, sc_h[bh], in_hr, F_ref, sc_f[bf], in_fr)


def _refit_f(x1n, x2n, w):
    """Weighted all-inlier 8-point refit (normalized coords)."""
    x, y = x1n[:, 0], x1n[:, 1]
    u, v = x2n[:, 0], x2n[:, 1]
    A = jnp.stack([u * x, u * y, u, v * x, v * y, v, x, y,
                   jnp.ones_like(x)], -1) * w[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    F = Vt[-1].reshape(3, 3)
    U, s, Vt2 = jnp.linalg.svd(F)
    return (U * jnp.array([s[0], s[1], 0.0])) @ Vt2


def _refit_h(x1, x2, w):
    """Weighted all-inlier homography DLT."""
    x, y = x1[:, 0], x1[:, 1]
    u, v = x2[:, 0], x2[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], -1)
    r2 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]])
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    return Vt[-1].reshape(3, 3)


def _triangulate_all(R, t, K, x1, x2):
    """Linear triangulation of all matches under pose (R, t) of cam2 wrt
    cam1 at identity. Returns X (N, 3) in cam1 frame."""
    P1 = K @ jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)
    P2 = K @ jnp.concatenate([R, t[:, None]], 1)

    def tri(a, b):
        A = jnp.stack([
            a[0] * P1[2] - P1[0],
            a[1] * P1[2] - P1[1],
            b[0] * P2[2] - P2[0],
            b[1] * P2[2] - P2[1],
        ])
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(tri)(x1, x2)


def _check_rt(R, t, K, x1, x2, inl, sigma2: float):
    """Cheirality + parallax + reprojection scoring of one (R, t)
    (Initializer::CheckRT, Initializer.cc:758-873). Returns (n_good, X,
    good_mask, parallax_ok)."""
    X = _triangulate_all(R, t, K, x1, x2)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    # parallax between the two viewing rays
    c2 = -R.T @ t
    r1 = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-9)
    r2 = (X - c2) / jnp.maximum(
        jnp.linalg.norm(X - c2, axis=-1, keepdims=True), 1e-9)
    cospar = jnp.sum(r1 * r2, -1)

    def reproj(P, obs):
        z = jnp.maximum(P[:, 2], 1e-9)
        u = K[0, 0] * P[:, 0] / z + K[0, 2]
        v = K[1, 1] * P[:, 1] / z + K[1, 2]
        return (u - obs[:, 0]) ** 2 + (v - obs[:, 1]) ** 2
    e1 = reproj(X, x1)
    e2 = reproj(Xc2, x2)
    good = inl & (z1 > 0) & (z2 > 0) & (cospar < 0.99998) \
        & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2)
    # median-parallax proxy: good points with real parallax
    return good.sum(), X, good, cospar


@partial(jax.jit, static_argnames=("cam",))
def reconstruct_f(cam: StereoCamera, F, x1, x2, inl):
    """E = K^T F K -> 4 pose candidates -> best by cheirality
    (ReconstructF, Initializer.cc:452-556). Returns packed
    (ok, R, t, X (N,3), good mask)."""
    K = cam.K()
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    results = [_check_rt(R, tt, K, x1, x2, inl, 1.0) for R, tt in cands]
    counts = jnp.stack([r[0] for r in results])
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_second = jnp.sort(counts)[-2]
    n_inl = jnp.maximum(inl.sum(), 1)
    # accept: a clear winner explaining most inliers (Initializer.cc:520-556)
    ok = (n_best > 0.7 * n_inl) & (n_second < 0.75 * n_best) & (n_best >= 50)
    Rb = jnp.stack([c[0] for c in cands])[best]
    tb = jnp.stack([c[1] for c in cands])[best]
    Xb = jnp.stack([r[1] for r in results])[best]
    gb = jnp.stack([r[2] for r in results])[best]
    return ok, Rb, tb, Xb, gb


@partial(jax.jit, static_argnames=("cam",))
def reconstruct_h(cam: StereoCamera, H, x1, x2, inl):
    """Faugeras SVD decomposition of a homography into 8 motion hypotheses
    (ReconstructH, Initializer.cc:558-740), scored like reconstruct_f."""
    K = cam.K()
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H @ K
    U, w, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3 + 1e-12), 0.0))
    aux_st = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 + d3) * d2 + 1e-12)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2 + 1e-12)

    cands = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # d' > 0 case
            Rp = jnp.array([[ctheta, 0, -e1 * e3 * aux_st],
                            [0, 1, 0],
                            [e1 * e3 * aux_st, 0, ctheta]])
            tp = (d1 - d3) * jnp.array([e1 * aux1, 0.0, -e3 * aux3])
            np_ = jnp.array([e1 * aux1, 0.0, e3 * aux3])
            cands.append((Rp, tp, np_))
    aux_sp = jnp.sqrt(jnp.maximum(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / ((d1 - d3) * d2 + 1e-12)
    cphi = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2 + 1e-12)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            # d' < 0 case
            Rp = jnp.array([[cphi, 0, e1 * e3 * aux_sp],
                            [0, -1, 0],
                            [e1 * e3 * aux_sp, 0, -cphi]])
            tp = (d1 + d3) * jnp.array([e1 * aux1, 0.0, e3 * aux3])
            np_ = jnp.array([e1 * aux1, 0.0, e3 * aux3])
            cands.append((Rp, tp, np_))

    results = []
    poses = []
    for Rp, tp, _ in cands:
        R = s * U @ Rp @ Vt
        t = U @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        poses.append((R, t))
        results.append(_check_rt(R, t, K, x1, x2, inl, 1.0))
    counts = jnp.stack([r[0] for r in results])
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_second = jnp.sort(counts)[-2]
    n_inl = jnp.maximum(inl.sum(), 1)
    ok = (n_best > 0.7 * n_inl) & (n_second < 0.75 * n_best) & (n_best >= 50)
    Rb = jnp.stack([p[0] for p in poses])[best]
    tb = jnp.stack([p[1] for p in poses])[best]
    Xb = jnp.stack([r[1] for r in results])[best]
    gb = jnp.stack([r[2] for r in results])[best]
    return ok, Rb, tb, Xb, gb


def initialize(cam: StereoCamera, x1, x2, valid, key):
    """Full monocular bootstrap (Initializer::Initialize, Initializer.cc:74):
    both RANSACs -> model selection RH > 0.40 -> reconstruction.
    Host-level driver; returns (ok, R, t, X, good) as numpy."""
    import numpy as np

    H, sh, inh, F, sf, inf_ = ransac_models(x1, x2, valid, key)
    rh = float(sh) / max(float(sh) + float(sf), 1e-9)
    if rh > 0.40:  # Initializer.cc:104
        out = reconstruct_h(cam, H, x1, x2, inh)
    else:
        out = reconstruct_f(cam, F, x1, x2, inf_)
    ok, R, t, X, good = out
    return (bool(ok), np.asarray(R), np.asarray(t), np.asarray(X),
            np.asarray(good))
