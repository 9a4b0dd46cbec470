"""Sim(3) pose-graph (essential graph) optimization, batched Gauss-Newton.

Replaces `Optimizer::OptimizeEssentialGraph` (reference src/Optimizer.cc:
1391-1654): vertices are keyframe Sim3 poses S_iw, edges are relative Sim3
measurements over the spanning tree, covisibility (weight >= 100) and loop
connections, with loop-edge residual r = log(M_ij^{-1} S_iw S_jw^{-1})
(g2o EdgeSim3 semantics, types_seven_dof_expmap.h).

The reference runs g2o LM with lambda ~ 1e-16 (i.e. effectively GN) for 15
iterations on a sparse system (Optimizer.cc:1404,1597). Here: per-edge 7-dof
Jacobians by forward-mode autodiff batched over all edges, scattered into
(K, 7) normal-equation blocks, solved matrix-free by block-Jacobi
preconditioned CG — the same machinery pattern as optim/ba.py, shardable
over a mesh by the edge axis.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import sim3


class PoseGraph(NamedTuple):
    R: jnp.ndarray        # (K, 3, 3)
    t: jnp.ndarray        # (K, 3)
    s: jnp.ndarray        # (K,)
    fixed: jnp.ndarray    # (K,) bool (loop KF anchor, Optimizer.cc:1442)
    e_i: jnp.ndarray      # (E,) int32
    e_j: jnp.ndarray      # (E,) int32
    m_R: jnp.ndarray      # (E, 3, 3) measurement M_ij = S_i * S_j^-1
    m_t: jnp.ndarray      # (E, 3)
    m_s: jnp.ndarray      # (E,)
    e_valid: jnp.ndarray  # (E,) bool


def edge_residual(Si, Sj, M):
    """r = log(M^-1 * S_i * S_j^-1) in R^7."""
    rel = sim3.compose(Si, sim3.inv(Sj))
    return sim3.log(sim3.compose(sim3.inv(M), rel))


def _edge_terms(g: PoseGraph):
    """Residuals (E, 7) and Jacobians (E, 7, 7) x2 wrt endpoint increments."""
    Si = (g.R[g.e_i], g.t[g.e_i], g.s[g.e_i])
    Sj = (g.R[g.e_j], g.t[g.e_j], g.s[g.e_j])
    M = (g.m_R, g.m_t, g.m_s)

    def res(eps_i, eps_j, Si, Sj, M):
        return edge_residual(
            sim3.compose(sim3.exp(eps_i), Si),
            sim3.compose(sim3.exp(eps_j), Sj), M)

    z7 = jnp.zeros(7, g.t.dtype)
    r = jax.vmap(partial(res))(  # (E, 7)
        jnp.zeros((g.e_i.shape[0], 7), g.t.dtype),
        jnp.zeros((g.e_i.shape[0], 7), g.t.dtype), Si, Sj, M)
    Ji = jax.vmap(lambda Si, Sj, M: jax.jacfwd(
        lambda e: res(e, z7, Si, Sj, M))(z7))(Si, Sj, M)
    Jj = jax.vmap(lambda Si, Sj, M: jax.jacfwd(
        lambda e: res(z7, e, Si, Sj, M))(z7))(Si, Sj, M)
    w = g.e_valid.astype(r.dtype)
    return r * w[:, None], Ji * w[:, None, None], Jj * w[:, None, None]


@partial(jax.jit, static_argnames=("iters", "cg_iters"))
def optimize_pose_graph(g: PoseGraph, iters: int = 15, cg_iters: int = 48):
    """Returns the optimized PoseGraph (same edges, updated vertices)."""
    K = g.R.shape[0]
    free = (~g.fixed).astype(g.t.dtype)

    def gn_step(carry, _):
        g, lam = carry
        r, Ji, Jj = _edge_terms(g)
        err_old = jnp.sum(r * r)
        H = jnp.zeros((K, 7, 7), g.t.dtype)
        H = H.at[g.e_i].add(jnp.einsum("eri,erj->eij", Ji, Ji))
        H = H.at[g.e_j].add(jnp.einsum("eri,erj->eij", Jj, Jj))
        b = jnp.zeros((K, 7), g.t.dtype)
        b = b.at[g.e_i].add(-jnp.einsum("eri,er->ei", Ji, r))
        b = b.at[g.e_j].add(-jnp.einsum("eri,er->ei", Jj, r))
        # adaptive LM damping: the reference's g2o starts at 1e-16
        # (Optimizer.cc:1404) but adapts per iteration; a fixed tiny damping
        # in f32 lets CG amplify the chain's low-stiffness bending modes and
        # pure GN oscillates/diverges once near the optimum.
        H = H + lam * jnp.eye(7, dtype=g.t.dtype)[None]
        b = b * free[:, None]

        # block-Jacobi preconditioned CG on the full graph Hessian
        db = jnp.sqrt(jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12))
        Hs = H / (db[:, :, None] * db[:, None, :])
        Minv = jnp.linalg.inv(Hs + 1e-8 * jnp.eye(7, dtype=g.t.dtype)[None])
        Minv = Minv / (db[:, :, None] * db[:, None, :])

        def matvec(v):
            v = v * free[:, None]
            # off-diagonal coupling: for each edge, Hij = Ji^T Jj
            yi = jnp.einsum("eri,erj,ej->ei", Ji, Jj, v[g.e_j])
            yj = jnp.einsum("eri,erj,ej->ei", Jj, Ji, v[g.e_i])
            y = jnp.einsum("kij,kj->ki", H, v)
            y = y.at[g.e_i].add(yi)
            y = y.at[g.e_j].add(yj)
            return y * free[:, None]

        def precond(x):
            return jnp.einsum("kij,kj->ki", Minv, x) * free[:, None]

        def cg_body(_, st):
            x, rr, z, p, rz = st
            Ap = matvec(p)
            denom = jnp.sum(p * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
            return (x, rr, z, z + beta * p, rz_new)

        x0 = jnp.zeros_like(b)
        z0 = precond(b)
        x, *_ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, b, z0, z0, jnp.sum(b * z0)))
        dx = x * free[:, None]
        Rn, tn, sn = sim3.compose(sim3.exp(dx), (g.R, g.t, g.s))
        cand = g._replace(R=Rn, t=tn, s=sn)
        r_new, _, _ = _edge_terms(cand)
        err_new = jnp.sum(r_new * r_new)
        accept = err_new < err_old
        g = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), g, cand)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 8.0), 1e-8, 1e4)
        return (g, lam), None

    (g, _), _ = jax.lax.scan(
        gn_step, (g, jnp.asarray(1e-6, g.t.dtype)), None, length=iters)
    return g


def total_error(g: PoseGraph) -> jnp.ndarray:
    r, _, _ = _edge_terms(g)
    return jnp.sum(r * r)
