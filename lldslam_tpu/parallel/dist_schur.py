"""Landmark-sharded distributed Schur bundle adjustment over an explicit mesh.

The reference has no distributed optimizer at all (single process, shared
memory + mutexes — SURVEY.md §2.3); this module is the scale-out design of
SURVEY.md §5.7 made explicit: landmarks and their observations are
partitioned across mesh shards, landmark marginalization is LOCAL to the
owning shard, and only pose-space quantities cross shards — as `psum`
collectives placed by `shard_map`, not left to GSPMD placement luck
(the weakness called out for `sharded_ba.py`).

Partition invariants (set up by `make_dist_problem` on host):
- poses (K, 4, 4) replicated — K is small next to landmarks/observations;
- points partitioned in contiguous blocks of P/n per shard; each shard's
  observation slice references ONLY its own points via shard-local indices;
- per-shard observation slices are padded to a common length, so the global
  obs table is exactly shardable over the mesh axis.

Per LM iteration each shard computes residual/Jacobian terms for its own
observations, `psum`s the pose blocks (Hcc, bc) and the total robust cost,
inverts its own landmarks' 3x3 Hessian blocks, and runs preconditioned CG on
the reduced camera system where each S@v matvec contains exactly ONE psum
(the landmark-coupling backscatter). Landmark back-substitution never leaves
the shard. This is the textbook distributed Schur: all-reduce volume is
O(K * 6) per matvec, independent of landmark/observation count.

The solve itself (pose-space CG) is replicated-by-construction: every shard
holds the same reduced system after the psum and takes the same steps, so no
shard ever waits on another outside the collectives.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3
from ..geometry.camera import StereoCamera
from ..optim import ba
from ..optim import residuals as res

AXIS = "ba"


class DistProblem(NamedTuple):
    """A BAProblem re-laid-out for the mesh (see `make_dist_problem`)."""

    poses: jnp.ndarray        # (K, 4, 4) replicated
    pose_fixed: jnp.ndarray   # (K,) bool replicated
    points: jnp.ndarray       # (P, 3), contiguous blocks of P/n per shard
    point_valid: jnp.ndarray  # (P,) bool
    obs: ba.BAObs             # (n * O_pad,) rows; obs.p is SHARD-LOCAL


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (AXIS,), devices=devices)


def make_dist_problem(problem: ba.BAProblem, n_shards: int):
    """Host-side re-layout of a BAProblem for `dist_ba_solve`.

    Points pad up to a multiple of n_shards and split into contiguous
    blocks; observation rows group by the shard owning their point (block
    index), pad per-shard to a common length, and switch to shard-local
    point indices. Returns (DistProblem, obs_src) where obs_src[i] is the
    original observation row feeding padded row i (-1 for padding) — the
    inverse map for per-observation chi2 readback.

    Observations with valid=False are DROPPED (no obs_src row maps them):
    a caller scattering per-row results (e.g. chi2) back through obs_src
    must pre-fill its output buffer (zeros/inf), not use np.empty.

    Per-shard slices pad to the LARGEST shard's count; a skewed landmark
    distribution inflates every shard to the hottest one's length. The
    skew ratio (counts.max/counts.mean) is recorded in
    DistProblem-building callers' logs when > 2.
    """
    o = jax.tree.map(np.asarray, problem.obs)
    pts = np.asarray(problem.points)
    ptv = np.asarray(problem.point_valid)
    P_orig = pts.shape[0]
    P_pad = -(-P_orig // n_shards) * n_shards
    if P_pad != P_orig:
        pts = np.concatenate([pts, np.zeros((P_pad - P_orig, 3), pts.dtype)])
        ptv = np.concatenate([ptv, np.zeros(P_pad - P_orig, bool)])
    per = P_pad // n_shards

    shard = np.asarray(o.p) // per
    shard = np.where(np.asarray(o.valid), shard, -1)
    counts = np.bincount(shard[shard >= 0], minlength=n_shards)
    if counts.sum() > 0 and counts.max() > 2.0 * max(counts.mean(), 1.0):
        import logging
        logging.getLogger(__name__).info(
            "dist_schur shard skew: max/mean obs per shard %.1f "
            "(%d/%0.f) — padded work inflates to the hottest shard",
            counts.max() / max(counts.mean(), 1.0), counts.max(),
            counts.mean())
    o_pad = max(int(counts.max(initial=0)), 8)
    o_pad = -(-o_pad // 8) * 8
    n_rows = n_shards * o_pad

    obs_src = np.full(n_rows, -1, np.int64)
    for s in range(n_shards):
        rows = np.nonzero(shard == s)[0]
        obs_src[s * o_pad: s * o_pad + len(rows)] = rows

    def take(a, fill=0):
        out = np.full((n_rows,) + a.shape[1:], fill, a.dtype)
        m = obs_src >= 0
        out[m] = a[obs_src[m]]
        return out

    k = take(np.asarray(o.k))
    p_local = take(np.asarray(o.p)) % per
    obs = ba.BAObs(
        k=jnp.asarray(k),
        p=jnp.asarray(p_local.astype(np.int32)),
        uvr=jnp.asarray(take(np.asarray(o.uvr))),
        inv_sigma2=jnp.asarray(take(np.asarray(o.inv_sigma2))),
        is_stereo=jnp.asarray(take(np.asarray(o.is_stereo))),
        valid=jnp.asarray(obs_src >= 0),
    )
    dp = DistProblem(
        poses=jnp.asarray(np.asarray(problem.poses)),
        pose_fixed=jnp.asarray(np.asarray(problem.pose_fixed)),
        points=jnp.asarray(pts),
        point_valid=jnp.asarray(ptv),
        obs=obs,
    )
    return dp, obs_src


def place(dp: DistProblem, mesh: Mesh) -> DistProblem:
    """Device placement: points/obs sharded over the mesh axis, poses
    replicated. Safe to call on multi-process (global) meshes: device_put
    with a NamedSharding fills only addressable shards from host data."""
    sh = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    return DistProblem(
        poses=jax.device_put(dp.poses, rep),
        pose_fixed=jax.device_put(dp.pose_fixed, rep),
        points=jax.device_put(dp.points, sh),
        point_valid=jax.device_put(dp.point_valid, sh),
        obs=jax.tree.map(lambda a: jax.device_put(a, sh), dp.obs),
    )


def _schur_cg_psum(problem_l: ba.BAProblem, Hcc, bc, Hpp, bp, Wcp, lam,
                   cg_iters: int):
    """`ba._schur_cg` with the two cross-shard reductions made explicit:
    Hcc/bc arrive already psum'd; each S@v matvec and the reduced RHS do one
    `psum` over the landmark-coupling backscatter. Everything else is
    shard-local (landmark blocks) or replicated (pose-space CG state)."""
    o = problem_l.obs
    K = problem_l.poses.shape[0]
    Pl = problem_l.points.shape[0]
    free = (~problem_l.pose_fixed).astype(bc.dtype)
    Hpp_d = ba._damp_diag(Hpp, lam)
    seen = jnp.zeros((Pl,)).at[o.p].add(jnp.abs(Wcp).sum(axis=(1, 2))) > 0
    Hpp_d = jnp.where(seen[:, None, None], Hpp_d,
                      jnp.eye(3, dtype=Hpp.dtype)[None])
    Hpp_inv = ba._inv3x3(Hpp_d)
    Hcc_d = ba._damp_diag(Hcc, lam)

    def S_matvec(v):  # v (K, 6) replicated
        v = v * free[:, None]
        y = jnp.einsum("kij,kj->ki", Hcc_d, v)
        z = jnp.zeros((Pl, 3)).at[o.p].add(
            jnp.einsum("oij,oi->oj", Wcp, v[o.k]))
        z = jnp.einsum("pij,pj->pi", Hpp_inv, z)
        y2 = jnp.zeros((K, 6)).at[o.k].add(
            jnp.einsum("oij,oj->oi", Wcp, z[o.p]))
        y2 = jax.lax.psum(y2, AXIS)
        return (y - y2) * free[:, None]

    rhs_l = jnp.zeros((K, 6)).at[o.k].add(jnp.einsum(
        "oij,oj->oi", Wcp, jnp.einsum("pij,pj->pi", Hpp_inv, bp)[o.p]))
    rhs = (bc - jax.lax.psum(rhs_l, AXIS)) * free[:, None]

    db = jnp.sqrt(jnp.maximum(jnp.diagonal(Hcc_d, axis1=-2, axis2=-1), 1e-12))
    Hcc_s = Hcc_d / (db[:, :, None] * db[:, None, :])
    Minv_s = jnp.linalg.inv(Hcc_s + jnp.eye(6, dtype=bc.dtype) * 1e-6)
    Minv = Minv_s / (db[:, :, None] * db[:, None, :])

    def precond(r):
        return jnp.einsum("kij,kj->ki", Minv, r) * free[:, None]

    def cg_body(_, state):
        x, r, z, pdir, rz = state
        Ap = S_matvec(pdir)
        denom = jnp.sum(pdir * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        x = x + alpha * pdir
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-12, 1e-12, rz)
        pdir = z + beta * pdir
        return (x, r, z, pdir, rz_new)

    x0 = jnp.zeros_like(rhs)
    z0 = precond(rhs)
    dc, *_ = jax.lax.fori_loop(
        0, cg_iters, cg_body, (x0, rhs, z0, z0, jnp.sum(rhs * z0)))
    # landmark back-substitution: never leaves the shard
    z = jnp.zeros((Pl, 3)).at[o.p].add(
        jnp.einsum("oij,oi->oj", Wcp, dc[o.k]))
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - z)
    dp = dp * problem_l.point_valid[:, None]
    return dc, dp


def _shard_body(cam: StereoCamera, iters: int, cg_iters: int, robust: bool,
                gnc: bool, poses, pose_fixed, pts_l, ptv_l, obs_l):
    """Per-shard SPMD body (runs under shard_map; collectives = psum)."""
    local = ba.BAProblem(poses=poses, points=pts_l, pose_fixed=pose_fixed,
                         point_valid=ptv_l, obs=obs_l)

    def cost(pb, dscale):
        return jax.lax.psum(ba._total_cost(cam, pb, robust, dscale), AXIS)

    def body(i, state):
        pb, lam = state
        dscale = jnp.maximum(1.0, 64.0 * 0.5 ** i) if gnc else 1.0
        r, Jc, Jp, W, chi2, active = ba._terms(cam, pb, robust, dscale)
        Hcc, bc, Hpp, bp, Wcp = ba._build_blocks(pb, r, Jc, Jp, W)
        Hcc = jax.lax.psum(Hcc, AXIS)
        bc = jax.lax.psum(bc, AXIS)
        dc, dp = _schur_cg_psum(pb, Hcc, bc, Hpp, bp, Wcp, lam, cg_iters)
        cand = ba._apply_update(pb, dc, dp)
        accept = cost(cand, dscale) < cost(pb, dscale)
        pb = jax.tree.map(lambda a, b: jnp.where(accept, b, a), pb, cand)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e4)
        return (pb, lam)

    local, _ = jax.lax.fori_loop(
        0, iters, body, (local, jnp.asarray(1e-4, poses.dtype)))
    o = local.obs
    r = res.point_residual_stereo(cam, local.poses[o.k], local.points[o.p],
                                  o.uvr)
    row_w = jnp.where(o.is_stereo[:, None], 1.0,
                      jnp.array([1.0, 1.0, 0.0])[None, :])
    chi2 = o.inv_sigma2 * jnp.sum(r * r * row_w, axis=-1)
    return local.poses, local.points, chi2


@partial(jax.jit, static_argnames=("cam", "mesh", "iters", "cg_iters",
                                   "robust", "gnc"))
def dist_ba_solve(
    cam: StereoCamera,
    dp: DistProblem,
    mesh: Mesh,
    iters: int = 5,
    cg_iters: int = 24,
    robust: bool = True,
    gnc: bool = True,
):
    """LM/Schur BA with landmarks+observations sharded over `mesh`.

    Same schedule and math as `ba.ba_solve(dense=False)` (identical up to
    f32 reduction order); returns (poses (K,4,4), points (P,3),
    chi2 (n*O_pad,) in the `make_dist_problem` row order).
    """
    body = partial(_shard_body, cam, iters, cg_iters, robust, gnc)
    shmap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS),
                  jax.tree.map(lambda _: P(AXIS), dp.obs)),
        out_specs=(P(), P(AXIS), P(AXIS)),
    )
    return shmap(dp.poses, dp.pose_fixed, dp.points, dp.point_valid, dp.obs)
