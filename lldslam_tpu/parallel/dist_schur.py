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
from ..optim import lines_ba
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


class DistJointProblem(NamedTuple):
    """DistProblem + the line landmark class, both landmark families
    sharded (reference global BA marginalizes >=4-obs lines in the SAME
    problem as points — src/Optimizer.cc:473 via AddLineMinimalGlobal
    :149; here the 4x4 line blocks of optim/lines_ba._schur_cg_joint are
    sharded exactly like the 3x3 point blocks)."""

    base: DistProblem
    q: jnp.ndarray           # (L, 4), contiguous blocks of L/n per shard
    alpha: jnp.ndarray       # (L,)
    line_valid: jnp.ndarray  # (L,) bool
    lobs: "lines_ba.LineBAObs"  # (n * Ol_pad,) rows; lobs.l is SHARD-LOCAL


def make_dist_joint_problem(joint, n_shards: int):
    """Host-side re-layout of a lines_ba.JointProblem for
    `dist_joint_ba_solve`: the point half goes through make_dist_problem;
    lines and their observations shard by the same contiguous-block rule.
    Returns (DistJointProblem, obs_src, lobs_src)."""
    base, obs_src = make_dist_problem(joint.base, n_shards)
    lo = jax.tree.map(np.asarray, joint.lobs)
    q = np.asarray(joint.q)
    alpha = np.asarray(joint.alpha)
    lv = np.asarray(joint.line_valid)
    L_orig = q.shape[0]
    L_pad = -(-max(L_orig, n_shards) // n_shards) * n_shards
    if L_pad != L_orig:
        qpad = np.zeros((L_pad - L_orig, 4), q.dtype)
        qpad[:, 0] = 1.0
        q = np.concatenate([q, qpad])
        alpha = np.concatenate(
            [alpha, np.ones(L_pad - L_orig, alpha.dtype)])
        lv = np.concatenate([lv, np.zeros(L_pad - L_orig, bool)])
    per = L_pad // n_shards

    shard = np.asarray(lo.l) // per
    shard = np.where(np.asarray(lo.valid), shard, -1)
    counts = np.bincount(shard[shard >= 0], minlength=n_shards)
    o_pad = max(int(counts.max(initial=0)), 8)
    o_pad = -(-o_pad // 8) * 8
    n_rows = n_shards * o_pad
    lobs_src = np.full(n_rows, -1, np.int64)
    for s in range(n_shards):
        rows = np.nonzero(shard == s)[0]
        lobs_src[s * o_pad: s * o_pad + len(rows)] = rows

    def take(a, fill=0):
        out = np.full((n_rows,) + a.shape[1:], fill, a.dtype)
        m = lobs_src >= 0
        out[m] = a[lobs_src[m]]
        return out

    lobs = lines_ba.LineBAObs(
        k=jnp.asarray(take(np.asarray(lo.k))),
        l=jnp.asarray((take(np.asarray(lo.l)) % per).astype(np.int32)),
        x1l=jnp.asarray(take(np.asarray(lo.x1l))),
        x2l=jnp.asarray(take(np.asarray(lo.x2l))),
        x1r=jnp.asarray(take(np.asarray(lo.x1r))),
        x2r=jnp.asarray(take(np.asarray(lo.x2r))),
        octave=jnp.asarray(take(np.asarray(lo.octave))),
        has_r=jnp.asarray(take(np.asarray(lo.has_r))),
        valid=jnp.asarray(lobs_src >= 0),
    )
    djp = DistJointProblem(
        base=base, q=jnp.asarray(q), alpha=jnp.asarray(alpha),
        line_valid=jnp.asarray(lv), lobs=lobs)
    return djp, obs_src, lobs_src


def place_joint(djp: DistJointProblem, mesh: Mesh) -> DistJointProblem:
    sh = NamedSharding(mesh, P(AXIS))
    return DistJointProblem(
        base=place(djp.base, mesh),
        q=jax.device_put(djp.q, sh),
        alpha=jax.device_put(djp.alpha, sh),
        line_valid=jax.device_put(djp.line_valid, sh),
        lobs=jax.tree.map(lambda a: jax.device_put(a, sh), djp.lobs),
    )


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


# ---------------------------------------------------------------------------
# joint point+line distributed solve (the sharded form of
# optim/lines_ba.joint_ba_solve_cg)
# ---------------------------------------------------------------------------


def _schur_cg_joint_psum(joint, Hcc, bc, Hpp, bp, Wcp, Hll, bl, Wcl,
                         lam, cg_iters: int):
    """lines_ba._schur_cg_joint with the cross-shard reductions explicit:
    each S@v matvec does ONE psum over the SUM of both landmark classes'
    pose-space backscatter (points' 3x3 and lines' 4x4 blocks ride the same
    collective), as does the reduced RHS. Landmark inversions and
    back-substitution never leave the shard."""
    base = joint.base
    o = base.obs
    ol = joint.lobs
    K = base.poses.shape[0]
    Pl = base.points.shape[0]
    Ll = joint.q.shape[0]
    free = (~base.pose_fixed).astype(bc.dtype)

    Hpp_d = ba._damp_diag(Hpp, lam)
    seen_p = jnp.zeros((Pl,)).at[o.p].add(jnp.abs(Wcp).sum(axis=(1, 2))) > 0
    Hpp_d = jnp.where(seen_p[:, None, None], Hpp_d,
                      jnp.eye(3, dtype=Hpp.dtype)[None])
    Hpp_inv = ba._inv3x3(Hpp_d)
    Hll_d = ba._damp_diag(Hll, lam)
    seen_l = jnp.zeros((Ll,)).at[ol.l].add(jnp.abs(Wcl).sum(axis=(1, 2))) > 0
    Hll_d = jnp.where(seen_l[:, None, None], Hll_d,
                      jnp.eye(4, dtype=Hll.dtype)[None])
    Hll_inv = lines_ba._inv4x4(Hll_d)
    Hcc_d = ba._damp_diag(Hcc, lam)

    def S_matvec(v):  # v (K, 6) replicated
        v = v * free[:, None]
        y = jnp.einsum("kij,kj->ki", Hcc_d, v)
        zp = jnp.zeros((Pl, 3)).at[o.p].add(
            jnp.einsum("oij,oi->oj", Wcp, v[o.k]))
        zp = jnp.einsum("pij,pj->pi", Hpp_inv, zp)
        yp = jnp.zeros((K, 6)).at[o.k].add(
            jnp.einsum("oij,oj->oi", Wcp, zp[o.p]))
        zl = jnp.zeros((Ll, 4)).at[ol.l].add(
            jnp.einsum("oij,oi->oj", Wcl, v[ol.k]))
        zl = jnp.einsum("lij,lj->li", Hll_inv, zl)
        yl = jnp.zeros((K, 6)).at[ol.k].add(
            jnp.einsum("oij,oj->oi", Wcl, zl[ol.l]))
        back = jax.lax.psum(yp + yl, AXIS)   # ONE collective for both classes
        return (y - back) * free[:, None]

    rhs_p = jnp.zeros((K, 6)).at[o.k].add(jnp.einsum(
        "oij,oj->oi", Wcp, jnp.einsum("pij,pj->pi", Hpp_inv, bp)[o.p]))
    rhs_l = jnp.zeros((K, 6)).at[ol.k].add(jnp.einsum(
        "oij,oj->oi", Wcl, jnp.einsum("lij,lj->li", Hll_inv, bl)[ol.l]))
    rhs = (bc - jax.lax.psum(rhs_p + rhs_l, AXIS)) * free[:, None]

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
    # back-substitution: both classes shard-local
    zp = jnp.zeros((Pl, 3)).at[o.p].add(
        jnp.einsum("oij,oi->oj", Wcp, dc[o.k]))
    dpt = jnp.einsum("pij,pj->pi", Hpp_inv, bp - zp)
    dpt = dpt * base.point_valid[:, None]
    zl = jnp.zeros((Ll, 4)).at[ol.l].add(
        jnp.einsum("oij,oi->oj", Wcl, dc[ol.k]))
    dl = jnp.einsum("lij,lj->li", Hll_inv, bl - zl)
    dl = dl * (joint.line_valid & seen_l)[:, None]
    return dc, dpt, dl


def _joint_shard_body(cam: StereoCamera, iters: int, cg_iters: int,
                      robust: bool, gnc: bool, gamma: float,
                      poses, pose_fixed, pts_l, ptv_l, obs_l,
                      q_l, a_l, lv_l, lobs_l):
    """Per-shard SPMD body of the joint point+line distributed BA."""
    base = ba.BAProblem(poses=poses, points=pts_l, pose_fixed=pose_fixed,
                        point_valid=ptv_l, obs=obs_l)
    joint = lines_ba.JointProblem(base=base, q=q_l, alpha=a_l,
                                  line_valid=lv_l, lobs=lobs_l)

    def cost(pb, dscale):
        return jax.lax.psum(
            lines_ba._joint_cost(cam, pb, gamma, robust, dscale), AXIS)

    def body(i, state):
        pb, lam = state
        dscale = jnp.maximum(1.0, 64.0 * 0.5 ** i) if gnc else 1.0
        rp, Jcp, Jp, Wp, _, _ = ba._terms(cam, pb.base, robust, dscale)
        Hcc, bc, Hpp, bp, Wcp = ba._build_blocks(pb.base, rp, Jcp, Jp, Wp)
        rl, Jcl, Jl, Wl, _ = lines_ba._line_terms(cam, pb, gamma, robust,
                                                  dscale)
        Hcc_l, bc_l, Hll, bl, Wcl = lines_ba._line_blocks(pb, rl, Jcl, Jl,
                                                          Wl)
        Hcc = jax.lax.psum(Hcc + Hcc_l, AXIS)
        bc = jax.lax.psum(bc + bc_l, AXIS)
        dc, dpt, dl = _schur_cg_joint_psum(
            pb, Hcc, bc, Hpp, bp, Wcp, Hll, bl, Wcl, lam, cg_iters)
        cand_base = ba._apply_update(pb.base, dc, dpt)
        cand = lines_ba._apply_line_update(pb._replace(base=cand_base), dl)
        accept = cost(cand, dscale) < cost(pb, dscale)
        pb = jax.tree.map(lambda a, b: jnp.where(accept, b, a), pb, cand)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e4)
        return (pb, lam)

    joint, _ = jax.lax.fori_loop(
        0, iters, body, (joint, jnp.asarray(1e-4, poses.dtype)))
    o = joint.base.obs
    r = res.point_residual_stereo(cam, joint.base.poses[o.k],
                                  joint.base.points[o.p], o.uvr)
    row_w = jnp.where(o.is_stereo[:, None], 1.0,
                      jnp.array([1.0, 1.0, 0.0])[None, :])
    chi2 = o.inv_sigma2 * jnp.sum(r * r * row_w, axis=-1)
    return joint.base.poses, joint.base.points, joint.q, joint.alpha, chi2


@partial(jax.jit, static_argnames=("cam", "mesh", "iters", "cg_iters",
                                   "robust", "gnc", "gamma"))
def dist_joint_ba_solve(
    cam: StereoCamera,
    djp: DistJointProblem,
    mesh: Mesh,
    iters: int = 5,
    cg_iters: int = 24,
    robust: bool = True,
    gnc: bool = True,
    gamma: float = 0.5,
):
    """Joint pose+point+line BA with BOTH landmark classes sharded over
    `mesh` — the distributed form of lines_ba.joint_ba_solve_cg (same
    schedule/math up to f32 reduction order). Returns (poses (K,4,4),
    points (P,3), q (L,4), alpha (L,), chi2 (n*O_pad,))."""
    body = partial(_joint_shard_body, cam, iters, cg_iters, robust, gnc,
                   gamma)
    shmap = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS),
                  jax.tree.map(lambda _: P(AXIS), djp.base.obs),
                  P(AXIS), P(AXIS), P(AXIS),
                  jax.tree.map(lambda _: P(AXIS), djp.lobs)),
        out_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
    )
    return shmap(djp.base.poses, djp.base.pose_fixed, djp.base.points,
                 djp.base.point_valid, djp.base.obs,
                 djp.q, djp.alpha, djp.line_valid, djp.lobs)
