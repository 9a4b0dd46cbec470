"""Multi-chip bundle adjustment: observation-sharded BA over a device mesh.

The reference has no distributed anything (SURVEY.md §2.3: one process,
shared memory + mutexes). This module is the new scale-out capability
(BASELINE.json north star): the BA normal-equation build is a sum over
observations, so sharding the observation table over a mesh axis makes every
scatter-add a local partial sum followed by an XLA-inserted all-reduce —
the "annotate shardings, let the compiler place collectives" recipe.

Poses and landmarks stay replicated (they are tiny next to observations);
the reduced camera system is solved replicated on every chip. A
keyframe-sharded Schur variant for very large maps is the Stage-4 follow-up
(SURVEY.md §5.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry.camera import StereoCamera
from ..optim import ba

OBS_AXIS = "obs"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    # Auto axis type: GSPMD propagates shardings through the solver body
    # (gathers of replicated poses/points by sharded obs indices would be
    # ambiguous under the explicit sharding-in-types mode).
    return jax.make_mesh((len(devices),), (OBS_AXIS,),
                         axis_types=(jax.sharding.AxisType.Auto,),
                         devices=devices)


def shard_problem(problem: ba.BAProblem, mesh: Mesh) -> ba.BAProblem:
    """Place the observation table sharded over the mesh's obs axis and
    everything else replicated. Observation count must divide the axis size
    (pad with invalid observations first — padding is already the framework
    convention)."""
    obs_sh = NamedSharding(mesh, P(OBS_AXIS))
    rep = NamedSharding(mesh, P())
    obs = jax.tree.map(lambda a: jax.device_put(a, obs_sh), problem.obs)
    return ba.BAProblem(
        poses=jax.device_put(problem.poses, rep),
        points=jax.device_put(problem.points, rep),
        pose_fixed=jax.device_put(problem.pose_fixed, rep),
        point_valid=jax.device_put(problem.point_valid, rep),
        obs=obs,
    )


def ba_solve_sharded(
    cam: StereoCamera,
    problem: ba.BAProblem,
    mesh: Mesh,
    iters: int = 5,
    cg_iters: int = 24,
):
    """Run the matrix-free (CG) BA path on a sharded problem. The per-
    observation residual/Jacobian work parallelizes over the obs axis; the
    (K,6)/(P,3) block reductions become psums placed by GSPMD."""
    problem = shard_problem(problem, mesh)
    return ba.ba_solve(cam, problem, iters=iters, dense=False,
                       cg_iters=cg_iters)
