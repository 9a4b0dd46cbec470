"""lldslam_tpu — a TPU-native stereo point+line visual SLAM framework.

A from-scratch rebuild of the capabilities of LLD-SLAM (alexandervakhitov/lld-slam,
a C++ ORB-SLAM2 fork with learnable line descriptors) designed TPU-first:

- All per-pixel / per-feature compute is batched JAX/XLA (Pallas for hot kernels),
  with fixed capacities + validity masks instead of dynamic object graphs.
- The map is a struct-of-arrays (SoA) device-resident store, not a pointer graph.
- Bundle adjustment is batched Gauss-Newton with dense-block Schur complement,
  shardable over a `jax.sharding.Mesh` for multi-chip global BA.
- The reference's 4-thread racing pipeline becomes a deterministic schedule:
  track -> (on keyframe) map update + local BA -> (periodic) loop closure.

Reference layer map: see SURVEY.md at the repo root. Citations in docstrings are
`file:line` into the reference tree (for parity checking only; no code is ported).
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry is correctness-critical: on TPU the default matmul precision
# lowers f32 matmuls to bfloat16 MXU passes (~3 decimal digits), which breaks
# pose composition / triangulation / normal equations at ranges of tens of
# meters (observed: 0.17 m error on a Sim3 round trip). Force full f32
# accumulation as the framework default; throughput-critical kernels opt into
# bf16 explicitly where the math tolerates it.
_jax.config.update("jax_default_matmul_precision", "highest")
