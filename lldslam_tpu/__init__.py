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

# Persistent XLA compilation cache: programs here are large (tracker step,
# local BA, loop closure) and a tunneled-TPU compile costs 20-60 s; caching
# across processes makes bench/driver reruns start in seconds. TPU-backed
# processes only (the axon relay env marks them): XLA:CPU AOT cache entries
# embed host machine-feature lists that vary across flag configurations in
# this environment and reload with SIGILL-risk warnings. Opt out with
# LLDSLAM_NO_COMPILE_CACHE=1 (e.g. when diagnosing compile issues).
import os as _os

if not _os.environ.get("LLDSLAM_NO_COMPILE_CACHE") \
        and _os.environ.get("PALLAS_AXON_POOL_IPS"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("LLDSLAM_COMPILE_CACHE",
                        _os.path.expanduser("~/.cache/lldslam_xla")))
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
