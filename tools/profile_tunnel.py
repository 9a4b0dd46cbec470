"""Microbenchmark the axon tunnel: RTT, transfer cost, and per-program times
for the tracker's device programs at the KITTI workload."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def t(fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")

    one = jnp.ones((8,), jnp.float32)
    f_add = jax.jit(lambda x: x + 1)
    r = f_add(one)
    log(f"tiny jit dispatch+sync: {t(lambda: jax.block_until_ready(f_add(one))):.1f} ms")
    log(f"tiny device_get: {t(lambda: np.asarray(f_add(one))):.1f} ms")

    big = jnp.ones((1024, 1024), jnp.float32)
    f_mm = jax.jit(lambda x: x @ x)
    jax.block_until_ready(f_mm(big))
    log(f"1k matmul sync: {t(lambda: jax.block_until_ready(f_mm(big))):.1f} ms")
    buf = jax.block_until_ready(f_mm(big))
    log(f"4MB device_get: {t(lambda: np.asarray(buf), n=5):.1f} ms")

    x60k = jnp.ones((15000,), jnp.int32)
    f_id = jax.jit(lambda x: x * 2)
    jax.block_until_ready(f_id(x60k))
    log(f"60KB get after tiny prog: {t(lambda: np.asarray(f_id(x60k))):.1f} ms")

    h2d = np.ones((376, 1241), np.float32)
    log(f"h2d 1.8MB put: {t(lambda: jax.block_until_ready(jax.device_put(h2d))):.1f} ms")

    # frame build at KITTI shape
    from lldslam_tpu.frontend.frame import build_frame
    from lldslam_tpu.geometry.camera import StereoCamera
    from lldslam_tpu.ops.orb import OrbConfig
    cam = StereoCamera(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                       bf=386.1448, width=1241, height=376)
    cfg = OrbConfig(n_features=2000)
    bf_fn = jax.jit(partial(build_frame, cam=cam, cfg=cfg))
    imL = jnp.zeros((376, 1241), jnp.float32)
    imR = jnp.zeros((376, 1241), jnp.float32)
    log("compiling build_frame...")
    jax.block_until_ready(bf_fn(imL, imR))
    log(f"build_frame sync: {t(lambda: jax.block_until_ready(bf_fn(imL, imR)), n=5):.1f} ms")


if __name__ == "__main__":
    main()
