"""On-TPU check: build_frame with Pallas BRIEF == XLA path, and timing."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lldslam_tpu.ops import orb, image
from lldslam_tpu.frontend.frame import build_frame
from lldslam_tpu.config import CameraConfig


def log(m):
    print(m, file=sys.stderr, flush=True)


cfg = orb.OrbConfig(n_features=2000)
cam = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                   bf=386.1448, fps=10.0, width=1241, height=376).stereo_camera()
rng = np.random.default_rng(0)
img = np.round(rng.uniform(0, 255, (2, 376, 1241))).astype(np.float32)
stack = jnp.asarray(img)
pyr = tuple(jax.jit(partial(image.build_pyramid, n_levels=cfg.n_levels,
                            scale=cfg.scale))(stack))
jax.block_until_ready(pyr)

orb.FORCE_PALLAS_BRIEF = True
a = orb.extract_stack_pyr(pyr, cfg)
a = jax.device_get(a)
orb.FORCE_PALLAS_BRIEF = False
# new jit instance needed: the flag is read at trace time
b = jax.jit(lambda p: orb.extract_stack_pyr.__wrapped__(p, cfg))(pyr)
b = jax.device_get(b)
orb.FORCE_PALLAS_BRIEF = None
mism = (a.desc != b.desc).any(axis=-1) & a.valid
log(f"desc mismatch rows: {int(mism.sum())} / {int(a.valid.sum())} valid")
d = np.unpackbits(np.ascontiguousarray(a.desc ^ b.desc).view(np.uint8), axis=-1).sum(-1)
log(f"mean hamming delta on valid: {d[np.asarray(a.valid)].mean():.4f}")
# (small deltas are upstream blur-rounding ulp between program layouts,
# verified exact for identical blur in tools/check_brief_same_blur.py)
assert (a.xy == b.xy).all() and (a.valid == b.valid).all()

# device-only timing of the full frame build, pallas vs xla
def loop_time(fn, x0, n=16):
    def run(k):
        @jax.jit
        def f(x):
            def step(i, x):
                fd = fn(x)
                return x + 1e-20 * jnp.sum(fd.feats.desc.astype(jnp.float32)) \
                    + 1e-22 * jnp.sum(fd.depth)
            return jax.lax.fori_loop(0, k, step, x)
        ts = []
        for j in range(3):
            xj = x0 + jnp.float32(j)
            jax.block_until_ready(xj)
            t0 = time.perf_counter()
            jax.device_get(jnp.sum(f(xj)))
            ts.append(time.perf_counter() - t0)
        return min(ts[1:])
    t1 = run(1)
    tn = run(1 + n)
    return (tn - t1) / n * 1e3


imL = stack[0]
imR = stack[1]
orb.FORCE_PALLAS_BRIEF = True
t_pal = loop_time(lambda x: build_frame(x, imR, cam, cfg), imL)
log(f"build_frame pallas-BRIEF: {t_pal:7.2f} ms")
orb.FORCE_PALLAS_BRIEF = False
bf2 = jax.jit(lambda l, r: build_frame.__wrapped__(l, r, cam, cfg))
t_xla = loop_time(lambda x: bf2(x, imR), imL)
log(f"build_frame XLA-BRIEF:    {t_xla:7.2f} ms")
orb.FORCE_PALLAS_BRIEF = None
