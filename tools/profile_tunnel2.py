"""Tunnel characteristics: upload wire time vs latency, dispatch pipelining."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)
imgs = [rng.integers(0, 255, (2, 376, 1241), dtype=np.uint8) for _ in range(8)]

# serial uploads, block each
x = jnp.asarray(imgs[0]); jax.block_until_ready(x)
t0 = time.perf_counter()
for im in imgs:
    x = jnp.asarray(im)
    jax.block_until_ready(x)
dt = time.perf_counter() - t0
log(f"serial upload (block each): {dt/len(imgs)*1e3:.1f} ms/frame "
    f"({imgs[0].nbytes/1024:.0f} KB)")

# pipelined uploads: dispatch all, block once
t0 = time.perf_counter()
xs = [jnp.asarray(im) for im in imgs]
jax.block_until_ready(xs)
dt = time.perf_counter() - t0
log(f"pipelined upload (block once): {dt/len(imgs)*1e3:.1f} ms/frame")

# small upload latency
small = np.zeros(16, np.uint8)
t0 = time.perf_counter()
for _ in range(10):
    jax.block_until_ready(jnp.asarray(small))
log(f"small upload RTT: {(time.perf_counter()-t0)*100:.1f} ms")

# small download latency
y = jnp.zeros(16, jnp.uint8)
jax.block_until_ready(y)
t0 = time.perf_counter()
for i in range(10):
    jax.device_get(y + np.uint8(i))
log(f"small compute+download RTT: {(time.perf_counter()-t0)*100:.1f} ms")

# overlap: upload next while computing current (dummy chained compute)
@jax.jit
def burn(x):
    a = x.astype(jnp.float32)
    for _ in range(30):
        a = jnp.tanh(a @ jnp.ones((1241, 1241), jnp.float32) * 1e-6)
    return jnp.sum(a)

b0 = burn(jnp.asarray(imgs[0]).astype(jnp.float32)[0] * 0 + jnp.ones((376,1241)))
jax.block_until_ready(b0)
t0 = time.perf_counter()
pending = None
for im in imgs:
    x = jnp.asarray(im)          # dispatch upload
    r = burn(x[0].astype(jnp.float32))
    if pending is not None:
        jax.device_get(pending)
    pending = r
jax.device_get(pending)
dt = time.perf_counter() - t0
log(f"upload+compute pipelined: {dt/len(imgs)*1e3:.1f} ms/frame")
