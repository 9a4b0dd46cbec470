"""Probe axon-tunnel latency characteristics that set the perf design:
- blocking device_get round-trip latency vs payload size
- host->device upload cost (per-array round trip or pipelined?)
- copy_to_host_async overlap: can a readback hide behind later dispatches?
- dispatch cost of a jitted program with many vs few input arrays
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, n=10):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)

    # 1. blocking readback RT vs size
    for kb in (1, 64, 1024):
        a = jnp.zeros(kb * 256, jnp.float32)  # kb KB
        a.block_until_ready()
        ms = t(lambda: np.asarray(a))
        print(f"device_get {kb:5d}KB: {ms:.1f} ms")

    # 2. upload cost: one big vs many small
    big = np.zeros(1 << 20, np.float32)  # 4 MB
    ms = t(lambda: jnp.asarray(big).block_until_ready())
    print(f"upload 4MB (1 array): {ms:.1f} ms")
    smalls = [np.zeros(1024, np.float32) for _ in range(12)]

    def up12():
        xs = [jnp.asarray(s) for s in smalls]
        for x in xs:
            x.block_until_ready()
    print(f"upload 12x4KB: {t(up12):.1f} ms")

    def up12_seq():
        for s in smalls:
            jnp.asarray(s).block_until_ready()
    print(f"upload 12x4KB serialized-sync: {t(up12_seq):.1f} ms")

    # 3. dispatch-only cost of a jitted fn with 12 device-resident args
    xs = [jnp.zeros((256, 256), jnp.float32) for _ in range(12)]

    @jax.jit
    def f12(*a):
        s = a[0]
        for x in a[1:]:
            s = s + x
        return s

    r = f12(*xs)
    r.block_until_ready()

    def disp():
        f12(*xs)
    print(f"dispatch jitted(12 args), no sync: {t(disp):.2f} ms")
    ms = t(lambda: f12(*xs).block_until_ready())
    print(f"dispatch+sync jitted(12 args): {ms:.1f} ms")

    # 4. async copy overlap: dispatch chain, async-copy first result,
    #    then dispatch more work, then read: is the copy hidden?
    @jax.jit
    def heavy(x):
        for _ in range(8):
            x = jnp.tanh(x @ x)
        return x

    x = jnp.ones((1024, 1024), jnp.float32)
    heavy(x).block_until_ready()
    out_small = f12(*xs)
    out_small.block_until_ready()

    def sync_then_get():
        o = f12(*xs)
        h = heavy(x)
        r = np.asarray(o)
        h.block_until_ready()
        return r

    print(f"pattern A (get o then sync heavy): {t(sync_then_get):.1f} ms")

    def async_then_get():
        o = f12(*xs)
        o.copy_to_host_async()
        h = heavy(x)
        h.block_until_ready()
        r = np.asarray(o)
        return r

    print(f"pattern B (async copy o, sync heavy, then get): {t(async_then_get):.1f} ms")

    def heavy_only():
        heavy(x).block_until_ready()

    print(f"heavy alone: {t(heavy_only):.1f} ms")

    # 5. back-to-back blocking gets: do two 60KB readbacks pay 2 RTs?
    a = jnp.zeros(15000, jnp.int32)
    b = jnp.zeros(15000, jnp.int32)
    jax.block_until_ready((a, b))
    print(f"get 60KB x1: {t(lambda: np.asarray(a)):.1f} ms")

    def get2():
        np.asarray(a)
        np.asarray(b)
    print(f"get 60KB x2 sequential: {t(get2):.1f} ms")

    def get2_async():
        a.copy_to_host_async()
        b.copy_to_host_async()
        np.asarray(a)
        np.asarray(b)
    print(f"get 60KB x2 async-prefetched: {t(get2_async):.1f} ms")


if __name__ == "__main__":
    main()
