"""Probe: does the axon relay serialize concurrent fetch RPCs?

Fetches two READY device buffers (a) sequentially, (b) concurrently from two
threads, and also measures whether an in-flight fetch delays a dispatch.
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def t():
    return time.perf_counter()


def main():
    sz = 256 * 1024 // 4  # 256 KB
    f = jax.jit(lambda x, s: x * s)
    bufs = [f(jnp.arange(sz, dtype=jnp.int32), i) for i in range(8)]
    for b in bufs:
        np.asarray(b)  # force completion once
    # fresh copies (relay may cache identical fetches?) — use distinct bufs
    bufs = [f(jnp.arange(sz, dtype=jnp.int32), 100 + i) for i in range(8)]
    _ = np.asarray(bufs[0])  # complete the program

    # sequential
    t0 = t()
    for b in bufs[1:4]:
        np.asarray(b)
    seq = t() - t0
    print(f"sequential 3 fetches of 256KB ready bufs: {1e3 * seq:.1f} ms")

    # concurrent
    ex = ThreadPoolExecutor(max_workers=3)
    t0 = t()
    futs = [ex.submit(np.asarray, b) for b in bufs[4:7]]
    for fu in futs:
        fu.result()
    con = t() - t0
    print(f"concurrent 3 fetches of 256KB ready bufs: {1e3 * con:.1f} ms")

    # dispatch delay while a big fetch is in flight
    big = f(jnp.arange(8 * 1024 * 1024 // 4, dtype=jnp.int32), 7)  # 8 MB
    _ = np.asarray(big[:1])
    small = jnp.arange(128, dtype=jnp.int32)
    t0 = t()
    f(small, 3)
    base_disp = t() - t0
    fu = ex.submit(np.asarray, big)
    time.sleep(0.005)
    t0 = t()
    f(small, 4)
    disp_during = t() - t0
    fu.result()
    print(f"dispatch alone {1e3 * base_disp:.1f} ms; "
          f"during 8MB fetch {1e3 * disp_during:.1f} ms")

    # fresh-output fetch latency vs compute time
    for n in (1, 4):
        xs = jnp.arange(sz, dtype=jnp.int32)
        t0 = t()
        for i in range(n):
            xs = f(xs, i + 1)
        d = t() - t0
        t0 = t()
        np.asarray(xs)
        g = t() - t0
        print(f"chain of {n} dispatches {1e3 * d:.1f} ms; "
              f"fresh fetch {1e3 * g:.1f} ms")


if __name__ == "__main__":
    main()
