"""Steady-state ingest probe: what frame rate can the tunnel sustain for a
KITTI-sized stereo pair (2x 376x1241 uint8 ~ 933KB/frame) under different
upload batching patterns, with a lag-2 pipelined readback?"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def work(x):
    # stand-in for build_frame+track: a couple of reductions
    return jnp.stack([x.sum(), (x.astype(jnp.float32) ** 2).sum()])


def run(pairs, mode, B=4, lag=2):
    N = len(pairs)
    outs = [None] * N
    # warm
    w = work(jnp.asarray(pairs[0]))
    np.asarray(w)
    t0 = time.perf_counter()
    if mode == "per2":   # two separate uploads per frame (round-2 behavior)
        for i in range(N):
            l = jnp.asarray(pairs[i][0])
            r = jnp.asarray(pairs[i][1])
            outs[i] = work(jnp.stack([l, r]))
            outs[i].copy_to_host_async()
            if i >= lag:
                np.asarray(outs[i - lag])
    elif mode == "stack":  # one stacked upload per frame
        for i in range(N):
            x = jnp.asarray(np.stack(pairs[i]))
            outs[i] = work(x)
            outs[i].copy_to_host_async()
            if i >= lag:
                np.asarray(outs[i - lag])
    elif mode == "batch":  # one upload per B frames
        for i0 in range(0, N, B):
            blk = np.stack([np.stack(p) for p in pairs[i0:i0 + B]])
            xb = jnp.asarray(blk)
            for j in range(len(blk)):
                i = i0 + j
                outs[i] = work(xb[j])
                outs[i].copy_to_host_async()
                if i >= lag:
                    np.asarray(outs[i - lag])
    for i in range(max(0, N - lag), N):
        np.asarray(outs[i])
    dt = time.perf_counter() - t0
    print(f"{mode:6s} B={B}: {N / dt:6.1f} fps  ({1e3 * dt / N:.1f} ms/frame)")


def main():
    H, W = 376, 1241
    rng = np.random.default_rng(0)
    N = 40
    pairs = [(rng.integers(0, 255, (H, W), dtype=np.uint8),
              rng.integers(0, 255, (H, W), dtype=np.uint8))
             for _ in range(N)]
    for mode, B in (("per2", 1), ("stack", 1), ("batch", 2), ("batch", 4),
                    ("batch", 8)):
        run(pairs, mode, B)
    # upload-channel vs execution overlap: does a big upload stall queued
    # executions' acks?
    x = jnp.asarray(np.stack(pairs[0]))
    o = work(x)
    np.asarray(o)
    t0 = time.perf_counter()
    o = work(x)
    y = jnp.asarray(np.stack(pairs[1]))  # upload while work in flight
    np.asarray(o)
    print(f"exec-sync with upload in flight: {1e3*(time.perf_counter()-t0):.1f} ms")


if __name__ == "__main__":
    main()
