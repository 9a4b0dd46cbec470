"""Device-only piece timing: chain n iterations inside one jitted fori_loop,
return a scalar, subtract the 1-iteration run. Immune to tunnel latency and
relay caching."""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def loop_time(make_body, x0, n=20, label=""):
    """make_body: () -> fn(x) -> x-like. Times n-iter vs 1-iter chained."""
    body = make_body()

    def run(k):
        @partial(jax.jit, static_argnames=())
        def f(x):
            def step(i, x):
                return body(x, i)
            x = jax.lax.fori_loop(0, k, step, x)
            return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), x)
        # two timed calls with different inputs to defeat the relay cache
        outs = []
        ts = []
        for j in range(3):
            xj = jax.tree.map(lambda a: a + jnp.asarray(j, a.dtype), x0)
            jax.block_until_ready(xj)
            t0 = time.perf_counter()
            o = f(xj)
            jax.device_get(jax.tree.leaves(o)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts[1:])  # first may compile

    t1 = run(1)
    tn = run(1 + n)
    log(f"{label:28s} {(tn - t1) / n * 1e3:7.2f} ms/iter")
    return (tn - t1) / n * 1e3


def main():
    sys.path.insert(0, "/root/repo")
    from lldslam_tpu.ops import fast, image, orb, stereo
    from lldslam_tpu.config import CameraConfig
    cfg = orb.OrbConfig(n_features=2000)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (2, 376, 1241)).astype(np.float32)
    stack = jnp.asarray(img)

    # whole pyramid build
    def mk_pyr():
        def body(x, i):
            p = image.build_pyramid(x, cfg.n_levels, cfg.scale)
            return x + p[0] * 1e-20
        return body
    loop_time(mk_pyr, stack, label="build_pyramid (pair)")

    # FAST all levels
    pyr = jax.jit(partial(image.build_pyramid, n_levels=cfg.n_levels, scale=cfg.scale))(stack)
    pyr = [jax.block_until_ready(p) for p in pyr]

    def mk_fast():
        def body(x, i):
            s = jax.vmap(lambda a: fast.nms3x3(fast.fast_score_map(a, cfg.min_th)))(x)
            return x + s * 1e-20
        return body
    loop_time(mk_fast, pyr[0], label="FAST+nms L0 (pair)")

    # select L0
    score = jax.jit(lambda x: jax.vmap(lambda a: fast.nms3x3(fast.fast_score_map(a, cfg.min_th)))(x))(pyr[0])
    score = jax.block_until_ready(score)

    def mk_sel():
        def body(x, i):
            xy, s = jax.vmap(lambda a: orb._select_level_keypoints(a, 431, cfg))(x)
            return x + 1e-20 * jnp.sum(s) + 1e-25 * jnp.sum(xy)
        return body
    loop_time(mk_sel, score, label="select L0 (pair)")

    # ic_angle L0
    xy = jax.jit(lambda s: jax.vmap(lambda a: orb._select_level_keypoints(a, 431, cfg))(s)[0].astype(jnp.int32))(score)
    xy = jax.block_until_ready(xy)

    def mk_ic():
        def body(x, i):
            ang = jax.vmap(orb._ic_angle)(x, xy)
            return x + 1e-20 * jnp.sum(ang)
        return body
    loop_time(mk_ic, pyr[0], label="ic_angle L0 (pair)")

    # blur L0
    def mk_blur():
        def body(x, i):
            b = jax.vmap(lambda a: jnp.round(image.gaussian_blur(a)))(x)
            return x + b * 1e-20
        return body
    loop_time(mk_blur, pyr[0], label="blur L0 (pair)")

    # brief L0
    blur = jax.jit(lambda x: jax.vmap(lambda a: jnp.round(image.gaussian_blur(a)))(x))(pyr[0])
    ang = jax.jit(lambda x: jax.vmap(orb._ic_angle)(x, xy))(pyr[0])
    blur, ang = jax.block_until_ready((blur, ang))

    def mk_brief():
        def body(x, i):
            d = jax.vmap(orb._brief_desc)(x, xy, ang)
            return x + 1e-20 * jnp.sum(d.astype(jnp.float32))
        return body
    loop_time(mk_brief, blur, label="brief L0 (pair)")

    # whole extract_pyr
    def mk_ext():
        def body(x, i):
            kp = jax.vmap(partial(orb.extract_pyr, cfg=cfg))(
                tuple([x] + pyr[1:]))
            return x + 1e-20 * jnp.sum(kp.xy) + 1e-25 * jnp.sum(kp.response)
        return body
    loop_time(mk_ext, pyr[0], label="extract_pyr all-L (pair)")

    # stereo match
    cam = CameraConfig(fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
                       bf=386.1448, fps=10.0, width=1241, height=376).stereo_camera()
    kp = jax.jit(lambda p: jax.vmap(partial(orb.extract_pyr, cfg=cfg))(tuple(p)))(pyr)
    kp = jax.block_until_ready(kp)
    kl = jax.tree.map(lambda a: a[0], kp)
    kr = jax.tree.map(lambda a: a[1], kp)
    pl = [p[0] for p in pyr]
    pr = [p[1] for p in pyr]

    def mk_sm():
        def body(x, i):
            ur, d = stereo.match_stereo(
                kl._replace(xy=kl.xy + 1e-20 * x[0, 0]), kr,
                [x[0]] + pl[1:], [x[1]] + pr[1:], cam, cfg)
            return x + 1e-20 * jnp.sum(ur)
        return body
    loop_time(mk_sm, pyr[0], label="match_stereo")


if __name__ == "__main__":
    main()
