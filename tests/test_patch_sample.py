"""Element-exact tests for the Pallas patch sampler and the BRIEF path
through it (interpret mode on CPU; the TPU path compiles the same kernel)."""
import numpy as np
import jax
import jax.numpy as jnp

from lldslam_tpu.ops import orb
from lldslam_tpu.ops import patch_sample as ps


def test_sample_patches_exact():
    rng = np.random.default_rng(0)
    V, H, Wp = 2, 64, 384
    img = np.round(rng.uniform(0, 255, (V, H, Wp))).astype(np.float32)
    n, S = 16, 512
    view = rng.integers(0, V, n).astype(np.int32)
    r0 = rng.integers(0, H - ps.ROWS + 1, n).astype(np.int32)
    c0 = (rng.integers(0, (Wp - ps.COLS) // 128 + 1, n) * 128).astype(np.int32)
    iy = rng.integers(0, ps.ROWS, (n, S)).astype(np.int32)
    ix = rng.integers(0, ps.COLS, (n, S)).astype(np.int32)
    meta = np.stack([view, r0, c0, np.zeros(n, np.int32)], -1)
    got = np.asarray(ps.sample_patches(
        jnp.asarray(img), jnp.asarray(meta), jnp.asarray(iy),
        jnp.asarray(ix), interpret=True))
    want = img[view[:, None], (r0[:, None] + iy), (c0[:, None] + ix)]
    np.testing.assert_array_equal(got, want)


def test_brief_stack_matches_gather_path():
    rng = np.random.default_rng(1)
    V, H, W = 2, 80, 300
    wp = ((W + 127) // 128) * 128
    blur = np.round(rng.uniform(0, 255, (V, H, W))).astype(np.float32)
    n = 24
    xy = np.stack([rng.integers(20, W - 20, n), rng.integers(20, H - 20, n)],
                  -1).astype(np.int32)
    ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    view = rng.integers(0, V, n).astype(np.int32)
    try:
        orb.FORCE_PALLAS_BRIEF = False  # exercise index math w/ interpret off
        blur_p = jnp.asarray(np.pad(blur, ((0, 0), (0, 0), (0, wp - W))))
        # interpret-mode kernel through the same wrapper
        import lldslam_tpu.ops.patch_sample as psm
        orig = psm.sample_patches
        psm.sample_patches = lambda *a, **k: orig(*a, interpret=True)
        try:
            got = np.asarray(orb._brief_desc_stack(
                blur_p, W, jnp.asarray(xy), jnp.asarray(view),
                jnp.asarray(ang)))
        finally:
            psm.sample_patches = orig
    finally:
        orb.FORCE_PALLAS_BRIEF = None
    want = np.stack([
        np.asarray(orb._brief_desc(jnp.asarray(blur[view[i]]),
                                   jnp.asarray(xy[i:i + 1]),
                                   jnp.asarray(ang[i:i + 1])))[0]
        for i in range(n)
    ])
    np.testing.assert_array_equal(got, want)


def test_extract_stack_matches_vmap_extract():
    """extract_stack_pyr (XLA fallback path on CPU) == vmap(extract_pyr)."""
    from functools import partial
    from lldslam_tpu.ops import image
    rng = np.random.default_rng(2)
    cfg = orb.OrbConfig(n_features=300, n_levels=3)
    img = rng.uniform(0, 255, (2, 120, 360)).astype(np.float32)
    pyr = tuple(image.build_pyramid(jnp.asarray(img), cfg.n_levels, cfg.scale))
    a = orb.extract_stack_pyr(pyr, cfg)
    b = jax.vmap(partial(orb.extract_pyr, cfg=cfg))(pyr)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_stereo_sampler_matches_gather_path():
    """match_stereo through the Pallas window sampler (interpret mode) ==
    the XLA stacked-pyramid gather path."""
    from functools import partial
    import jax
    import jax.numpy as jnp
    from lldslam_tpu.ops import image, orb, stereo
    from lldslam_tpu.config import CameraConfig
    rng = np.random.default_rng(5)
    cfg = orb.OrbConfig(n_features=500, n_levels=4)
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=160.0, bf=200.0,
                       fps=10.0, width=640, height=320).stereo_camera()
    imL = np.round(rng.uniform(0, 255, (320, 640))).astype(np.float32)
    imR = np.roll(imL, -7, axis=1) + rng.normal(0, 2, imL.shape).astype(np.float32)
    stack = jnp.asarray(np.stack([imL, np.clip(imR, 0, 255)]))
    pyr = tuple(image.build_pyramid(stack, cfg.n_levels, cfg.scale))
    kp = orb.extract_stack_pyr(pyr, cfg)
    kl = jax.tree.map(lambda a: a[0], kp)
    kr = jax.tree.map(lambda a: a[1], kp)
    pl_ = [p[0] for p in pyr]
    pr_ = [p[1] for p in pyr]

    ur_x, d_x = stereo.match_stereo(kl, kr, pl_, pr_, cam, cfg)

    import lldslam_tpu.ops.patch_sample as psm
    orig = psm.sample_patches
    psm.sample_patches = lambda *a, **k: orig(*a, interpret=True)
    try:
        orb.FORCE_PALLAS_BRIEF = True
        ur_p, d_p = jax.jit(
            lambda *a: stereo.match_stereo.__wrapped__(*a, cam=cam, cfg=cfg)
        )(kl, kr, pl_, pr_)
    finally:
        psm.sample_patches = orig
        orb.FORCE_PALLAS_BRIEF = None
    np.testing.assert_array_equal(np.asarray(ur_p), np.asarray(ur_x))
    np.testing.assert_array_equal(np.asarray(d_p), np.asarray(d_x))
