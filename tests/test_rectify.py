"""Undistort+rectify maps (ops/rectify.py) against the forward model."""
import numpy as np
import jax.numpy as jnp

from lldslam_tpu.ops import rectify


def test_identity_maps():
    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    P = K.copy()
    mx, my = rectify.make_rectify_maps(K, np.zeros(4), np.eye(3), P,
                                       (640, 480))
    u, v = np.meshgrid(np.arange(640), np.arange(480))
    np.testing.assert_allclose(mx, u, atol=1e-4)
    np.testing.assert_allclose(my, v, atol=1e-4)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (480, 640)).astype(np.float32)
    out = np.asarray(rectify.remap(jnp.asarray(img), jnp.asarray(mx),
                                   jnp.asarray(my)))
    np.testing.assert_allclose(out, img, atol=0.5)  # border-clamp blend at last row/col


def test_distorted_point_lands_at_pinhole_position():
    """Place a dot at the DISTORTED projection of a 3D point in the raw
    image; after rectification it must appear at the pinhole projection."""
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    D = np.array([-0.28, 0.07, 2e-4, 1.8e-5])  # EuRoC-like radial-tangential
    P = np.array([[435.2, 0, 367.45, 0], [0, 435.2, 252.2, 0], [0, 0, 1, 0]])
    R = np.eye(3)
    size = (752, 480)

    X = np.array([0.4, -0.25, 2.0])
    xn, yn = X[0] / X[2], X[1] / X[2]
    r2 = xn * xn + yn * yn
    radial = 1 + D[0] * r2 + D[1] * r2 * r2
    xd = xn * radial + 2 * D[2] * xn * yn + D[3] * (r2 + 2 * xn * xn)
    yd = yn * radial + D[2] * (r2 + 2 * yn * yn) + 2 * D[3] * xn * yn
    u_raw = K[0, 0] * xd + K[0, 2]
    v_raw = K[1, 1] * yd + K[1, 2]
    img = np.zeros((size[1], size[0]), np.float32)
    iu, iv = int(round(u_raw)), int(round(v_raw))
    img[iv - 1:iv + 2, iu - 1:iu + 2] = 255.0

    mx, my = rectify.make_rectify_maps(K, D, R, P, size)
    out = np.asarray(rectify.remap(jnp.asarray(img), jnp.asarray(mx),
                                   jnp.asarray(my)))
    yy, xx = np.unravel_index(np.argmax(out), out.shape)
    u_exp = P[0, 0] * xn + P[0, 2]
    v_exp = P[1, 1] * yn + P[1, 2]
    assert abs(xx - u_exp) < 2.0 and abs(yy - v_exp) < 2.0, \
        (xx, yy, u_exp, v_exp)
