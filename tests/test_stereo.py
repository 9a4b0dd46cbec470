"""Stereo matching test: synthetic stereo pair with known constant-depth shift
-> recovered disparity must match (contract of Frame::ComputeStereoMatches,
reference src/Frame.cc:530-704)."""
import numpy as np
import jax.numpy as jnp

from lldslam_tpu.geometry.camera import StereoCamera
from lldslam_tpu.ops import image, orb, stereo
from tests.test_orb import synth_image


def test_constant_disparity_recovery():
    disp_true = 12.6
    h, w = 240, 320
    base = synth_image(h, w + 40, seed=7).astype(np.float32)
    # left = crop at x0+disp, right = crop at x0 -> uL - uR = disp_true
    xs = np.arange(w) + 20.0
    yy = np.arange(h)
    # stereo: same scene point appears at u_R = u_L - disparity (shifted left
    # in the right view)
    left = np.stack([np.interp(xs - disp_true / 2, np.arange(w + 40), base[y]) for y in yy])
    right = np.stack([np.interp(xs + disp_true / 2, np.arange(w + 40), base[y]) for y in yy])

    cam = StereoCamera(fx=300.0, fy=300.0, cx=w / 2, cy=h / 2, bf=120.0, width=w, height=h)
    cfg = orb.OrbConfig(n_features=400)
    kl = orb.extract(jnp.asarray(left), cfg)
    kr = orb.extract(jnp.asarray(right), cfg)
    pl = image.build_pyramid(jnp.asarray(left), cfg.n_levels, cfg.scale)
    pr = image.build_pyramid(jnp.asarray(right), cfg.n_levels, cfg.scale)
    u_r, depth = stereo.match_stereo(kl, kr, pl, pr, cam, cfg)

    u_r = np.asarray(u_r)
    matched = u_r > 0
    # decent match coverage among valid left keypoints
    n_valid = int(np.asarray(kl.valid).sum())
    assert matched.sum() > 0.3 * n_valid, (matched.sum(), n_valid)
    disp = np.asarray(kl.xy)[:, 0][matched] - u_r[matched]
    err = np.abs(disp - disp_true)
    # subpixel refinement: median within 0.3 px of ground truth
    assert np.median(err) < 0.3, np.median(err)
    # depth consistent with bf/disp
    d = np.asarray(depth)[matched]
    np.testing.assert_allclose(
        np.median(d), 120.0 / disp_true, rtol=0.05
    )
