"""Line detection (frontend/line_extract.py) and stereo line matching
(frontend/line_match.py) on synthetic renders with known 3D segments."""
import numpy as np
import jax.numpy as jnp

from lldslam_tpu.frontend import line_extract, line_match
from lldslam_tpu.geometry import lines as gl
from lldslam_tpu.geometry.camera import StereoCamera

W, H = 512, 384
CAM = StereoCamera(fx=400.0, fy=400.0, cx=W / 2, cy=H / 2, bf=200.0,
                   width=W, height=H)


def _draw_segment(img, p1, p2, width=2, value=200.0, value2=None):
    """Rasterize a segment whose brightness ramps value -> value2 along it
    (gives the band descriptor a distinctive profile per segment)."""
    if value2 is None:
        value2 = value
    # anti-aliased: perpendicular soft profile so the detector's subpixel
    # line fit sees the true geometric line, not a rasterization staircase
    n = int(np.linalg.norm(p2 - p1) * 3) + 1
    d = (p2 - p1) / max(np.linalg.norm(p2 - p1), 1e-6)
    nrm = np.array([-d[1], d[0]])
    for t in np.linspace(0, 1, n):
        c = p1 + t * (p2 - p1)
        v = value + t * (value2 - value)
        for o in np.arange(-width / 2 - 1.0, width / 2 + 1.01, 0.5):
            x, y = c + o * nrm
            w_prof = max(0.0, 1.0 - max(0.0, abs(o) - width / 2))
            xi, yi = int(np.floor(x)), int(np.floor(y))
            fx, fy = x - xi, y - yi
            if 0 <= xi < W - 1 and 0 <= yi < H - 1:
                for (dy, dx, wb) in ((0, 0, (1 - fy) * (1 - fx)),
                                     (0, 1, (1 - fy) * fx),
                                     (1, 0, fy * (1 - fx)),
                                     (1, 1, fy * fx)):
                    img[yi + dy, xi + dx] = max(
                        img[yi + dy, xi + dx], 20.0 + wb * w_prof * (v - 20.0))


def _render_segments(segs3d, T_cw):
    """Project 3D segments and rasterize into an image; returns (img, 2D)."""
    img = np.full((H, W), 20.0, np.float32)
    img += np.random.default_rng(0).uniform(0, 4, (H, W)).astype(np.float32)
    out2d = []
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    styles = [(1, 90.0, 250.0), (2, 250.0, 120.0), (3, 160.0, 160.0),
              (2, 95.0, 160.0), (1, 230.0, 230.0), (3, 120.0, 255.0),
              (2, 200.0, 90.0), (1, 150.0, 95.0)]
    for i, (A, B) in enumerate(segs3d):
        Ac, Bc = R @ A + t, R @ B + t
        if Ac[2] < 0.5 or Bc[2] < 0.5:
            out2d.append(None)
            continue
        a = np.array([CAM.fx * Ac[0] / Ac[2] + CAM.cx, CAM.fy * Ac[1] / Ac[2] + CAM.cy])
        b = np.array([CAM.fx * Bc[0] / Bc[2] + CAM.cx, CAM.fy * Bc[1] / Bc[2] + CAM.cy])
        w, v1, v2 = styles[i % len(styles)]
        _draw_segment(img, a, b, width=w, value=v1, value2=v2)
        out2d.append((a, b))
    return img, out2d


def _segs3d(rng, n=6):
    """Well-separated 3D segments in front of the camera."""
    segs = []
    for i in range(n):
        mid = np.array([rng.uniform(-4, 4), rng.uniform(-2.5, 2.5),
                        rng.uniform(6, 14)])
        d = rng.normal(size=3)
        d[2] *= 0.2
        d /= np.linalg.norm(d)
        half = rng.uniform(1.0, 2.5)
        segs.append((mid - half * d, mid + half * d))
    return segs


def test_detect_lines_finds_segments():
    rng = np.random.default_rng(5)
    segs = _segs3d(rng)
    img, segs2d = _render_segments(segs, np.eye(4, dtype=np.float32))
    kl = line_extract.detect_lines(jnp.asarray(img))
    kl = type(kl)(*[np.asarray(x) for x in kl])
    found = kl.valid.sum()
    assert found >= len([s for s in segs2d if s is not None]) - 1
    # each rendered segment should have a detection within a few px
    hits = 0
    for s in segs2d:
        if s is None:
            continue
        a, b = s
        leq = np.asarray(gl.line_eq_from_endpoints(jnp.asarray(a), jnp.asarray(b)))
        for i in np.nonzero(kl.valid)[0]:
            d1 = abs(leq @ np.r_[kl.p1[i], 1.0])
            d2 = abs(leq @ np.r_[kl.p2[i], 1.0])
            mid_det = 0.5 * (kl.p1[i] + kl.p2[i])
            mid_gt = 0.5 * (a + b)
            if d1 < 3 and d2 < 3 and np.linalg.norm(mid_det - mid_gt) < 40:
                hits += 1
                break
    assert hits >= len([s for s in segs2d if s is not None]) - 1


def test_descriptor_stability_across_views():
    """The same 3D segment seen from two nearby poses should have a smaller
    descriptor distance than two different segments."""
    rng = np.random.default_rng(6)
    segs = _segs3d(rng, 4)
    T0 = np.eye(4, dtype=np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T1[:3, 3] = [0.05, 0.0, -0.1]
    img0, s2d0 = _render_segments(segs, T0)
    img1, _ = _render_segments(segs, T1)
    k0 = line_extract.detect_lines(jnp.asarray(img0))
    k1 = line_extract.detect_lines(jnp.asarray(img1))
    d0, d1 = np.asarray(k0.desc), np.asarray(k1.desc)
    v0, v1 = np.asarray(k0.valid), np.asarray(k1.valid)
    assert v0.sum() >= 3 and v1.sum() >= 3
    dist = np.linalg.norm(d0[v0][:, None] - d1[v1][None], axis=-1)
    # row-wise best should be clearly below the row-wise median
    best = dist.min(axis=1)
    med = np.median(dist, axis=1)
    assert (best < 0.7 * med).mean() > 0.6


def _assign_to_gt(k, segs2d, tol=5.0):
    """Best GT segment index per detection (-1 when none within tol)."""
    p1, p2, v = np.asarray(k.p1), np.asarray(k.p2), np.asarray(k.valid)
    out = np.full(len(p1), -1)
    for i in np.nonzero(v)[0]:
        best, bi = tol, -1
        for j, s in enumerate(segs2d):
            if s is None:
                continue
            leq = np.asarray(gl.line_eq_from_endpoints(
                jnp.asarray(s[0]), jnp.asarray(s[1])))
            d = abs(leq @ np.r_[p1[i], 1.0]) + abs(leq @ np.r_[p2[i], 1.0])
            if d < best:
                best, bi = d, j
        out[i] = bi
    return out


def test_stereo_line_matching_triangulates():
    rng = np.random.default_rng(7)
    segs = _segs3d(rng)
    T_l = np.eye(4, dtype=np.float32)
    T_r = np.eye(4, dtype=np.float32)
    T_r[0, 3] = -CAM.baseline
    imgL, s2dL = _render_segments(segs, T_l)
    imgR, s2dR = _render_segments(segs, T_r)
    kl = line_extract.detect_lines(jnp.asarray(imgL))
    kr = line_extract.detect_lines(jnp.asarray(imgR))
    fl = line_match.match_stereo_lines(CAM, kl, kr)
    has = np.asarray(fl.has_stereo)
    r_idx = np.asarray(fl.r_idx)
    assert has.sum() >= 5, f"only {has.sum()} stereo line matches"
    # match identity: both sides must belong to the same GT segment
    gt_l = _assign_to_gt(kl, s2dL)
    gt_r = _assign_to_gt(kr, s2dR)
    sel = np.nonzero(has)[0]
    correct = [i for i in sel if gt_l[i] >= 0 and gt_l[i] == gt_r[r_idx[i]]]
    known = [i for i in sel if gt_l[i] >= 0 or gt_r[r_idx[i]] >= 0]
    assert len(correct) >= max(4, int(0.7 * max(len(known), 1)))
    # triangulated 3D accuracy for correct pairs: endpoint-disparity noise
    # at z~10 m, b=0.5 m is ~0.5 m per px, so tolerances are loose
    dots, perps = [], []
    X0 = np.asarray(fl.X0)
    d = np.asarray(fl.d)
    for i in correct:
        A, B = segs[gt_l[i]]
        dt = (B - A) / np.linalg.norm(B - A)
        dots.append(abs(dt @ d[i]))
        r = A - X0[i]
        perps.append(np.linalg.norm(r - (r @ d[i]) * d[i]))
    assert np.median(dots) > 0.90  # single-pair stereo line direction is noise-limited; BA refines
    assert np.median(perps) < 1.0
