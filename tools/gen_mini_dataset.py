"""Generate the checked-in mini KITTI-layout test sequence.

Writes tests/data/mini_kitti/: a deterministic 10-frame 320x96 stereo
corridor in the KITTI odometry on-disk layout (image_0/%06d.png,
image_1/%06d.png, times.txt — the layout stereo_kitti.cc:147-181 reads),
plus stored LBD-route line detections (lines_l/, lines_r/ in the
StoredLineExtractor npz format), a reference-format settings YAML, and the
ground-truth trajectory (gt.txt, KITTI 3x4 rows). The CLI end-to-end test
(tests/test_cli_e2e.py) drives the full file route: dataset loader ->
stored-lines disk route -> tracker -> trajectory writer -> ATE.

Deterministic (fixed seeds); re-run after changing the renderer and commit
the result. Total size is kept to a few KB per frame (tiny grayscale PNGs).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("LLDSLAM_NO_COMPILE_CACHE", "1")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from PIL import Image

from bench import _make_sequence
from lldslam_tpu.config import CameraConfig

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "mini_kitti")
N = 10
CAM = CameraConfig(fx=220.0, fy=220.0, cx=160.0, cy=48.0, bf=110.0,
                   fps=10.0, width=320, height=96)

SETTINGS = """%YAML:1.0
Camera.fx: 220.0
Camera.fy: 220.0
Camera.cx: 160.0
Camera.cy: 48.0
Camera.bf: 110.0
Camera.fps: 10.0
Camera.RGB: 0
Camera.width: 320
Camera.height: 96
ThDepth: 35.0
ORBextractor.nFeatures: 400
ORBextractor.nLevels: 4
ORBextractor.scaleFactor: 1.2
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
minInitPoints: 60
ldType: LBDFloat
mdThr: 0.6
gamma: 0.5
minLineLen: 20.0
lineDetectionsPath: lines_l
lineDescriptorsPath: lines_r
"""


def main():
    cam = CAM.stereo_camera()
    frames = _make_sequence(cam, N, seed=5, with_lines=True)
    for sub in ("image_0", "image_1", "lines_l", "lines_r"):
        os.makedirs(os.path.join(OUT, sub), exist_ok=True)
    for i, (l, r) in enumerate(frames):
        Image.fromarray(l).save(
            os.path.join(OUT, "image_0", f"{i:06d}.png"), optimize=True)
        Image.fromarray(r).save(
            os.path.join(OUT, "image_1", f"{i:06d}.png"), optimize=True)
    with open(os.path.join(OUT, "times.txt"), "w") as f:
        for i in range(N):
            f.write(f"{i * 0.1:.6e}\n")

    # ground truth (KITTI 3x4 T_wc rows) — the same pose chain
    # bench._make_sequence integrates
    import jax.numpy as jnp
    from lldslam_tpu.geometry import se3
    xi = np.array([0.0, 0.0, -1.0, 0.0, 0.003, 0.0], np.float32)
    dT = np.asarray(se3.exp(jnp.asarray(xi)))
    T = np.eye(4, dtype=np.float32)
    with open(os.path.join(OUT, "gt.txt"), "w") as f:
        for _ in range(N):
            Twc = np.linalg.inv(T)
            f.write(" ".join(f"{v:.9e}" for v in Twc[:3].reshape(-1)) + "\n")
            T = dT @ T

    # stored-line route files (the reference benchmark configuration:
    # StoredLineExtractor, stereo_kitti.cc:61-85)
    from lldslam_tpu.frontend.line_extract import LineDetConfig, detect_lines
    from lldslam_tpu.io.stored_lines import save_frame_lines
    ldc = LineDetConfig(max_lines=32, min_len=15.0)
    for i, (l, r) in enumerate(frames):
        for img, d in ((l, "lines_l"), (r, "lines_r")):
            kl = detect_lines(jnp.asarray(img), ldc)
            save_frame_lines(os.path.join(OUT, d), i,
                             np.asarray(kl.p1), np.asarray(kl.p2),
                             np.asarray(kl.octave), np.asarray(kl.desc),
                             valid=np.asarray(kl.valid))

    with open(os.path.join(OUT, "settings.yaml"), "w") as f:
        f.write(SETTINGS)
    total = sum(os.path.getsize(os.path.join(dp, fn))
                for dp, _, fns in os.walk(OUT) for fn in fns)
    print(f"wrote {OUT}: {total / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
