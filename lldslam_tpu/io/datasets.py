"""Dataset loaders: KITTI odometry and EuRoC MAV stereo sequences.

Replaces the `LoadImages` helpers of the reference CLI drivers
(Examples/Stereo/stereo_kitti.cc:147-181, stereo_euroc.cc:101-151). Image
decoding stays on host (I/O only, per the design stance SURVEY.md §7); the
arrays handed out are float32 grayscale ready for device upload.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

try:
    from PIL import Image
    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def load_gray(path: str | Path) -> np.ndarray:
    """Grayscale float32 image in [0, 255]."""
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable for image decoding")
    img = Image.open(path)
    if img.mode not in ("L", "I;16"):
        img = img.convert("L")
    arr = np.asarray(img, dtype=np.float32)
    if arr.max() > 255.0:  # 16-bit source
        arr = arr / 256.0
    return arr


@dataclass
class StereoSequence:
    """Lazy stereo sequence: paths + timestamps."""

    left: list
    right: list
    timestamps: np.ndarray

    def __len__(self) -> int:
        return len(self.left)

    def frame(self, i: int):
        return load_gray(self.left[i]), load_gray(self.right[i]), float(self.timestamps[i])


class PrefetchedStereoSequence:
    """StereoSequence backed by the native C++ threaded PNG prefetcher
    (native/loader.cpp): frames decode ahead of the tracker off-thread."""

    def __init__(self, seq: StereoSequence, window: int = 8,
                 n_threads: int = 2):
        from ..native import NativeImageLoader
        self._left = NativeImageLoader(seq.left, window, n_threads)
        self._right = NativeImageLoader(seq.right, window, n_threads)
        self.timestamps = seq.timestamps

    def __len__(self):
        return len(self._left)

    def frame(self, i: int):
        return (self._left.frame(i), self._right.frame(i),
                float(self.timestamps[i]))


def prefetch(seq: StereoSequence, window: int = 8, n_threads: int = 2):
    """Wrap with the native prefetcher when buildable; identity otherwise."""
    try:
        return PrefetchedStereoSequence(seq, window, n_threads)
    except Exception:
        return seq


def load_kitti(seq_dir: str | Path) -> StereoSequence:
    """KITTI odometry layout: <seq>/times.txt, image_0/*.png, image_1/*.png
    (stereo_kitti.cc:147-181: %06d.png naming)."""
    seq_dir = Path(seq_dir)
    times = np.loadtxt(seq_dir / "times.txt", dtype=np.float64).reshape(-1)
    n = len(times)
    left = [seq_dir / "image_0" / f"{i:06d}.png" for i in range(n)]
    right = [seq_dir / "image_1" / f"{i:06d}.png" for i in range(n)]
    return StereoSequence(left=left, right=right, timestamps=times)


def load_euroc(seq_dir: str | Path, times_file: str | Path) -> StereoSequence:
    """EuRoC MAV layout: mav0/cam{0,1}/data/<ns>.png with a timestamp list
    file of nanosecond stamps (stereo_euroc.cc:101-151)."""
    seq_dir = Path(seq_dir)
    stamps = []
    for ln in Path(times_file).read_text().splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        stamps.append(ln.split(",")[0].split()[0])
    left = [seq_dir / "mav0" / "cam0" / "data" / f"{s}.png" for s in stamps]
    right = [seq_dir / "mav0" / "cam1" / "data" / f"{s}.png" for s in stamps]
    times = np.array([int(s) * 1e-9 for s in stamps], np.float64)
    return StereoSequence(left=left, right=right, timestamps=times)
