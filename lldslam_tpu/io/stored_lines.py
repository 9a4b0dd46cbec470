"""Precomputed line detections on disk — the StoredLineExtractor contract.

The reference's benchmark configuration does not detect lines online: an
external tool writes per-frame detections + LBD descriptors and
`StoredLineExtractor` loads them by frame id (SURVEY.md §0.1;
`lineDetectionsPath`/`lineDescriptorsPath` with `$SSS` substitution,
KITTI04-12_LBD.yaml:73-75; `SetFrameId` + `ExtractLines` call sites,
stereo_kitti.cc:84-85, Frame.cc:116-117).

This module defines the rebuild's storage format (one `%06d.npz` per frame
per camera: p1, p2, octave, desc float32) plus a writer so our own detector
can precompute sequences offline. LBDMOD's binary format is undocumented
outside that library; conversion happens once through this format.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


def save_frame_lines(dir_path: str | Path, frame_id: int, p1, p2, octave,
                     desc, valid=None) -> None:
    dir_path = Path(dir_path)
    dir_path.mkdir(parents=True, exist_ok=True)
    p1, p2 = np.asarray(p1), np.asarray(p2)
    octave, desc = np.asarray(octave), np.asarray(desc)
    if valid is not None:
        sel = np.asarray(valid)
        p1, p2, octave, desc = p1[sel], p2[sel], octave[sel], desc[sel]
    np.savez(dir_path / f"{frame_id:06d}.npz",
             p1=p1.astype(np.float32), p2=p2.astype(np.float32),
             octave=octave.astype(np.int32), desc=desc.astype(np.float32))


class StoredLineSource:
    """Per-frame line loader (`StoredLineExtractor` equivalent).

    `frame(i)` returns a frontend.line_extract.KeyLines padded to `cap`.
    """

    def __init__(self, dir_path: str | Path, cap: int = 64,
                 desc_dim: int = 40):
        self.dir = Path(dir_path)
        self.cap = cap
        self.desc_dim = desc_dim

    def frame(self, frame_id: int):
        import jax.numpy as jnp
        from ..frontend.line_extract import KeyLines

        path = self.dir / f"{frame_id:06d}.npz"
        cap, D = self.cap, self.desc_dim
        p1 = np.zeros((cap, 2), np.float32)
        p2 = np.zeros((cap, 2), np.float32)
        octave = np.zeros(cap, np.int32)
        desc = np.zeros((cap, D), np.float32)
        valid = np.zeros(cap, bool)
        if path.exists():
            z = np.load(path)
            n = min(len(z["p1"]), cap)
            p1[:n] = z["p1"][:n]
            p2[:n] = z["p2"][:n]
            octave[:n] = z["octave"][:n]
            d = z["desc"][:n]
            desc[:n, : min(D, d.shape[1])] = d[:, : min(D, d.shape[1])]
            valid[:n] = True
        length = np.linalg.norm(p2 - p1, axis=-1) * valid
        return KeyLines(
            p1=jnp.asarray(p1), p2=jnp.asarray(p2),
            octave=jnp.asarray(octave), length=jnp.asarray(length),
            desc=jnp.asarray(desc), valid=jnp.asarray(valid),
        )


def precompute_sequence(seq, out_left: str | Path, out_right: str | Path,
                        cfg=None) -> int:
    """Run the native detector over a StereoSequence and store detections —
    the offline tool the reference assumes exists (README.md:80 download)."""
    import jax.numpy as jnp
    from ..frontend.line_extract import LineDetConfig, detect_lines

    cfg = cfg or LineDetConfig()
    for i in range(len(seq)):
        imL, imR, _ = seq.frame(i)
        for img, out in ((imL, out_left), (imR, out_right)):
            kl = detect_lines(jnp.asarray(img), cfg)
            save_frame_lines(out, i, np.asarray(kl.p1), np.asarray(kl.p2),
                             np.asarray(kl.octave), np.asarray(kl.desc),
                             np.asarray(kl.valid))
    return len(seq)
