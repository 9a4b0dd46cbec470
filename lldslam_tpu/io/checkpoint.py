"""Map checkpoint / restore.

The reference acknowledges SaveMap/LoadMap as an unimplemented TODO
(System.h:118-120). The SoA map makes it trivial (SURVEY.md §5.4): one
compressed npz snapshot of every store array + scalar counters, plus the
tracker's trajectory log so a restored session can keep exporting full
trajectories.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from ..slammap.map_store import MapStore

_SCALARS = ("n_kf", "n_pt", "n_ln")


def save_map(store: MapStore, path: str | Path, extra: dict | None = None):
    arrays = {
        k: v for k, v in vars(store).items()
        if isinstance(v, np.ndarray)
    }
    scalars = {k: getattr(store, k) for k in _SCALARS}
    np.savez_compressed(path, __scalars__=np.array(
        [scalars[k] for k in _SCALARS], np.int64), **arrays,
        **{f"extra_{k}": v for k, v in (extra or {}).items()})


def load_map(store: MapStore, path: str | Path) -> dict:
    """Restore arrays into an existing (capacity-compatible) store.
    Returns any `extra` arrays that were saved alongside."""
    z = np.load(path)
    for k in z.files:
        if k == "__scalars__" or k.startswith("extra_"):
            continue
        dst = getattr(store, k, None)
        if isinstance(dst, np.ndarray) and dst.shape == z[k].shape:
            dst[...] = z[k]
        else:
            setattr(store, k, z[k])
    sc = z["__scalars__"]
    for name, val in zip(_SCALARS, sc):
        setattr(store, name, int(val))
    return {k[6:]: z[k] for k in z.files if k.startswith("extra_")}
