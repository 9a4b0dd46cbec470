"""Raw sample_patches oracle check on the real TPU (compiled, not interpret)."""
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lldslam_tpu.ops import patch_sample as ps

rng = np.random.default_rng(0)
V, H, Wp = 2, 376, 1280
img = np.round(rng.uniform(0, 255, (V, H, Wp))).astype(np.float32)
n, S = 256, 512
view = rng.integers(0, V, n).astype(np.int32)
r0 = (rng.integers(0, (H - ps.ROWS) // 8 + 1, n) * 8).astype(np.int32)
c0 = (rng.integers(0, (Wp - ps.COLS) // 128 + 1, n) * 128).astype(np.int32)
iy = rng.integers(0, ps.ROWS, (n, S)).astype(np.int32)
ix = rng.integers(0, ps.COLS, (n, S)).astype(np.int32)
meta = np.stack([view, r0, c0, np.zeros(n, np.int32)], -1)
got = np.asarray(ps.sample_patches(
    jnp.asarray(img), jnp.asarray(meta), jnp.asarray(iy), jnp.asarray(ix)))
want = img[view[:, None], (r0[:, None] + iy), (c0[:, None] + ix)]
bad = got != want
print("mismatch elements:", bad.sum(), "/", bad.size, flush=True)
if bad.any():
    i, s = np.nonzero(bad)
    for k in range(min(10, len(i))):
        a, b = i[k], s[k]
        print(f"  kp{a} samp{b}: got {got[a,b]} want {want[a,b]} "
              f"iy={iy[a,b]} ix={ix[a,b]} view={view[a]} r0={r0[a]} c0={c0[a]} j={a%ps.KB}")
    # pattern analysis
    print("bad by j within block:", np.bincount(i % ps.KB, minlength=ps.KB))
    print("bad iy range:", iy[bad].min(), iy[bad].max(),
          "bad ix range:", ix[bad].min(), ix[bad].max())
