"""On TPU: kernel-sampled BRIEF vs XLA-gather BRIEF from the SAME blur."""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from lldslam_tpu.ops import orb

rng = np.random.default_rng(3)
V, H, W = 2, 376, 1241
wp = ((W + 127) // 128) * 128
blur = np.round(rng.uniform(0, 255, (V, H, W))).astype(np.float32)
n = 864
xy = np.stack([rng.integers(16, W - 16, n), rng.integers(16, H - 16, n)],
              -1).astype(np.int32)
ang = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
view = rng.integers(0, V, n).astype(np.int32)

blur_p = jnp.asarray(np.pad(blur, ((0, 0), (0, 0), (0, wp - W))))
got = np.asarray(orb._brief_desc_stack(
    blur_p, W, jnp.asarray(xy), jnp.asarray(view), jnp.asarray(ang)))
want = np.zeros_like(got)
jb = jnp.asarray(blur)
for v in range(V):
    sel = view == v
    want[sel] = np.asarray(orb._brief_desc(
        jb[v], jnp.asarray(xy[sel]), jnp.asarray(ang[sel])))
bad = (got != want).any(-1)
print("desc mismatch rows:", bad.sum(), "/", n, flush=True)
if bad.any():
    i = np.nonzero(bad)[0][:5]
    for k in i:
        x = np.ascontiguousarray(got[k] ^ want[k]).view(np.uint8)
        print(f"  row {k}: xy={xy[k]} ham={np.unpackbits(x).sum()}")

# same blur, same angle: also compare raw sampled values
from lldslam_tpu.ops import patch_sample as ps
gy, gx = orb._rotated_taps(jnp.asarray(xy), jnp.asarray(ang), H, W)
gy, gx = np.asarray(gy), np.asarray(gx)
x, y = xy[:, 0], xy[:, 1]
r0 = np.clip(((y - 19) // 8) * 8, 0, H - ps.ROWS)
c0 = np.clip(((x - 19) // 128) * 128, 0, wp - ps.COLS)
iy = np.concatenate([gy[:, :, 0], gy[:, :, 1]], 1) - r0[:, None]
ix = np.concatenate([gx[:, :, 0], gx[:, :, 1]], 1) - c0[:, None]
assert iy.min() >= 0 and iy.max() < ps.ROWS, (iy.min(), iy.max())
assert ix.min() >= 0 and ix.max() < ps.COLS, (ix.min(), ix.max())
meta = np.stack([view, r0, c0, np.zeros(n, np.int32)], -1)
vals = np.asarray(ps.sample_patches(
    blur_p, jnp.asarray(meta), jnp.asarray(iy), jnp.asarray(ix)))
want_v = blur[view[:, None], np.concatenate([gy[:, :, 0], gy[:, :, 1]], 1),
              np.concatenate([gx[:, :, 0], gx[:, :, 1]], 1)]
print("val mismatches:", (vals != want_v).sum(), "/", vals.size)
