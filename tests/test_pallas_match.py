"""Pallas fused masked best-2 matcher vs the XLA reference path
(interpret mode on CPU; the same kernel compiles natively on TPU)."""
import numpy as np
import jax.numpy as jnp

from lldslam_tpu.ops import hamming, pallas_match


def test_masked_best2_matches_reference():
    rng = np.random.default_rng(0)
    M, N = 512, 768
    a = rng.integers(0, 2**32, (M, 8), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32)
    mask = rng.uniform(size=(M, N)) < 0.1
    mask[7] = False  # fully-masked row -> INF sentinel

    bi, bd, sd = pallas_match.masked_best2(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
    ref_bi, ref_bd, ref_sd = hamming.masked_argmin(
        hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)),
        jnp.asarray(mask))

    bd, sd, bi = np.asarray(bd), np.asarray(sd), np.asarray(bi)
    ref_bd, ref_sd, ref_bi = (np.asarray(ref_bd), np.asarray(ref_sd),
                              np.asarray(ref_bi))
    np.testing.assert_array_equal(bd, ref_bd)
    np.testing.assert_array_equal(sd, ref_sd)
    # argmin may differ only between equal-distance candidates
    valid = bd < hamming.INF_DIST
    dist = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    same = bi[valid] == ref_bi[valid]
    ties = dist[np.nonzero(valid)[0], bi[valid]] == bd[valid]
    assert (same | ties).all()
    assert bd[7] == hamming.INF_DIST
