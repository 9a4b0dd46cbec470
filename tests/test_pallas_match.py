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

    bi, bd, sd, si = pallas_match.masked_best2(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
    ref_bi, ref_bd, ref_sd = hamming.masked_argmin(
        hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)),
        jnp.asarray(mask))

    bd, sd, bi, si = (np.asarray(bd), np.asarray(sd), np.asarray(bi),
                      np.asarray(si))
    ref_bd, ref_sd, ref_bi = (np.asarray(ref_bd), np.asarray(ref_sd),
                              np.asarray(ref_bi))
    np.testing.assert_array_equal(bd, ref_bd)
    np.testing.assert_array_equal(sd, ref_sd)
    dist = np.asarray(hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    # argmin may differ only between equal-distance candidates
    valid = bd < hamming.INF_DIST
    same = bi[valid] == ref_bi[valid]
    ties = dist[np.nonzero(valid)[0], bi[valid]] == bd[valid]
    assert (same | ties).all()
    assert bd[7] == hamming.INF_DIST
    # runner-up column: its distance equals the reported second (for rows
    # with a real second), and it differs from the best column
    has2 = sd < hamming.INF_DIST
    rows = np.nonzero(has2)[0]
    np.testing.assert_array_equal(dist[rows, si[rows]], sd[rows])
    assert (si[rows] != bi[rows]).all()


def test_masked_best2_matches_matcher_gates():
    """Exactness of the full search_by_projection ratio-gate inputs: the
    kernel's (best, second, second_idx) reproduce the XLA matcher's
    decisions bit-for-bit on a realistic mask density."""
    rng = np.random.default_rng(3)
    M, N = 256, 512
    a = rng.integers(0, 2**32, (M, 8), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, (N, 8), dtype=np.uint64).astype(np.uint32)
    mask = rng.uniform(size=(M, N)) < 0.02   # sparse, like projection gates
    octave = rng.integers(0, 8, N)

    bi, bd, sd, si = pallas_match.masked_best2(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask), interpret=True)
    d = np.where(mask, np.asarray(hamming.distance_matrix(
        jnp.asarray(a), jnp.asarray(b))), hamming.INF_DIST)
    ref_b = d.min(1)
    ref_bi = d.argmin(1)
    d2 = d.copy()
    d2[np.arange(M), ref_bi] = hamming.INF_DIST
    ref_s = d2.min(1)
    ref_si = d2.argmin(1)
    same_lvl_k = octave[np.asarray(bi)] == octave[np.asarray(si)]
    same_lvl_r = octave[ref_bi] == octave[ref_si]
    ratio_k = (~same_lvl_k) | (np.asarray(bd) <= 0.8 * np.asarray(sd))
    ratio_r = (~same_lvl_r) | (ref_b <= 0.8 * ref_s)
    ok = ref_b < hamming.INF_DIST
    # distances always agree; octave-of-runner-up may differ only on ties,
    # where either choice is a valid matcher outcome
    np.testing.assert_array_equal(np.asarray(bd), ref_b)
    np.testing.assert_array_equal(np.asarray(sd), ref_s)
    disagree = np.nonzero(ok & (ratio_k != ratio_r))[0]
    for r in disagree:
        n_at_second = int((d2[r] == ref_s[r]).sum())
        assert n_at_second > 1, (r, n_at_second)
