"""ops/bitonic.py: the run-merge must equal a full sort's top-k exactly
(same keys, payloads following their keys)."""

import numpy as np
import jax.numpy as jnp
import pytest

from torchpq_tpu.ops.bitonic import merge_runs_topk, NEG


def _make_runs(rng, nq, r, w, neg_frac=0.0):
    keys = rng.integers(-2 ** 30, 2 ** 30, size=(nq, r, w)).astype(np.int32)
    if neg_frac:
        mask = rng.random((nq, r, w)) < neg_frac
        keys = np.where(mask, np.int32(-2 ** 31), keys)
    # descending runs (NB: negate-then-sort overflows at INT32_MIN)
    keys = np.sort(keys, axis=-1)[..., ::-1].copy()
    payload = rng.integers(0, 2 ** 20, size=(nq, r, w)).astype(np.int32)
    return keys, payload


@pytest.mark.parametrize("r,w,k", [(8, 64, 100), (4, 16, 10), (3, 5, 7),
                                   (1, 32, 32), (32, 16, 100), (2, 128, 1)])
def test_merge_matches_full_sort(r, w, k):
    rng = np.random.default_rng(0)
    nq = 17
    keys, payload = _make_runs(rng, nq, r, w)
    got_k, got_p = merge_runs_topk(jnp.asarray(keys), jnp.asarray(payload), k)
    got_k, got_p = np.asarray(got_k), np.asarray(got_p)
    kk = min(k, r * w)
    assert got_k.shape == (nq, kk)
    flat_k = keys.reshape(nq, -1)
    want_k = -np.sort(-flat_k, axis=-1)[:, :kk]
    np.testing.assert_array_equal(got_k, want_k)
    # payloads follow their keys (keys here are almost surely unique per
    # row; skip rows with duplicates to keep the check exact)
    flat_p = payload.reshape(nq, -1)
    for i in range(nq):
        if len(np.unique(flat_k[i])) != flat_k.shape[1]:
            continue
        order = np.argsort(-flat_k[i], kind="stable")[:kk]
        np.testing.assert_array_equal(got_p[i], flat_p[i][order])


def test_neg_padding_never_wins():
    rng = np.random.default_rng(1)
    nq, r, w, k = 5, 4, 8, 16
    keys, payload = _make_runs(rng, nq, r, w, neg_frac=0.6)
    got_k, _ = merge_runs_topk(jnp.asarray(keys), jnp.asarray(payload), k)
    # no negate-then-sort: keys contain INT32_MIN, whose negation wraps
    want = np.sort(keys.reshape(nq, -1), axis=-1)[:, ::-1][:, :k]
    np.testing.assert_array_equal(np.asarray(got_k), want)
    # fully-NEG input stays NEG
    allneg = np.full((2, r, w), int(NEG), np.int32)
    got_k, _ = merge_runs_topk(jnp.asarray(allneg), jnp.asarray(allneg), k)
    assert (np.asarray(got_k) == int(NEG)).all()


def test_duplicate_keys_keep_multiplicity():
    """Equal keys must appear with the same multiplicity as a full sort
    (compare-exchange networks swap, never duplicate)."""
    rng = np.random.default_rng(2)
    nq, r, w, k = 7, 4, 32, 64
    keys = rng.integers(0, 8, size=(nq, r, w)).astype(np.int32)
    keys = -np.sort(-keys, axis=-1)
    payload = np.arange(nq * r * w, dtype=np.int32).reshape(nq, r, w)
    got_k, got_p = merge_runs_topk(jnp.asarray(keys), jnp.asarray(payload), k)
    got_k, got_p = np.asarray(got_k), np.asarray(got_p)
    want_k = -np.sort(-keys.reshape(nq, -1), axis=-1)[:, :k]
    np.testing.assert_array_equal(got_k, want_k)
    for i in range(nq):
        # each selected payload is genuine (its key matches) and unique
        assert len(np.unique(got_p[i])) == k
        lookup = dict(zip(payload[i].ravel(), keys[i].ravel()))
        np.testing.assert_array_equal(
            np.array([lookup[p] for p in got_p[i]]), got_k[i])
