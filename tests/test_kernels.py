"""Unit tests for the device kernel layer (masks, sort, joins, grouping)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyrise_tpu.kernels import masks, sortops, joins, aggregates
from hyrise_tpu.types import SortMode, padded_size


def test_mask_count_and_indices():
    mask = jnp.array([True, False, True, True, False, False, True, False])
    assert int(masks.mask_count(mask)) == 4
    idx = masks.mask_to_indices(mask, 4)
    assert idx.tolist() == [0, 2, 3, 6]
    idx8 = masks.mask_to_indices(mask, 8)
    assert idx8.tolist()[:4] == [0, 2, 3, 6]


def test_sort_permutation_basic():
    data = jnp.array([3, 1, 2, 5, 4, 0, 0, 0])  # last 3 are padding
    perm = sortops.sort_permutation([(data, None)], [SortMode.ASC_NULLS_LAST], n=5)
    assert perm.tolist()[:5] == [1, 2, 0, 4, 3]


def test_sort_permutation_desc_and_nulls():
    data = jnp.array([3, 1, 2, 5, 4, 0, 0, 0])
    valid = jnp.array([True, True, False, True, True, True, True, True])
    perm = sortops.sort_permutation(
        [(data, valid)], [SortMode.DESC_NULLS_FIRST], n=5
    )
    assert perm.tolist()[:5] == [2, 3, 4, 0, 1]
    perm = sortops.sort_permutation(
        [(data, valid)], [SortMode.DESC_NULLS_LAST], n=5
    )
    assert perm.tolist()[:5] == [3, 4, 0, 1, 2]


def test_sort_permutation_floats_negatives():
    data = jnp.array([1.5, -2.5, 0.0, -0.0, 3.25, 0, 0, 0], dtype=jnp.float32)
    perm = sortops.sort_permutation([(data, None)], [SortMode.ASC_NULLS_LAST], n=5)
    vals = np.asarray(data)[perm.tolist()[:5]]
    assert list(vals) == sorted(vals)
    perm_d = sortops.sort_permutation([(data, None)], [SortMode.DESC_NULLS_LAST], n=5)
    vals_d = np.asarray(data)[perm_d.tolist()[:5]]
    assert list(vals_d) == sorted(vals_d, reverse=True)


def test_sort_multi_key():
    a = jnp.array([1, 2, 1, 2, 1, 0, 0, 0])
    b = jnp.array([9, 8, 7, 6, 5, 0, 0, 0])
    perm = sortops.sort_permutation(
        [(a, None), (b, None)],
        [SortMode.ASC_NULLS_LAST, SortMode.ASC_NULLS_LAST],
        n=5,
    )
    pairs = [(int(a[i]), int(b[i])) for i in perm.tolist()[:5]]
    assert pairs == sorted(pairs)


def _join(build, probe, build_valid=None, probe_valid=None, n_build=None, n_probe=None):
    cap_b = padded_size(len(build))
    cap_p = padded_size(len(probe))
    bk = jnp.zeros(cap_b, dtype=jnp.int64).at[: len(build)].set(jnp.array(build))
    pk = jnp.zeros(cap_p, dtype=jnp.int64).at[: len(probe)].set(jnp.array(probe))
    bv = masks.padding_mask(n_build if n_build is not None else len(build), cap_b)
    if build_valid is not None:
        bv = bv & jnp.zeros(cap_b, bool).at[: len(build_valid)].set(jnp.array(build_valid))
    pv = masks.padding_mask(n_probe if n_probe is not None else len(probe), cap_p)
    if probe_valid is not None:
        pv = pv & jnp.zeros(cap_p, bool).at[: len(probe_valid)].set(jnp.array(probe_valid))
    sk, perm, nv = joins.build_sorted(bk, bv)
    left, counts = joins.probe_counts(sk, nv, pk, pv)
    total = int(joins.total_matches(counts))
    out_cap = max(padded_size(total), 128)
    pi, bi, valid = joins.expand_matches(left, counts, perm, out_cap)
    pairs = [
        (int(pi[j]), int(bi[j])) for j in range(out_cap) if bool(valid[j])
    ]
    return pairs, counts


def test_equi_join_inner():
    # build: [10, 20, 10, 30]; probe: [10, 30, 40, 10]
    pairs, _ = _join([10, 20, 10, 30], [10, 30, 40, 10])
    expected = {(0, 0), (0, 2), (1, 3), (3, 0), (3, 2)}
    assert set(pairs) == expected
    assert len(pairs) == 5


def test_equi_join_null_keys_never_match():
    pairs, counts = _join(
        [10, 20, 30], [10, 20, 99],
        build_valid=[True, False, True],
        probe_valid=[True, True, True],
    )
    assert set(pairs) == {(0, 0)}


def test_join_semi_anti_membership():
    cap = 128
    bk = jnp.zeros(cap, jnp.int64).at[:3].set(jnp.array([5, 7, 9]))
    bv = masks.padding_mask(3, cap)
    sk, perm, nv = joins.build_sorted(bk, bv)
    keys = jnp.zeros(cap, jnp.int64).at[:4].set(jnp.array([5, 6, 9, 0]))
    kv = masks.padding_mask(4, cap)
    member = joins.contains(sk, nv, keys, kv)
    assert member.tolist()[:4] == [True, False, True, False]


def test_group_aggregate():
    # keys: [1, 2, 1, 2, 3], values [10, 20, 30, 40, 50]
    cap = 128
    k = jnp.zeros(cap, jnp.int64).at[:5].set(jnp.array([1, 2, 1, 2, 3]))
    v = jnp.zeros(cap, jnp.float32).at[:5].set(
        jnp.array([10.0, 20, 30, 40, 50], dtype=jnp.float32)
    )
    nmask = masks.padding_mask(5, cap)
    av = jnp.ones(cap, bool)
    perm, seg_ids, num_groups = aggregates.group_rows((k,), (av,), nmask)
    assert int(num_groups) == 3
    sv = jnp.take(v, perm)
    svalid = jnp.take(nmask, perm)
    sums = aggregates.segment_sum(sv, seg_ids, svalid, num_segments=cap)
    counts = aggregates.segment_count(seg_ids, svalid, num_segments=cap)
    sk = jnp.take(k, perm)
    firsts = aggregates.segment_min(sk, seg_ids, svalid, num_segments=cap)
    got = {
        int(firsts[g]): (float(sums[g]), int(counts[g])) for g in range(3)
    }
    assert got == {1: (40.0, 2), 2: (60.0, 2), 3: (50.0, 1)}


def test_group_rows_null_keys_form_one_group():
    cap = 128
    k = jnp.zeros(cap, jnp.int64).at[:4].set(jnp.array([1, 0, 1, 0]))
    valid = jnp.ones(cap, bool).at[1].set(False).at[3].set(False)
    nmask = masks.padding_mask(4, cap)
    perm, seg_ids, num_groups = aggregates.group_rows((k,), (valid,), nmask)
    assert int(num_groups) == 2


def test_dense_join_kernels():
    import jax.numpy as jnp

    from hyrise_tpu.kernels import joins as jk

    # build: keys 10..14 at rows 0..4, row 3 invalid, key 99 out of range
    bk = jnp.asarray([10, 11, 12, 13, 14, 99, 0, 0])
    bv = jnp.asarray([True, True, True, False, True, True, False, False])
    lo, dsize = 10, 5
    slot = jk.dense_build(bk, bv, lo, dsize)
    assert np.asarray(slot)[:5].tolist() == [0, 1, 2, -1, 4]

    pk = jnp.asarray([12, 13, 14, 9, 15, 10, 0, 0])
    pv = jnp.asarray([True, True, True, True, True, False, False, False])
    left, counts = jk.dense_probe(slot, pk, pv, lo, dsize)
    # 12 matches, 13 built-invalid, 14 matches, 9/15 out of range,
    # 10 probe-invalid
    assert np.asarray(counts).tolist() == [1, 0, 1, 0, 0, 0, 0, 0]

    probe_idx, build_idx, valid = jk.expand_unique(left, counts, slot, 8)
    got = [
        (int(p), int(b))
        for p, b, v in zip(
            np.asarray(probe_idx), np.asarray(build_idx), np.asarray(valid)
        )
        if v
    ]
    assert got == [(0, 2), (2, 4)]


def test_expand_unique_matches_expand_matches():
    import jax.numpy as jnp

    from hyrise_tpu.kernels import joins as jk

    rng = np.random.default_rng(3)
    bk = jnp.asarray(rng.permutation(64).astype(np.int32))
    bv = jnp.asarray(rng.random(64) < 0.8)
    pk = jnp.asarray(rng.integers(0, 80, size=128).astype(np.int32))
    pv = jnp.asarray(rng.random(128) < 0.9)
    sk, perm, nv = jk.build_sorted(bk, bv)
    left, counts = jk.probe_counts(sk, nv, pk, pv)
    a = jk.expand_matches(left, counts, perm, 256)
    b = jk.expand_unique(left, counts, perm, 256)
    pairs = lambda t: sorted(
        (int(p), int(x))
        for p, x, v in zip(np.asarray(t[0]), np.asarray(t[1]), np.asarray(t[2]))
        if v
    )
    assert pairs(a) == pairs(b)


def test_onehot_take_matches_take():
    import jax.numpy as jnp

    from hyrise_tpu.kernels.gather import onehot_take

    rng = np.random.default_rng(11)
    k, n = 512, 1 << 14
    idx = jnp.asarray(rng.integers(0, k, n), dtype=jnp.int32)
    for dt in (np.float32, np.float64, np.int32, np.int64, np.int8):
        if np.issubdtype(dt, np.floating):
            src = jnp.asarray(rng.standard_normal(k).astype(dt))
        else:
            src = jnp.asarray(rng.integers(-100, 100, k, dtype=dt))
        out = onehot_take(src, idx)
        ref = jnp.take(src, idx)
        assert out.dtype == ref.dtype
        assert bool(jnp.all(out == ref))
    mat = jnp.asarray(rng.standard_normal((k, 3)).astype(np.float32))
    assert bool(jnp.all(onehot_take(mat, idx) == jnp.take(mat, idx, axis=0)))
    b = jnp.asarray(rng.random(k) < 0.5)
    out = onehot_take(b, idx)
    assert out.dtype == jnp.bool_
    assert bool(jnp.all(out == jnp.take(b, idx)))


def test_group_rows_payload_matches_group_rows():
    import jax.numpy as jnp

    from hyrise_tpu.kernels import aggregates as aggk

    rng = np.random.default_rng(12)
    cap = 256
    n = 200
    keys = jnp.asarray(rng.integers(0, 8, cap), dtype=jnp.int32)
    valid = jnp.asarray(rng.random(cap) < 0.9)
    n_mask = jnp.arange(cap) < n
    pay = jnp.asarray(rng.standard_normal(cap).astype(np.float32))
    perm0, seg0, ng0 = aggk.group_rows((keys,), (valid,), n_mask)
    (perm, seg, ng, sreal, skeys, skv, spay) = aggk.group_rows_payload(
        (keys,), (valid,), n_mask, (pay,))
    assert int(ng) == int(ng0)
    assert np.asarray(seg).tolist() == np.asarray(seg0).tolist()
    # payload rides the same permutation
    assert bool(jnp.all(spay[0] == jnp.take(pay, perm)))
    assert bool(jnp.all(sreal == jnp.take(n_mask, perm)))
    assert bool(jnp.all(skeys[0] == jnp.where(
        jnp.take(valid, perm), jnp.take(keys, perm), 0)))
    assert bool(jnp.all(skv[0] == jnp.take(valid, perm)))
