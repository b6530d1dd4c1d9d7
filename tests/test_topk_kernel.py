"""Exactness of the fused streaming top-k tail (ops/topk_kernel) vs the
payload-sort tail it replaces (interpret mode; device parity is pinned on
the TPU in BASELINE.md)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rptree_tpu.ops.topk_kernel import topk_dedup_kernel


def _sort_tail(d, ids, k, kk, dedup):
    """Numpy re-execution of _selection_tail_ids(selection='sort')."""
    out_d = np.empty((d.shape[0], k), np.float32)
    out_i = np.empty((d.shape[0], k), np.int32)
    for r in range(d.shape[0]):
        order = np.argsort(d[r], kind="stable")[:kk]
        dd, ii = d[r][order], ids[r][order]
        ii = np.where(np.isinf(dd), -1, ii)
        if dedup:
            seen, keep = set(), []
            for j in range(kk):
                if ii[j] >= 0 and ii[j] in seen:
                    continue
                if ii[j] >= 0:
                    seen.add(ii[j])
                keep.append(j)
            dd = np.concatenate([dd[keep], np.full(kk, np.inf, np.float32)])
            ii = np.concatenate([ii[keep], np.full(kk, -1, np.int32)])
        out_d[r] = dd[:k]
        out_i[r] = np.where(np.isinf(dd[:k]), -1, ii[:k])
    return out_d, out_i


@pytest.mark.parametrize("dedup", [True, False])
def test_topk_kernel_matches_sort_tail(dedup):
    """Random state with masked slots and BIT-IDENTICAL duplicate copies
    (the exact-layout case): kernel == stable-sort tail, bitwise."""
    rng = np.random.default_rng(0)
    b, w, k, t = 24, 256, 10, 4
    base = rng.uniform(1.0, 9.0, size=(b, w)).astype(np.float32)
    ids = rng.integers(0, 40, size=(b, w)).astype(np.int32)
    # duplicates of the same id carry identical distances (scored from
    # the same stored row): overwrite each row's copies with the first
    d = base.copy()
    for r in range(b):
        first = {}
        for j in range(w):
            if ids[r, j] in first:
                d[r, j] = d[r, first[ids[r, j]]]
            else:
                first[ids[r, j]] = j
    # masked slots
    mask = rng.uniform(size=(b, w)) < 0.3
    d = np.where(mask, np.inf, d).astype(np.float32)
    ids = np.where(mask, -1, ids)
    kd, ki = topk_dedup_kernel(jnp.asarray(d), jnp.asarray(ids), k,
                               dedup=dedup, bm=8, interpret=True)
    # full-width oracle: the production tail's kk = k * n_trees prefix
    # equals this whenever each id has <= n_trees copies (the forest
    # invariant); the kernel implements the full-width semantics directly
    rd, ri = _sort_tail(d, ids, k, w, dedup)
    np.testing.assert_array_equal(np.asarray(ki), ri)
    np.testing.assert_array_equal(np.asarray(kd), rd)


def test_topk_kernel_dup_distances_keep_min():
    """Quantized cross-leaf duplicates (same id, different distances):
    the kernel keeps the LOWEST-distance copy and never returns an id
    twice."""
    d = jnp.asarray([[5.0, 1.0, 3.0, 2.0] + [np.inf] * 124], jnp.float32)
    ids = jnp.asarray([[7, 7, 3, 3] + [-1] * 124], jnp.int32)
    kd, ki = topk_dedup_kernel(d, ids, 3, dedup=True, bm=8,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ki), [[7, 3, -1]])
    np.testing.assert_allclose(np.asarray(kd)[0, :2], [1.0, 2.0])
    assert np.isinf(np.asarray(kd)[0, 2])


def test_topk_kernel_exhausted_rows_and_padding():
    """Rows with < k live candidates pad with (+inf, -1); batch sizes
    that are not a block multiple are padded internally."""
    b, w, k = 10, 128, 4  # b=10 with bm=8 exercises the pad path
    d = np.full((b, w), np.inf, np.float32)
    ids = np.full((b, w), -1, np.int32)
    d[:, 0], ids[:, 0] = 2.0, 5
    d[3, 1], ids[3, 1] = 1.0, 9
    kd, ki = topk_dedup_kernel(jnp.asarray(d), jnp.asarray(ids), k,
                               dedup=True, bm=8, interpret=True)
    ki = np.asarray(ki)
    np.testing.assert_array_equal(ki[0], [5, -1, -1, -1])
    np.testing.assert_array_equal(ki[3], [9, 5, -1, -1])
    assert np.isinf(np.asarray(kd)[0, 1:]).all()


def test_topk_kernel_lane_pad_non_multiple_width():
    """Candidate widths that are not lane multiples (the clustered
    flagship's probes*lmax) pad internally with (+inf, -1) and match the
    sort tail exactly."""
    rng = np.random.default_rng(3)
    b, w, k = 16, 200, 6  # 200 -> pads to 256
    d = rng.uniform(1.0, 9.0, size=(b, w)).astype(np.float32)
    ids = rng.integers(0, 500, size=(b, w)).astype(np.int32)
    kd, ki = topk_dedup_kernel(jnp.asarray(d), jnp.asarray(ids), k,
                               dedup=True, bm=8, interpret=True)
    rd, ri = _sort_tail(d, ids, k, w, True)
    np.testing.assert_array_equal(np.asarray(ki), ri)
    np.testing.assert_array_equal(np.asarray(kd), rd)


def test_topk_kernel_tie_break_lowest_position():
    """Equal distances with distinct ids: winners extract in slot order
    (the stable sort's prefix)."""
    d = jnp.asarray([[4.0] * 128], jnp.float32)
    ids = jnp.asarray([np.arange(128, dtype=np.int32)[::-1]])
    _, ki = topk_dedup_kernel(d, ids, 5, dedup=True, bm=8,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(ki)[0],
                                  [127, 126, 125, 124, 123])
