"""Static tree-plan invariants: the plan must reproduce the reference's
recursive shape exactly (sizes, stop conditions, leaf spans)."""

import numpy as np
import pytest

from rptree_tpu.models.plan import TreePlan, make_plan


def ref_shape(n, max_depth, min_leaf):
    """Direct transcription of the reference stop/split rules
    (Internal.hs:257-297): returns list of leaf (start, size)."""
    leaves = []

    def go(start, size, level):
        if level >= max_depth or size <= min_leaf:
            leaves.append((start, size))
            return
        nh = size // 2
        go(start, nh, level + 1)
        go(start + nh, size - nh, level + 1)

    go(0, n, 0)
    return sorted(leaves)


@pytest.mark.parametrize(
    "n,maxd,minl",
    [
        (1, 5, 1),
        (2, 5, 1),
        (3, 5, 1),
        (7, 2, 1),
        (100, 5, 10),
        (1000, 20, 10),
        (1000, 3, 1),
        (10000, 9, 20),
        (12345, 7, 13),
        (50, 0, 10),   # max_depth 0 -> single leaf
        (10, 5, 100),  # n <= min_leaf -> single leaf
    ],
)
def test_leaf_spans_match_reference_shape(n, maxd, minl):
    plan = TreePlan(n, maxd, minl)
    expected = ref_shape(n, maxd, minl)
    got = sorted(zip(plan.leaf_start.tolist(), plan.leaf_len.tolist()))
    assert got == expected
    # leaves partition [0, n)
    assert sum(plan.leaf_len.tolist()) == n
    pos = 0
    for s, m in got:
        assert s == pos
        pos += m
    assert pos == n


def test_leaf_size_bounds():
    plan = TreePlan(10000, 9, 20)
    # any leaf NOT at max depth must have size <= min_leaf; max-depth leaves
    # can be larger (maxDepth truncation, Internal.hs:289)
    assert plan.max_leaf_len >= 1
    # completeness of median splits: every split is balanced
    for lp in plan.levels:
        nh = lp.seg_size // 2
        np.testing.assert_array_equal(lp.thr_pos, lp.seg_start + np.maximum(nh, 1))


def test_median_margin_positions_degenerate():
    # m == 2 segment: mgl at start, thr == mgr at start+1 (Internal.hs:498)
    plan = TreePlan(2, 5, 1)
    lp = plan.levels[0]
    assert lp.n_segs == 1
    assert lp.mgl_pos[0] == 0 and lp.thr_pos[0] == 1 and lp.mgr_pos[0] == 1
    # m >= 3: neighbours of the median (Internal.hs:497)
    plan3 = TreePlan(9, 5, 1)
    lp3 = plan3.levels[0]
    assert lp3.thr_pos[0] == 4 and lp3.mgl_pos[0] == 3 and lp3.mgr_pos[0] == 5


def test_child_encodings_consistent():
    plan = TreePlan(1000, 20, 10)
    for l, lp in enumerate(plan.levels):
        for j in range(lp.n_segs):
            for c in (0, 1):
                enc = int(lp.child_enc[j, c])
                if enc >= 0:
                    assert l + 1 < plan.n_levels
                    assert enc < plan.levels[l + 1].n_segs
                else:
                    leaf = -(enc + 1)
                    assert 0 <= leaf < plan.n_leaves


def test_seg_keys_group_regions():
    plan = TreePlan(500, 6, 5)
    for lp in plan.levels:
        key = lp.seg_key
        assert np.all(np.diff(key) >= 0)
        # within each split segment the key is constant
        for j in range(lp.n_segs):
            s, m = lp.seg_start[j], lp.seg_size[j]
            assert np.all(key[s : s + m] == key[s])


def test_plan_cache_and_hash():
    a = make_plan(100, 5, 10)
    b = make_plan(100, 5, 10)
    assert a is b
    assert a == TreePlan(100, 5, 10)
    assert hash(a) == hash(TreePlan(100, 5, 10))


def test_plan_validation():
    with pytest.raises(ValueError):
        TreePlan(0, 5, 10)
    with pytest.raises(ValueError):
        TreePlan(10, 5, 0)
