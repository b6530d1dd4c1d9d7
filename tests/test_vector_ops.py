"""Kernel unit tests mirroring the reference's hspec exact-value checks
(``test/Data/RPTreeSpec.hs:21-45``), plus coverage the reference lacks."""

import numpy as np
import pytest

from rptree_tpu import (
    SVec,
    add,
    from_list_dv,
    from_list_sv,
    inner,
    inner_dd,
    metric_l2,
    normalize,
    scale,
    sub,
    to_dense,
)

# the hspec fixtures (RPTreeSpec.hs:22-27)
VS0 = from_list_sv(5, [(1, 3.4), (4, 2.1)])
VS1 = from_list_sv(5, [(0, 6.7), (3, 5.5)])
V1 = from_list_dv([1, 2, 3, 4, 5])


def test_add_sparse_dense():
    # RPTreeSpec.hs:28-32
    np.testing.assert_allclose(add(VS0, V1), [1, 5.4, 3, 4, 7.1])


def test_sub_sparse_dense():
    # RPTreeSpec.hs:33-37
    np.testing.assert_allclose(sub(VS0, V1), [-1, 1.4, -3, -4, -2.9])


def test_inner_sparse_sparse_disjoint():
    # RPTreeSpec.hs:38-41
    assert inner(VS0, VS1) == 0.0


def test_inner_sparse_dense():
    # RPTreeSpec.hs:42-45
    assert inner(VS0, V1) == pytest.approx(17.3)


def test_inner_symmetry_and_dense():
    assert inner(V1, VS0) == pytest.approx(17.3)
    assert inner_dd(V1, V1) == pytest.approx(sum(x * x for x in [1, 2, 3, 4, 5]))


def test_sparse_sparse_add_union_exact():
    # exact union semantics (the reference's binSS truncates at the shorter
    # operand, Internal.hs:437-450 -- deliberately not reproduced)
    s = add(VS0, VS1)
    assert isinstance(s, SVec)
    np.testing.assert_allclose(to_dense(s), [6.7, 3.4, 0, 5.5, 2.1])


def test_metric_l2_pairings():
    d_sd = metric_l2(VS0, V1)
    expect = np.sqrt(np.sum((to_dense(VS0) - to_dense(V1)) ** 2))
    assert d_sd == pytest.approx(expect)
    assert metric_l2(V1, V1) == 0.0
    assert metric_l2(VS0, VS0) == 0.0
    assert metric_l2(VS0, VS1) == pytest.approx(
        np.sqrt(np.sum((to_dense(VS0) - to_dense(VS1)) ** 2))
    )


def test_scale_and_normalize():
    np.testing.assert_allclose(scale(2.0, V1), [2, 4, 6, 8, 10])
    s = scale(-1.0, VS0)
    np.testing.assert_allclose(s.val, [-3.4, -2.1])
    nv = normalize(V1)
    assert np.sqrt(np.dot(to_dense(nv), to_dense(nv))) == pytest.approx(1.0)


def test_svec_invariants_checked():
    with pytest.raises(ValueError):
        SVec(5, np.array([3, 1]), np.array([1.0, 2.0]))  # not increasing
    with pytest.raises(ValueError):
        SVec(3, np.array([0, 5]), np.array([1.0, 2.0]))  # out of range
