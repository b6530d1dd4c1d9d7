"""User-supplied distance callables (the reference's ``distf`` argument,
``src/Data/RPTree.hs:168``, and the ``Inner u v`` typeclass extension point,
``src/Data/RPTree/Internal.hs:315-341``): any jit-compatible
``distf(rows[..., C, D], q[..., 1, D]) -> [..., C]`` can replace the
builtin metrics in ``knn`` / ``brute_force_knn`` / ``recall_with``."""

import jax.numpy as jnp
import numpy as np
import pytest

import rptree_tpu as rt
from rptree_tpu.ops.sparse import EllMatrix


def _l1(rows, q):
    return jnp.sum(jnp.abs(rows - q), axis=-1)


def _np_l1_topk(x, q, k):
    d = np.abs(x[None, :, :] - q[:, None, :]).sum(-1)  # [B, n]
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=-1), idx


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(500, 8)).astype(np.float32)
    q = rng.normal(size=(6, 8)).astype(np.float32)
    f = rt.forest_batch(11, 4, 16, 3, 1.0, x)
    return f, x, q


def _np_l1_rerank_candidates(f, x, q, k, budget):
    """Numpy oracle: L1-rerank the forest's own candidate union."""
    cand = np.asarray(f.candidates(q, budget=budget))  # [T, B, C]
    t, b, c = cand.shape
    union = np.moveaxis(cand, 0, 1).reshape(b, t * c)
    out = np.full((b, k), np.inf, np.float32)
    for j in range(b):
        ids = np.unique(union[j][union[j] >= 0])
        d = np.abs(x[ids] - q[j]).sum(-1)
        out[j, : min(k, d.size)] = np.sort(d)[:k]
    return out


def test_knn_custom_l1_matches_numpy(setup):
    f, x, q = setup
    d, i = map(np.asarray, f.knn(q, 5, metric=_l1, budget=8))
    d_np = _np_l1_rerank_candidates(f, x, q, 5, budget=8)
    np.testing.assert_allclose(d, d_np, rtol=1e-5, atol=1e-5)
    # returned distances really are the L1 distances of the returned ids
    d_of_ids = np.abs(x[i] - q[:, None, :]).sum(-1)
    np.testing.assert_allclose(d, d_of_ids, rtol=1e-5, atol=1e-5)


def test_packed_knn_custom_l1_matches_numpy(setup):
    f, x, q = setup
    fp = rt.forest_batch(11, 4, 16, 3, 1.0, x).pack_leaves()
    d, i = map(np.asarray, fp.knn(q, 5, metric=_l1, budget=8))
    d_np = _np_l1_rerank_candidates(fp, x, q, 5, budget=8)
    np.testing.assert_allclose(d, d_np, rtol=1e-5, atol=1e-5)


def test_brute_force_custom_l1(setup):
    f, x, q = setup
    d, i = map(np.asarray, f.brute_force_knn(q, 7, metric=_l1))
    d_np, i_np = _np_l1_topk(x, q, 7)
    np.testing.assert_allclose(d, d_np, rtol=1e-5, atol=1e-5)


def test_recall_with_custom_metric(setup):
    f, x, q = setup
    rec = np.asarray(f.recall_with(q, 5, metric=_l1, budget=8))
    assert rec.shape == (6,)
    assert (rec >= 0).all() and (rec <= 1).all()
    # numpy oracle: per tree |candidates . exact-L1-top-k| / k, tree mean
    cand = np.asarray(f.candidates(q, budget=8))  # [T, B, C]
    _, exact = _np_l1_topk(x, q, 5)
    want = np.zeros(q.shape[0], np.float32)
    for j in range(q.shape[0]):
        per_tree = [
            len(set(cand[t, j][cand[t, j] >= 0].tolist())
                & set(exact[j].tolist())) / 5
            for t in range(f.n_trees)
        ]
        want[j] = np.mean(per_tree)
    np.testing.assert_allclose(rec, want, atol=1e-6)


def test_custom_metric_rejects_ell_dataset():
    rng = np.random.default_rng(3)
    cols = np.sort(rng.integers(0, 16, size=(64, 4)).astype(np.int32), axis=1)
    vals = rng.normal(size=(64, 4)).astype(np.float32)
    ell = EllMatrix(16, jnp.asarray(cols), jnp.asarray(vals))
    f = rt.forest_batch(3, 3, 8, 2, 1.0, ell)
    with pytest.raises(NotImplementedError):
        f.knn(rng.normal(size=16).astype(np.float32), 3, metric=_l1)


def test_custom_metric_rejects_int8_blocks(setup):
    f, x, q = setup
    f = rt.forest_batch(11, 4, 16, 3, 1.0, x).pack_leaves(dtype=jnp.int8)
    with pytest.raises(NotImplementedError):
        f.knn(q, 5, metric=_l1)
