"""Rendering/export tests (reference Draw.hs + demo app workload)."""

import numpy as np

import rptree_tpu as rp
from rptree_tpu.utils import gen as rgen


def _small_forest():
    x = np.asarray(rgen.data_batch(3, 200, rgen.circle2d2), np.float32)
    return rp.tree_batch(3, 3, 10, 1.0, x), x


def test_leaf_labels_cover_all_points():
    f, x = _small_forest()
    labels = rp.leaf_label_of_points(f)
    assert labels.shape == (200,)
    assert set(labels.tolist()) == set(range(f.plan.n_leaves))
    counts = np.bincount(labels, minlength=f.plan.n_leaves)
    np.testing.assert_array_equal(counts, f.leaf_sizes())


def test_write_csv(tmp_path):
    f, x = _small_forest()
    p = str(tmp_path / "scatter.csv")
    rp.write_csv(p, x, rp.leaf_label_of_points(f))
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 200
    xs, ys, lab = lines[0].split(",")
    assert float(xs) == float(x[0, 0]) and int(lab) >= 0


def test_knn_write_csv(tmp_path):
    f, x = _small_forest()
    d, ids = map(np.asarray, f.knn(np.zeros(2, np.float32), 10))
    hits = x[ids[0][ids[0] >= 0]]
    p = str(tmp_path / "knn.csv")
    rp.knn_write_csv(p, x, rp.leaf_label_of_points(f), hits)
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 200 + len(hits)
    assert lines[-1].endswith(",-1")


def test_dot_export(tmp_path):
    f, _ = _small_forest()
    dot = rp.to_dot(f, name="g")
    assert dot.startswith("digraph g {")
    assert dot.rstrip().endswith("}")
    # one label line per leaf, one point line per branch
    assert dot.count("label=") == f.plan.n_leaves
    assert dot.count("shape=point") == f.plan.n_branches
    assert dot.count("->") == 2 * f.plan.n_branches
    p = str(tmp_path / "t.dot")
    rp.write_dot(p, f)
    assert open(p).read().startswith("digraph")


def test_ascii_draw(capsys):
    f, _ = _small_forest()
    s = rp.tree_to_string(f)
    assert "leaf#" in s
    rp.draw(f)
    assert "leaf#0" in capsys.readouterr().out


def test_single_leaf_renderings():
    x = np.ones((5, 2), np.float32)
    f = rp.tree_batch(0, 3, 10, 1.0, x)
    assert "leaf#0 (5)" in rp.tree_to_string(f)
    dot = rp.to_dot(f)
    assert dot.count("label=") == 1
