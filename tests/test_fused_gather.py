"""Fused block-gather + dot kernel (ops/fused_gather.py): exactness in
interpret mode.

On v5e the kernel measured 544 GB/s effective vs the XLA gather's 575
GB/s at the 1M clustered flagship shape ONCE THE BLOCKS ARE TILE-ALIGNED
-- the pack-time sublane rounding in pack_leaves() is what closed the
198 -> 575 GB/s gap, so serving stays on XLA and the kernel is kept as
the measured alternative (same outcome as ops/scan.py's scan_topk)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rptree_tpu.ops.fused_gather import gather_score, gather_score_ok


def test_gather_score_interpret_matches_xla():
    rng = np.random.default_rng(0)
    g, l, d, b, p = 40, 16, 128, 12, 5
    x = rng.normal(size=(g, l, d)).astype(np.float32)
    sq = (x * x).sum(-1).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    sel = rng.integers(0, g, size=(b, p)).astype(np.int32)
    dots, sqx = gather_score(jnp.asarray(x), jnp.asarray(sq),
                             jnp.asarray(q), jnp.asarray(sel), p,
                             interpret=True)
    ref = np.einsum("bpld,bd->bpl", x[sel], q)
    np.testing.assert_allclose(np.asarray(dots), ref, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sqx), sq[sel], rtol=1e-6)


def test_gather_score_duplicate_and_repeated_blocks():
    """Clustered probe sets repeat blocks heavily; duplicates must fetch
    identically."""
    rng = np.random.default_rng(1)
    g, l, d, b, p = 8, 8, 128, 6, 4
    x = rng.normal(size=(g, l, d)).astype(np.float32)
    sq = (x * x).sum(-1).astype(np.float32)
    q = rng.normal(size=(b, d)).astype(np.float32)
    sel = np.zeros((b, p), np.int32)  # every probe the same block
    sel[:, 1] = 3
    dots, sqx = gather_score(jnp.asarray(x), jnp.asarray(sq),
                             jnp.asarray(q), jnp.asarray(sel), p,
                             interpret=True)
    ref = np.einsum("bpld,bd->bpl", x[sel], q)
    np.testing.assert_allclose(np.asarray(dots), ref, rtol=2e-5, atol=1e-4)


def test_gather_score_shape_gate():
    ok = gather_score_ok(jnp.zeros((4, 16, 128), jnp.float32), 4)
    assert ok
    assert not gather_score_ok(jnp.zeros((4, 13, 128), jnp.float32), 4)
    assert not gather_score_ok(jnp.zeros((4, 16, 100), jnp.float32), 4)
    assert not gather_score_ok(jnp.zeros((4, 16, 128), jnp.int8), 4)
