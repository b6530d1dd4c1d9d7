"""Fused grouped tile-scoring kernel (ops/grouped_kernel.py): exactness
in interpret mode against a numpy re-execution of the tile contract."""

import numpy as np
import jax.numpy as jnp
import pytest

from rptree_tpu.ops.grouped_kernel import (grouped_score_tiles,
                                           grouped_kernel_ok)


def _ref_tiles(x, sq, tb, lens_t, qt, metric, tile_m):
    nt = tb.shape[0]
    lmax = x.shape[1]
    out = np.full((nt * tile_m, lmax), np.inf, np.float32)
    for i in range(nt):
        blk = x[tb[i]].astype(np.float64)
        for m in range(tile_m):
            qv = qt[i * tile_m + m].astype(np.float64)
            dd = np.maximum(
                sq[tb[i]].astype(np.float64)
                - 2.0 * (blk @ qv) + float(qv @ qv), 0.0)
            if metric == "l2":
                dd = np.sqrt(dd)
            row = np.where(np.arange(lmax) < lens_t[i], dd, np.inf)
            out[i * tile_m + m] = row.astype(np.float32)
    return out


@pytest.mark.parametrize("metric", ["l2", "sql2"])
def test_grouped_score_tiles_interpret(metric):
    rng = np.random.default_rng(0)
    g, lmax, d = 24, 16, 64
    tile_m, tc_k, nt = 4, 8, 32
    x = rng.normal(size=(g, lmax, d)).astype(np.float32)
    sq = (x * x).sum(-1).astype(np.float32)
    tb = rng.integers(0, g, size=nt).astype(np.int32)
    lens_t = rng.integers(1, lmax + 1, size=nt).astype(np.int32)
    qt = rng.normal(size=(nt * tile_m, d)).astype(np.float32)
    out = grouped_score_tiles(jnp.asarray(x), jnp.asarray(sq),
                              jnp.asarray(tb), jnp.asarray(lens_t),
                              jnp.asarray(qt), metric, tile_m, tc_k,
                              interpret=True)
    ref = _ref_tiles(x, sq, tb, lens_t, qt, metric, tile_m)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_grouped_score_tiles_repeated_blocks():
    """Clustered pair sets repeat blocks heavily; consecutive tiles of
    the same block must score identically."""
    rng = np.random.default_rng(1)
    g, lmax, d = 6, 8, 32
    tile_m, tc_k, nt = 2, 4, 16
    x = rng.normal(size=(g, lmax, d)).astype(np.float32)
    sq = (x * x).sum(-1).astype(np.float32)
    tb = np.zeros(nt, np.int32)
    tb[8:] = 3
    lens_t = np.full(nt, lmax, np.int32)
    qt = np.tile(rng.normal(size=(1, d)).astype(np.float32),
                 (nt * tile_m, 1))
    out = np.asarray(grouped_score_tiles(
        jnp.asarray(x), jnp.asarray(sq), jnp.asarray(tb),
        jnp.asarray(lens_t), jnp.asarray(qt), "sql2", tile_m, tc_k,
        interpret=True))
    for i in range(1, 8):
        np.testing.assert_array_equal(out[0], out[i * tile_m])
    for i in range(9, 16):
        np.testing.assert_array_equal(out[8 * tile_m], out[i * tile_m])


def test_grouped_kernel_gate():
    assert grouped_kernel_ok(jnp.zeros((4, 16, 64), jnp.float32), "l2")
    assert grouped_kernel_ok(jnp.zeros((4, 16, 64), jnp.bfloat16), "sql2")
    assert not grouped_kernel_ok(jnp.zeros((4, 13, 64), jnp.float32), "l2")
    assert not grouped_kernel_ok(jnp.zeros((4, 8, 64), jnp.bfloat16), "l2")
    assert not grouped_kernel_ok(jnp.zeros((4, 16, 64), jnp.int8), "l2")
    assert not grouped_kernel_ok(jnp.zeros((4, 16, 64), jnp.float32),
                                 "cosine")
    from rptree_tpu.ops.sparse import EllBlocks
    assert not grouped_kernel_ok(
        EllBlocks(64, jnp.zeros((4, 16, 3), jnp.int32),
                  jnp.zeros((4, 16, 3), jnp.float32)), "l2")
