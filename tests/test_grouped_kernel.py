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


def _ref_topk(x, sq, ids, tb, lens_t, qt, metric, tile_m, kp):
    """Per-slot top-kp of the reference tile distances, ties by slot."""
    full = _ref_tiles(x, sq, tb, lens_t, qt, metric, tile_m)
    nt = tb.shape[0]
    lmax = x.shape[1]
    out_d = np.full((nt * tile_m, kp), np.inf, np.float32)
    out_i = np.zeros((nt * tile_m, kp), np.int32)
    for i in range(nt):
        row_ids = ids[tb[i]]
        for m in range(tile_m):
            r = i * tile_m + m
            order = np.argsort(full[r], kind="stable")[:kp]
            out_d[r] = full[r][order]
            sel = ~np.isinf(full[r][order])
            out_i[r][sel] = row_ids[order][sel]
    return out_d, out_i


@pytest.mark.parametrize("metric", ["l2", "sql2"])
def test_grouped_score_topk_interpret(metric):
    from rptree_tpu.ops.grouped_kernel import grouped_score_topk

    rng = np.random.default_rng(2)
    g, lmax, d, kp = 24, 16, 64, 8
    tile_m, tc_k, nt = 4, 8, 32
    x = rng.normal(size=(g, lmax, d)).astype(np.float32)
    sq = (x * x).sum(-1).astype(np.float32)
    ids = rng.integers(0, 10_000, size=(g, lmax)).astype(np.int32)
    tb = rng.integers(0, g, size=nt).astype(np.int32)
    lens_t = rng.integers(1, lmax + 1, size=nt).astype(np.int32)
    qt = rng.normal(size=(nt * tile_m, d)).astype(np.float32)
    od, oi = grouped_score_topk(jnp.asarray(x), jnp.asarray(sq),
                                jnp.asarray(ids), jnp.asarray(tb),
                                jnp.asarray(lens_t), jnp.asarray(qt),
                                metric, tile_m, tc_k, kp, interpret=True)
    rd, ri = _ref_topk(x, sq, ids, tb, lens_t, qt, metric, tile_m, kp)
    od, oi = np.asarray(od), np.asarray(oi)
    np.testing.assert_allclose(od, rd, rtol=2e-4, atol=2e-4)
    # id parity wherever the distance is finite and not a near-tie at
    # float tolerance (ties extract in slot order on both sides)
    fin = ~np.isinf(rd)
    gap = np.abs(np.diff(rd, axis=1, prepend=-1.0)) > 1e-4
    chk = fin & gap
    np.testing.assert_array_equal(oi[chk], ri[chk])


def test_grouped_score_topk_duplicates_and_empty():
    """Exact duplicate rows extract BOTH copies (index-masked, not
    value-masked), and fully-masked tiles return +inf rows."""
    from rptree_tpu.ops.grouped_kernel import grouped_score_topk

    g, lmax, d, kp = 2, 8, 16, 8
    tile_m, tc_k, nt = 2, 2, 4
    x = np.zeros((g, lmax, d), np.float32)
    x[0, :, 0] = [1, 1, 2, 2, 2, 3, 4, 5]  # duplicates
    sq = (x * x).sum(-1).astype(np.float32)
    ids = np.arange(g * lmax, dtype=np.int32).reshape(g, lmax)
    tb = np.array([0, 0, 1, 1], np.int32)
    lens_t = np.array([lmax, lmax, 0, lmax], np.int32)
    qt = np.zeros((nt * tile_m, d), np.float32)
    od, oi = grouped_score_topk(jnp.asarray(x), jnp.asarray(sq),
                                jnp.asarray(ids), jnp.asarray(tb),
                                jnp.asarray(lens_t), jnp.asarray(qt),
                                "l2", tile_m, tc_k, kp, interpret=True)
    od, oi = np.asarray(od), np.asarray(oi)
    # tile 0 slot 0: distances 1,1,2,2,2,3,4,5 with ids 0..7 in slot order
    np.testing.assert_allclose(od[0], [1, 1, 2, 2, 2, 3, 4, 5], atol=1e-6)
    np.testing.assert_array_equal(oi[0], np.arange(8))
    # tile 2 (lens 0): all masked
    assert np.isinf(od[2 * tile_m]).all()


@pytest.mark.parametrize("metric", ["l2", "sql2"])
def test_grouped_score_tiles_int8_interpret(metric):
    """int8 kernel == the XLA int8 grouped contract (quantized dots x
    block scale x per-row query scale against exact stored norms)."""
    from rptree_tpu.ops.grouped_kernel import grouped_score_tiles_int8

    rng = np.random.default_rng(3)
    g, lmax, d = 12, 32, 64
    tile_m, tc_k, nt = 4, 8, 32
    xf = rng.normal(size=(g, lmax, d)).astype(np.float32)
    sq = (xf * xf).sum(-1).astype(np.float32)
    scale = (np.abs(xf).max(axis=(1, 2)) / 127.0).astype(np.float32)
    xi = np.clip(np.round(xf / scale[:, None, None]), -127, 127).astype(np.int8)
    tb = rng.integers(0, g, size=nt).astype(np.int32)
    lens_t = rng.integers(1, lmax + 1, size=nt).astype(np.int32)
    qt = rng.normal(size=(nt * tile_m, d)).astype(np.float32)
    out = grouped_score_tiles_int8(
        jnp.asarray(xi), jnp.asarray(sq), jnp.asarray(scale),
        jnp.asarray(tb), jnp.asarray(lens_t), jnp.asarray(qt), metric,
        tile_m, tc_k, interpret=True)
    # numpy re-execution of the quantized contract
    amax = np.maximum(np.abs(qt).max(axis=1, keepdims=True), 1e-30)
    qsc = amax / 127.0
    qi = np.clip(np.round(qt / qsc), -127, 127).astype(np.int8)
    ref = np.full((nt * tile_m, lmax), np.inf, np.float32)
    for i in range(nt):
        blk = xi[tb[i]].astype(np.int32)
        for m in range(tile_m):
            r = i * tile_m + m
            dots = (blk @ qi[r].astype(np.int32)).astype(np.float64)
            dots = dots * scale[tb[i]] * qsc[r, 0]
            dd = np.maximum(sq[tb[i]] - 2.0 * dots + float(qt[r] @ qt[r]),
                            0.0)
            if metric == "l2":
                dd = np.sqrt(dd)
            ref[r] = np.where(np.arange(lmax) < lens_t[i], dd,
                              np.inf).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
