"""Fused exact-scan kNN kernel (Pallas / TPU).

The XLA scan path (``models/forest._brute_force``) materializes a
``[B, tile]`` distance block per step and selects with ``top_k`` /
``approx_max_k`` -- HBM traffic and selection cost dominate the GEMM.
This kernel keeps everything in VMEM: per (query-tile, data-tile) grid
step it runs one MXU matmul, forms the partial distances
``sqx - 2 x.q`` (the query-norm term is added OUTSIDE -- it is constant
per query, so selection order is unaffected), and folds the tile's k
best into a persistent per-query top-k scratch via k rounds of
min-extraction + vectorized sorted-insert.  Output is written on the
last data tile.

Reference analogue: the exact-kNN ground truth of ``recallWith``
(``src/Data/RPTree.hs:280-282``), at MXU rate.

Correctness notes
- padded data rows carry ``sq = +inf`` so their partial distance is +inf
  and they can never be selected; padded query rows are sliced away by
  the caller.
- ties: equal distances are extracted in ascending data-index order
  (the ``iota`` tiebreak), matching a stable scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend (absent on some CPU-only installs)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = ["scan_topk", "pallas_scan_available"]


def _kernel(k, cn, q_ref, x_ref, sqx_ref, outd_ref, outi_ref, sd, si):
    nt = pl.program_id(1)
    bq = q_ref.shape[0]

    @pl.when(nt == 0)
    def _():
        sd[:] = jnp.full(sd.shape, jnp.inf, sd.dtype)
        si[:] = jnp.full(si.shape, -1, si.dtype)

    dots = lax.dot_general(
        q_ref[:], x_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, CN]
    d = sqx_ref[0, 0, :][None, :].astype(jnp.float32) - 2.0 * dots
    base = nt * cn
    iota = lax.broadcasted_iota(jnp.int32, (bq, cn), 1)
    colid = lax.broadcasted_iota(jnp.int32, (bq, k), 1)

    def round_body(_, dd):
        m = jnp.min(dd, axis=1)  # [BQ]
        idx = jnp.min(
            jnp.where(dd == m[:, None], iota, jnp.int32(2 ** 30)), axis=1
        )
        cur_d = sd[:]
        cur_i = si[:]
        better = m < cur_d[:, k - 1]
        # sorted insert: rank of m in the row, shift the tail right
        pos = jnp.sum((cur_d < m[:, None]).astype(jnp.int32), axis=1)
        prev_d = jnp.concatenate([cur_d[:, :1], cur_d[:, : k - 1]], axis=1)
        prev_i = jnp.concatenate([cur_i[:, :1], cur_i[:, : k - 1]], axis=1)
        at = colid == pos[:, None]
        after = colid > pos[:, None]
        bb = better[:, None]
        sd[:] = jnp.where(bb & at, m[:, None],
                          jnp.where(bb & after, prev_d, cur_d))
        si[:] = jnp.where(bb & at, (base + idx)[:, None],
                          jnp.where(bb & after, prev_i, cur_i))
        # retire the extracted element from the tile
        return jnp.where(iota == idx[:, None], jnp.inf, dd)

    lax.fori_loop(0, k, round_body, d)

    @pl.when(nt == pl.num_programs(1) - 1)
    def _():
        outd_ref[:] = sd[:]
        outi_ref[:] = si[:]


def pallas_scan_available() -> bool:
    try:
        return pltpu is not None and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_q", "block_n", "interpret"),
)
def scan_topk(x, sq, q, k, metric="l2", block_q=256, block_n=2048,
              interpret=False):
    """Exact kNN over dense rows via the fused Pallas scan.

    ``x: [N, D]`` (cast to bf16 for the MXU), ``sq: f32[N]`` squared
    norms, ``q: f32[B, D]``.  Metrics: ``l2``/``sql2`` (factored form)
    and ``dot`` (runs with ``sq = 0``; partial = -2 x.q, halved after).
    Returns ``(dists f32[B, k], ids int32[B, k])``.
    """
    if metric not in ("l2", "sql2", "dot"):
        raise ValueError(
            f"scan_topk supports metrics ('l2', 'sql2', 'dot'); got "
            f"{metric!r} (cosine has no factored partial-distance form "
            "here -- use brute_force_knn)"
        )
    n, dim = x.shape
    b = q.shape[0]
    k = int(min(k, n))
    # pad every axis to its tile multiple
    npad = (-n) % block_n
    bpad = (-b) % block_q
    dpad = (-dim) % 128
    xb = x.astype(jnp.bfloat16)
    if npad or dpad:
        xb = jnp.pad(xb, ((0, npad), (0, dpad)))
        sq = jnp.pad(sq, (0, npad), constant_values=jnp.inf)
    qp = q.astype(jnp.bfloat16)
    if bpad or dpad:
        qp = jnp.pad(qp, ((0, bpad), (0, dpad)))
    if metric == "dot":
        # zero the partial-norm term but KEEP the +inf padding mask --
        # zeroing everything would let padded rows win with distance 0
        sq = jnp.where(jnp.isinf(sq), jnp.inf, jnp.zeros_like(sq))
    n_t = (n + npad) // block_n
    b_t = (b + bpad) // block_q
    sq2 = sq.reshape(n_t, 1, block_n)

    kern = functools.partial(_kernel, k, block_n)
    outd, outi = pl.pallas_call(
        kern,
        grid=(b_t, n_t),
        in_specs=[
            pl.BlockSpec((block_q, dim + dpad), lambda i, j: (i, 0)),
            pl.BlockSpec((block_n, dim + dpad), lambda i, j: (j, 0)),
            pl.BlockSpec((1, 1, block_n), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b + bpad, k), jnp.float32),
            jax.ShapeDtypeStruct((b + bpad, k), jnp.int32),
        ],
        scratch_shapes=[  # pltpu is required even in interpret mode
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(qp, xb, sq2)
    outd, outi = outd[:b], outi[:b]
    if metric == "dot":
        return outd * 0.5, outi
    sqq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)[:, None]
    dd = jnp.maximum(outd + sqq, 0.0)
    if metric == "l2":
        dd = jnp.sqrt(dd)
    return dd, outi
