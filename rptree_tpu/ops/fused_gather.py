"""Fused block-gather + dot kernel (Pallas / TPU).

The packed rerank's dominant cost at high-recall configs is the block
FETCH: XLA lowers ``jnp.take(x_leaf, rows_sel, axis=0)`` + einsum to a
gather that measured ~198 GB/s effective on v5e (~1/4 of HBM peak) at
the 1M clustered flagship shape.  This kernel drives the same access
pattern through the scalar-prefetch pipeline instead: the grid walks the
query axis, and per query the BlockSpec index_maps (which receive the
prefetched ``rows_sel``) DMA that query's ``P`` leaf blocks HBM->VMEM
with automatic double buffering, fusing the dot against the query so the
blocks never round-trip to HBM.

Outputs ``(dots f32[B, P, lmax], sqx f32[B, P, lmax])`` -- the same
intermediates the XLA path materializes; distance assembly, masking and
selection stay in XLA (they are cheap and fuse fine).

Constraints: dense blocks only (f32/bf16), ``lmax % 8 == 0`` and
``D % 128 == 0`` (sublane/lane tiling); callers fall back to the XLA
gather otherwise.  Reference analogue: the candidate fetch of ``knn``'s
rerank fold (``src/Data/RPTree.hs:159-176``), at DMA rate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend (absent on some CPU-only installs)
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = ["gather_score", "fused_gather_available", "gather_score_ok"]


def fused_gather_available() -> bool:
    try:
        return pltpu is not None and jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def gather_score_ok(x_leaf, probes: int) -> bool:
    """Shape gate: can the fused kernel serve this packed layout?  The
    slot axis must be a multiple of the dtype's sublane tile (f32: 8,
    bf16: 16 -- an 8-aligned bf16 layout passes pack_leaves but fails
    the Mosaic (16, 128) tiling)."""
    if not (hasattr(x_leaf, "ndim") and getattr(x_leaf, "ndim", 0) == 3
            and probes >= 1 and x_leaf.shape[2] % 128 == 0):
        return False
    if x_leaf.dtype == jnp.float32:
        return x_leaf.shape[1] % 8 == 0
    if x_leaf.dtype == jnp.bfloat16:
        return x_leaf.shape[1] % 16 == 0
    return False


@functools.partial(jax.jit, static_argnames=("probes", "interpret"))
def gather_score(x_leaf, sq_leaf, q, rows_sel, probes, interpret=False):
    """``dots[b, p, :] = x_leaf[rows_sel[b, p]] @ q[b]`` and the gathered
    ``sqx[b, p, :] = sq_leaf[rows_sel[b, p]]``, pipelined.

    ``x_leaf: [G, lmax, D]`` (f32/bf16), ``sq_leaf: f32[G, lmax]``,
    ``q: f32[B, D]``, ``rows_sel: int32[B, P]``.
    """
    g, lmax, d = x_leaf.shape
    b = q.shape[0]
    p = int(probes)
    sel = rows_sel.reshape(-1).astype(jnp.int32)  # [B*P]

    def kern(sel_ref, *refs):
        x_refs = refs[:p]
        s_refs = refs[p:2 * p]
        q_ref = refs[2 * p]
        dots_ref = refs[2 * p + 1]
        sqx_ref = refs[2 * p + 2]
        qv = q_ref[0, 0].astype(x_refs[0].dtype)  # [D]
        for j in range(p):
            xb = x_refs[j][0]  # [lmax, D]
            dots_ref[0, j, :] = jax.lax.dot_general(
                xb, qv, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sqx_ref[0, j, :] = s_refs[j][0, 0]

    def x_map(j):
        return lambda bi, sel_ref: (sel_ref[bi * p + j], 0, 0)

    def s_map(j):
        return lambda bi, sel_ref: (sel_ref[bi * p + j], 0, 0)

    # sq/q ride as 3-D so every block's trailing two dims equal the
    # array's (the TPU lowering rejects (1, lmax) blocks: the sublane
    # dim must divide 8 or span the array)
    in_specs = (
        [pl.BlockSpec((1, lmax, d), x_map(j)) for j in range(p)]
        + [pl.BlockSpec((1, 1, lmax), s_map(j)) for j in range(p)]
        + [pl.BlockSpec((1, 1, d), lambda bi, sel_ref: (bi, 0, 0))]
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, p, lmax), lambda bi, sel_ref: (bi, 0, 0)),
            pl.BlockSpec((1, p, lmax), lambda bi, sel_ref: (bi, 0, 0)),
        ],
    )
    dots, sqx = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, p, lmax), jnp.float32),
            jax.ShapeDtypeStruct((b, p, lmax), jnp.float32),
        ],
        interpret=interpret,
    )(sel, *([x_leaf] * p), *([sq_leaf[:, None, :]] * p), q[:, None, :])
    return dots, sqx
