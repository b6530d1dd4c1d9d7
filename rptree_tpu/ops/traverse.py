"""Batched level-synchronous query traversal.

The reference descends the pointer tree per query, forking into both
subtrees when the query lands close to a cut plane -- the exact decision
table at ``src/Data/RPTree.hs:309-314``:

    proj < thr && dl > dr  -> BOTH
    proj < thr             -> LEFT
    proj > thr && dl < dr  -> BOTH
    otherwise              -> RIGHT

with ``dl = |margin_lo - proj|``, ``dr = |margin_hi - proj|``.

Here the whole query batch advances one level at a time over a fixed-size
*frontier* of tree nodes per (query, tree).  Forking appends the second
child to the frontier; when the frontier overflows its budget, entries with
the largest margin-priority are dropped (the same priority the reference's
``candidatesH`` uses: the running minimum of margin distances along the
path, ``RPTree.hs:317-346``).  With ``budget >= n_leaves`` the traversal is
exact (identical leaf set to the reference's ``candidates``).

TPU layout note: all per-level state is kept as ``[F, B]`` -- the query
batch on the 128-wide lane axis, the (small) frontier on sublanes.  The
naive ``[B, F]`` layout puts F ~ 4..32 on lanes, wasting >= 75% of every
VPU op; measured on v5e this layout plus the compare-exchange compaction
below is ~5x faster end-to-end than a ``[B, F]`` + ``lax.top_k`` version.
The 2F -> F frontier compaction is a bitonic sorting network expressed as
``min``/``max``/``where`` along the sublane axis (F is a static power-of-2
after padding), which XLA fuses into a handful of full-width VPU ops --
no ``sort``/``top_k`` call, no layout change.

Encoding: a frontier entry is an int32 -- ``>= 0`` means "split-segment
index at the current level", ``< 0`` (but not INVALID) encodes a terminal
leaf as ``-(leaf_id + 1)``, and ``INVALID`` (int32 min) is an empty slot.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.plan import TreePlan

__all__ = ["traverse_tree", "INVALID_ENC", "VALID_PRIO_CAP", "bitonic_sort_kv"]

INVALID_ENC = jnp.iinfo(jnp.int32).min
# priorities of live entries are capped at a large finite value so that empty
# (infinite-priority) slots always lose the compaction
VALID_PRIO_CAP = jnp.float32(3.0e38)


def _next_pow2(m: int) -> int:
    p = 1
    while p < m:
        p *= 2
    return p


def bitonic_sort_kv(pri: jax.Array, enc: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sort ``(pri, enc)`` rows ascending by ``pri`` along axis 0.

    ``pri: f32[M, B]``, ``enc: int32[M, B]`` with M a power of two.  A
    classic bitonic network of ``min/max/where`` ops -- every stage is a
    full-lane-width VPU op over the batch axis, which is the reason this
    beats ``lax.top_k`` (whose reduction axis would have to be the minor
    axis) for small M.
    """
    m, b = pri.shape
    assert m & (m - 1) == 0, f"M must be a power of two, got {m}"
    idx = np.arange(m)
    k = 2
    while k <= m:
        j = k // 2
        while j >= 1:
            # partner index is idx ^ j: swapping j-sized blocks pairwise,
            # expressed as reshape + reversed slice (no gather)
            shape = (m // (2 * j), 2, j, b)
            p_o = jnp.flip(pri.reshape(shape), axis=1).reshape(m, b)
            e_o = jnp.flip(enc.reshape(shape), axis=1).reshape(m, b)
            keep_min = ((idx & k) == 0) == (idx < (idx ^ j))
            keep_min = jnp.asarray(keep_min[:, None])
            # lexicographic (pri, enc) comparison: priority ties are common
            # (forked siblings inherit the same running path-minimum), and a
            # plain `<` would make both pair elements pick the same side,
            # duplicating one entry and LOSING the other.  Live encodings
            # are distinct tree nodes, so (pri, enc) is a strict total
            # order on live entries.
            other_is_min = (p_o < pri) | ((p_o == pri) & (e_o < enc))
            p_min = jnp.where(other_is_min, p_o, pri)
            e_min = jnp.where(other_is_min, e_o, enc)
            p_max = jnp.where(other_is_min, pri, p_o)
            e_max = jnp.where(other_is_min, enc, e_o)
            pri = jnp.where(keep_min, p_min, p_max)
            enc = jnp.where(keep_min, e_min, e_max)
            j //= 2
        k *= 2
    return pri, enc


# up to this table size the one-hot expansion is cheaper than one gather
_ONEHOT_MAX = 64


def _lookup_level(thr_l, mgl_l, mgh_l, child_l, seg):
    """All five per-level node-table lookups for frontier ``seg [F, B]``.

    TPU gathers cost ~ns per INDEX regardless of payload, so the five
    separate ``table[seg]`` lookups (threshold, two margins, two children)
    that a naive traversal issues per level dominate its runtime.  Two
    regimes:

    * small tables (``n_segs <= 64``, the upper tree levels): a single
      one-hot compare reused for all five select-and-sum reductions --
      pure full-lane VPU work, no gather at all;
    * large tables (the deep levels): pack all five columns into ONE
      ``f32[n_segs, 8]`` row (child ints bitcast to f32, values preserved
      through the gather) and issue a single row gather -- 1/5th the
      index count of the naive form.

    Returns ``(thr, lo, hi, lc, rc)`` each shaped like ``seg``.
    """
    ns = thr_l.shape[0]
    if ns == 1:
        b = lambda a: jnp.broadcast_to(a[0], seg.shape)  # noqa: E731
        return (b(thr_l), b(mgl_l), b(mgh_l),
                b(child_l[:, 0]), b(child_l[:, 1]))
    if ns <= _ONEHOT_MAX:
        shape = (ns,) + (1,) * seg.ndim
        oh = seg[None, ...] == jnp.arange(ns, dtype=seg.dtype).reshape(shape)

        def pick(col):
            zero = jnp.zeros((), dtype=col.dtype)
            return jnp.sum(jnp.where(oh, col.reshape(shape), zero), axis=0)

        return (pick(thr_l), pick(mgl_l), pick(mgh_l),
                pick(child_l[:, 0]), pick(child_l[:, 1]))
    packed = jnp.stack(
        [thr_l, mgl_l, mgh_l,
         jax.lax.bitcast_convert_type(child_l[:, 0], jnp.float32),
         jax.lax.bitcast_convert_type(child_l[:, 1], jnp.float32)],
        axis=-1,
    )  # [ns, 5]
    vals = jnp.take(packed, seg, axis=0)  # [F, B, 5] -- ONE gather
    lc = jax.lax.bitcast_convert_type(vals[..., 3], jnp.int32)
    rc = jax.lax.bitcast_convert_type(vals[..., 4], jnp.int32)
    return vals[..., 0], vals[..., 1], vals[..., 2], lc, rc


def traverse_tree(
    plan: TreePlan,
    thr: jax.Array,
    mgl: jax.Array,
    mgh: jax.Array,
    projq: jax.Array,
    budget: int,
) -> Tuple[jax.Array, jax.Array]:
    """Traverse one tree with a batch of queries.

    Args:
      plan: static tree shape.
      thr/mgl/mgh: ``f32[L, S_max]`` threshold and margin arrays (level
        ``l`` uses entries ``[0, n_segs_l)``; the padded tail is unread).
      projq: ``f32[B, L]`` query projections (``q . r_l`` per level).
      budget: frontier width F (>= 1).  ``F >= plan.n_leaves`` is exact.

    Returns:
      ``(leaf_ids int32[B, F]`` with ``-1`` for empty slots,
      ``prio f32[B, F]`` -- the reference's ``candidatesH`` margin priority).
    """
    b = projq.shape[0]
    f = int(budget)
    projq = projq.T  # [L, B]: queries on lanes

    fenc = jnp.full((f, b), INVALID_ENC, dtype=jnp.int32)
    fpri = jnp.full((f, b), jnp.inf, dtype=jnp.float32)
    fenc = fenc.at[0, :].set(plan.root_enc)
    # reference candidatesH starts the path priority at infinity
    # (RPTree.hs:322-324); capped finite so live entries beat empty slots
    fpri = fpri.at[0, :].set(VALID_PRIO_CAP)

    m = _next_pow2(2 * f)

    for l, lp in enumerate(plan.levels):
        is_seg = fenc >= 0
        seg = jnp.clip(fenc, 0, lp.n_segs - 1)
        t, lo, hi, lc, rc = _lookup_level(
            thr[l][: lp.n_segs], mgl[l][: lp.n_segs], mgh[l][: lp.n_segs],
            jnp.asarray(lp.child_enc), seg,
        )
        proj = projq[l][None, :]  # [1, B]
        dl = jnp.abs(lo - proj)
        dr = jnp.abs(hi - proj)
        lt = proj < t
        gt = proj > t
        go_both = (lt & (dl > dr)) | (gt & (dl < dr))
        go_left = lt | go_both
        go_right = (~lt) | go_both
        pl = jnp.minimum(fpri, dl)
        pr = jnp.minimum(fpri, dr)
        # slot bank 1: descend-left entries, or pass-through (leaf / empty)
        enc_l = jnp.where(is_seg, jnp.where(go_left, lc, INVALID_ENC), fenc)
        pri_l = jnp.where(is_seg, jnp.where(go_left, pl, jnp.inf), fpri)
        # slot bank 2: descend-right entries
        take_r = is_seg & go_right
        enc_r = jnp.where(take_r, rc, INVALID_ENC)
        pri_r = jnp.where(take_r, pr, jnp.inf)
        enc2 = jnp.concatenate([enc_l, enc_r], axis=0)  # [2F, B]
        pri2 = jnp.where(enc2 == INVALID_ENC,
                         jnp.inf,
                         jnp.concatenate([pri_l, pri_r], axis=0))
        if m > 2 * f:  # pad to a power of two for the network
            pad = ((0, m - 2 * f), (0, 0))
            enc2 = jnp.pad(enc2, pad, constant_values=INVALID_ENC)
            pri2 = jnp.pad(pri2, pad, constant_values=jnp.inf)
        # compact 2F -> F keeping the lowest margin priorities
        pri_s, enc_s = bitonic_sort_kv(pri2, enc2)
        fenc = enc_s[:f, :]
        fpri = pri_s[:f, :]

    leaf_ids = jnp.where(fenc == INVALID_ENC, -1, -(fenc + 1))
    return leaf_ids.T, fpri.T
