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

Encoding: a frontier entry is an int32 -- ``>= 0`` means "split-segment
index at the current level", ``< 0`` (but not INVALID) encodes a terminal
leaf as ``-(leaf_id + 1)``, and ``INVALID`` (int32 min) is an empty slot.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.plan import TreePlan

__all__ = ["traverse_tree", "INVALID_ENC", "VALID_PRIO_CAP"]

INVALID_ENC = jnp.iinfo(jnp.int32).min
# priorities of live entries are capped at a large finite value so that empty
# (infinite-priority) slots always lose the top-k compaction
VALID_PRIO_CAP = jnp.float32(3.0e38)


def traverse_tree(
    plan: TreePlan,
    thr: Tuple[jax.Array, ...],
    mgl: Tuple[jax.Array, ...],
    mgh: Tuple[jax.Array, ...],
    projq: jax.Array,
    budget: int,
) -> Tuple[jax.Array, jax.Array]:
    """Traverse one tree with a batch of queries.

    Args:
      plan: static tree shape.
      thr/mgl/mgh: per-level threshold and margin arrays (``[n_segs_l]``).
      projq: ``f32[B, L]`` query projections (``q . r_l`` per level).
      budget: frontier width F (>= 1).  ``F >= plan.n_leaves`` is exact.

    Returns:
      ``(leaf_ids int32[B, F]`` with ``-1`` for empty slots,
      ``prio f32[B, F]`` -- the reference's ``candidatesH`` margin priority).
    """
    b = projq.shape[0]
    f = int(budget)
    fenc = jnp.full((b, f), INVALID_ENC, dtype=jnp.int32)
    fpri = jnp.full((b, f), jnp.inf, dtype=jnp.float32)
    fenc = fenc.at[:, 0].set(plan.root_enc)
    # reference candidatesH starts the path priority at infinity
    # (RPTree.hs:322-324); capped finite so live entries beat empty slots
    fpri = fpri.at[:, 0].set(VALID_PRIO_CAP)

    for l, lp in enumerate(plan.levels):
        is_seg = fenc >= 0
        seg = jnp.clip(fenc, 0, lp.n_segs - 1)
        t = jnp.take(thr[l], seg)
        lo = jnp.take(mgl[l], seg)
        hi = jnp.take(mgh[l], seg)
        proj = projq[:, l][:, None]
        dl = jnp.abs(lo - proj)
        dr = jnp.abs(hi - proj)
        lt = proj < t
        gt = proj > t
        go_both = (lt & (dl > dr)) | (gt & (dl < dr))
        go_left = lt | go_both
        go_right = (~lt) | go_both
        child = jnp.asarray(lp.child_enc)
        lc = child[seg, 0]
        rc = child[seg, 1]
        pl = jnp.minimum(fpri, dl)
        pr = jnp.minimum(fpri, dr)
        # slot bank 1: descend-left entries, or pass-through (leaf / empty)
        enc_l = jnp.where(is_seg, jnp.where(go_left, lc, INVALID_ENC), fenc)
        pri_l = jnp.where(is_seg, jnp.where(go_left, pl, jnp.inf), fpri)
        # slot bank 2: descend-right entries
        take_r = is_seg & go_right
        enc_r = jnp.where(take_r, rc, INVALID_ENC)
        pri_r = jnp.where(take_r, pr, jnp.inf)
        enc2 = jnp.concatenate([enc_l, enc_r], axis=1)
        pri2 = jnp.where(enc2 == INVALID_ENC,
                         jnp.inf,
                         jnp.concatenate([pri_l, pri_r], axis=1))
        # compact 2F -> F keeping the lowest margin priorities
        neg, idx = lax.top_k(-pri2, f)
        fenc = jnp.take_along_axis(enc2, idx, axis=1)
        fpri = -neg

    leaf_ids = jnp.where(fenc == INVALID_ENC, -1, -(fenc + 1))
    return leaf_ids, fpri
