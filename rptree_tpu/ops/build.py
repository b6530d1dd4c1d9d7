"""Level-synchronous tree construction (the build-time hot path).

Replaces the reference's recursive ``insert``/``partitionAtMedian``
(``src/Data/RPTree/Internal.hs:257-297,484-505``), which projects and sorts
every node's points one node at a time, with an array program that handles a
*whole level across all trees* at once:

1. one projection GEMM per level: ``proj = X @ R[:, l, :]`` -> ``[n, T]``
   (batched over the forest by ``vmap``);
2. one 2-key stable ``lax.sort`` per level over ``(segment_key, proj)``,
   carrying the point permutation -- the segmented median "kernel";
3. static gathers of the median / margin values (positions are compile-time
   constants from :class:`~rptree_tpu.models.plan.TreePlan`).

Sort stability plus the plan's positional split reproduce the reference's
``take nh / drop nh`` partition of the stably-sorted projections
(``Internal.hs:495,508-512``) exactly, so leaf contents are bit-identical to
the reference semantics whenever the projections themselves are.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..models.plan import TreePlan
from .sparse import EllMatrix, ell_project

__all__ = ["TreeArrays", "build_tree_arrays", "build_forest_arrays", "project_dataset"]


class TreeArrays(NamedTuple):
    """Data-dependent arrays of one tree (or of a whole forest, with a
    leading ``[T]`` axis on every leaf): the TPU-native counterpart of the
    reference's ``RPTree`` record (``Internal.hs:172-177``)."""

    r: jax.Array            # [depth, D] projections (forest: [T, depth, D])
    thr: Tuple[jax.Array, ...]  # per level: [n_segs_l] median thresholds
    mgl: Tuple[jax.Array, ...]  # per level: low margin (Max side)
    mgh: Tuple[jax.Array, ...]  # per level: high margin (Min side)
    perm: jax.Array         # int32[n] point ids sorted by leaf


def project_dataset(x, r_l: jax.Array, precision=lax.Precision.HIGHEST) -> jax.Array:
    """Project every point onto one level's projection vector: ``[n]``.

    Precision defaults to HIGHEST: on TPU, f32 matmuls otherwise run at
    bfloat16 MXU precision, whose ~1e-2 error flips the order of
    nearly-equal projections and perturbs median thresholds (recall is
    statistically robust to this, but parity with the reference semantics
    is not).  Pass ``lax.Precision.DEFAULT`` for maximum throughput.
    """
    if isinstance(x, EllMatrix):
        return ell_project(x, r_l)
    return jnp.matmul(x, r_l, precision=precision)


def build_tree_arrays(plan: TreePlan, x, r: jax.Array) -> TreeArrays:
    """Build one tree's arrays.  ``x``: ``f32[n, D]`` dense or
    :class:`EllMatrix`; ``r``: ``f32[depth, D]``.

    Levels are unrolled in Python (static count).  The permutation ``ids``
    is initialised in dataset order so stable-sort tie-breaking matches the
    reference's stable merge sort over the same order.
    """
    n = plan.n
    ids = jnp.arange(n, dtype=jnp.int32)
    thrs, mgls, mghs = [], [], []
    for l, lp in enumerate(plan.levels):
        proj = project_dataset(x, r[l]).astype(jnp.float32)
        p = jnp.take(proj, ids, axis=0)
        seg_key = jnp.asarray(lp.seg_key)
        _, p_sorted, ids = lax.sort((seg_key, p, ids), num_keys=2, is_stable=True)
        thrs.append(p_sorted[jnp.asarray(lp.thr_pos)])
        mgls.append(p_sorted[jnp.asarray(lp.mgl_pos)])
        mghs.append(p_sorted[jnp.asarray(lp.mgr_pos)])
    return TreeArrays(r=r, thr=tuple(thrs), mgl=tuple(mgls), mgh=tuple(mghs), perm=ids)


def build_forest_arrays(plan: TreePlan, x, r: jax.Array) -> TreeArrays:
    """Build a whole forest: ``r`` is ``[T, depth, D]``; every output leaf
    gains a leading ``[T]`` axis.  The per-level projection GEMMs batch into
    ``X @ R[:, l, :].T`` across trees (the forest axis is the natural
    "tree-parallel" dimension, SURVEY.md section 2.11)."""
    return jax.vmap(lambda rt: build_tree_arrays(plan, x, rt))(r)
