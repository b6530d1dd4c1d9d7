"""Static tree-structure plan.

The key representational shift from the reference (SURVEY.md section 7): the
reference grows a pointer tree by recursive median splits
(``src/Data/RPTree/Internal.hs:257-297``).  Because every split is a
*median* split -- ``nh = n `div` 2`` (``Internal.hs:503``) -- and the stop
conditions depend only on segment size and level
(``ixLev >= maxDepth || length xs' <= minLeaf``, ``Internal.hs:289``), the
entire tree *shape* is a deterministic function of ``(n, max_depth,
min_leaf)`` alone.  Only thresholds, margins, and the point permutation are
data-dependent.

This module computes that shape once, host-side in numpy.  The result is a
:class:`TreePlan` whose per-level gather indices and sort keys are embedded
as compile-time constants in the XLA build/query programs: the build becomes
one 2-key ``lax.sort`` per level with *static* median positions, and the
query traversal uses *static* child/leaf encodings.  No recursion, no
dynamic shapes, no ragged tensors.

Position convention: at every level, points are kept sorted by
(segment, projection).  A split segment ``[s, s+m)`` with ``nh = m // 2``
sends positions ``[s, s+nh)`` to the left child and ``[s+nh, s+m)`` to the
right child -- mirroring the reference's ``take nh / drop nh`` of the
projection-sorted vector (``Internal.hs:495``).  The threshold is the
projection value at position ``s+nh`` (the median, ``Internal.hs:501``) and
the margin pair is at positions ``(s+nh-1, s+nh+1)`` for ``m >= 3``, with
the reference's degenerate small-segment cases (``Internal.hs:497-499``)
reproduced exactly.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

__all__ = ["LevelPlan", "TreePlan", "make_plan", "LEAF_ENC_BASE"]


def _encode_leaf(leaf_id: int) -> int:
    """Frontier encoding of a terminal leaf: negative values are leaves."""
    return -(leaf_id + 1)


LEAF_ENC_BASE = -1  # enc < 0  <=>  leaf; leaf_id = -(enc + 1)


@dataclasses.dataclass(frozen=True)
class LevelPlan:
    """Static per-level structure (all arrays are host numpy constants)."""

    n_segs: int            # number of segments that split at this level
    seg_key: np.ndarray    # int32[n]: sort key per position (region start)
    seg_start: np.ndarray  # int32[n_segs]
    seg_size: np.ndarray   # int32[n_segs]
    thr_pos: np.ndarray    # int32[n_segs]: position of the median projection
    mgl_pos: np.ndarray    # int32[n_segs]: position of the low-margin value
    mgr_pos: np.ndarray    # int32[n_segs]: position of the high-margin value
    child_enc: np.ndarray  # int32[n_segs, 2]: child encoding (>=0: split-seg
    #                        index at level l+1; <0: -(leaf_id+1))


class TreePlan:
    """Static shape of one RP tree (shared by every tree in a forest, since
    shape depends only on ``(n, max_depth, min_leaf)``).

    Hashable/comparable by its defining parameters so it can be a `static`
    argument to jitted functions.
    """

    def __init__(self, n: int, max_depth: int, min_leaf: int):
        if n < 1:
            raise ValueError(f"dataset must be non-empty, got n={n}")
        if min_leaf < 1:
            raise ValueError(f"min_leaf must be >= 1, got {min_leaf}")
        if max_depth < 0:
            raise ValueError(f"max_depth must be >= 0, got {max_depth}")
        self.n = int(n)
        self.max_depth = int(max_depth)
        self.min_leaf = int(min_leaf)
        self.levels: List[LevelPlan] = []
        self._build()

    # -- construction ------------------------------------------------------

    def _will_split(self, size: int, level: int) -> bool:
        # reference stop condition, Internal.hs:289 (negated)
        return level < self.max_depth and size > self.min_leaf

    def _build(self):
        n = self.n
        leaves: List[tuple] = []  # (start, size)
        raw_levels = []  # per level: list of dicts
        key = np.zeros(n, dtype=np.int32)

        if self._will_split(n, 0):
            current = [(0, n)]
        else:
            current = []
            leaves.append((0, n))

        level = 0
        while current:
            segs = []
            next_splits = []
            next_key = key.copy()
            for (s, m) in current:
                nh = m // 2
                if m >= 3:
                    mglp, thrp, mgrp = s + nh - 1, s + nh, s + nh + 1
                else:  # m == 2 (m > min_leaf >= 1 implies m >= 2)
                    mglp, thrp, mgrp = s, s + 1, s + 1
                children = []
                for (cs, cm) in ((s, nh), (s + nh, m - nh)):
                    if self._will_split(cm, level + 1):
                        children.append(len(next_splits))
                        next_splits.append((cs, cm))
                    else:
                        # leaf id provisional: store span, resolve later
                        children.append(("leaf", cs, cm))
                        leaves.append((cs, cm))
                    next_key[cs : cs + cm] = cs
                segs.append(dict(start=s, size=m, thr=thrp, mgl=mglp, mgr=mgrp,
                                 children=children))
            raw_levels.append(dict(segs=segs, key=key))
            key = next_key
            current = next_splits
            level += 1

        # resolve leaf ids in position order
        leaves.sort(key=lambda t: t[0])
        leaf_id_of_start = {s: i for i, (s, m) in enumerate(leaves)}
        self.n_leaves = len(leaves)
        self.leaf_start = np.asarray([s for s, _ in leaves], dtype=np.int32)
        self.leaf_len = np.asarray([m for _, m in leaves], dtype=np.int32)
        self.max_leaf_len = int(self.leaf_len.max()) if self.n_leaves else 0
        self.n_levels = len(raw_levels)

        for lv in raw_levels:
            segs = lv["segs"]
            child_enc = np.zeros((len(segs), 2), dtype=np.int32)
            for j, sg in enumerate(segs):
                for c, ch in enumerate(sg["children"]):
                    if isinstance(ch, tuple):  # ("leaf", start, size)
                        child_enc[j, c] = _encode_leaf(leaf_id_of_start[ch[1]])
                    else:
                        child_enc[j, c] = ch
            self.levels.append(
                LevelPlan(
                    n_segs=len(segs),
                    seg_key=lv["key"].astype(np.int32),
                    seg_start=np.asarray([sg["start"] for sg in segs], np.int32),
                    seg_size=np.asarray([sg["size"] for sg in segs], np.int32),
                    thr_pos=np.asarray([sg["thr"] for sg in segs], np.int32),
                    mgl_pos=np.asarray([sg["mgl"] for sg in segs], np.int32),
                    mgr_pos=np.asarray([sg["mgr"] for sg in segs], np.int32),
                    child_enc=child_enc,
                )
            )

        # root encoding for the traversal frontier
        self.root_enc = 0 if self.n_levels > 0 else _encode_leaf(0)
        # total node count (branch + leaf), for tree stats
        self.n_branches = sum(lp.n_segs for lp in self.levels)

    def padded_child_table(self) -> np.ndarray:
        """Child encodings padded to the widest level:
        ``int32[n_levels, max_segs, 2]`` (enc >= 0: split-segment index at
        the next level; enc < 0: -(leaf_id+1)).  Shared by the fold
        descent and the data-parallel builder; cached (plans are
        immutable)."""
        if getattr(self, "_child_table", None) is None:
            smax = max((lp.n_segs for lp in self.levels), default=1)
            child = np.zeros((self.n_levels, smax, 2), np.int32)
            for l, lp in enumerate(self.levels):
                child[l, : lp.n_segs] = lp.child_enc
            self._child_table = child
        return self._child_table

    # -- static-arg protocol -------------------------------------------------

    def _key(self):
        return (self.n, self.max_depth, self.min_leaf)

    def __eq__(self, other):
        return isinstance(other, TreePlan) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):
        return (f"TreePlan(n={self.n}, max_depth={self.max_depth}, "
                f"min_leaf={self.min_leaf}, levels={self.n_levels}, "
                f"leaves={self.n_leaves}, max_leaf={self.max_leaf_len})")


_PLAN_CACHE: dict = {}
_PLAN_CACHE_MAX = 16  # plans hold O(n * levels) host arrays


def make_plan(n: int, max_depth: int, min_leaf: int) -> TreePlan:
    """Cached plan construction (plans embed O(n * levels) constants;
    bounded FIFO so long-running processes with many dataset shapes do
    not accumulate them)."""
    k = (n, max_depth, min_leaf)
    plan = _PLAN_CACHE.get(k)
    if plan is None:
        plan = TreePlan(n, max_depth, min_leaf)
        while len(_PLAN_CACHE) >= _PLAN_CACHE_MAX:
            _PLAN_CACHE.pop(next(iter(_PLAN_CACHE)))
        _PLAN_CACHE[k] = plan
    return plan
