"""Data-parallel forest build: dataset sharded over points, exact medians
via distributed radix selection.

SURVEY.md section 7 flags this as the crux of scaling the build beyond one
device's HBM: per (tree, level, node) the reference takes the *median* of
the node's projections with stable tie order (``partitionAtMedian``,
``Internal.hs:484-505``); a data-sharded build cannot sort globally.  The
scheme here:

1. every shard projects its own rows (the expensive GEMM is perfectly
   sharded) and locally sorts ``(node_code, projection_key)`` once per
   level;
2. the median / margin values per node come from a **distributed radix
   selection** on the 32-bit monotone integer image of the float
   projections: walk the bits MSB->LSB, counting ``keys < candidate`` per
   node with a vectorized binary search in each shard's sorted run and a
   ``lax.psum`` over the data axis -- 32 rounds, no data movement;
3. points equal to the median split by the *global stable order* (shard
   order, then local order), reproducing the reference's stable-sort tie
   behaviour: shards exchange per-node equal-counts (one small
   ``all_gather``) and take their slice of the left-side quota;
4. node codes advance level-synchronously; at the end the (tiny) per-point
   leaf codes are gathered and the standard leaf-sorted permutation is
   assembled -- yielding a bit-normal :class:`~rptree_tpu.models.forest.RPForest`.

Exactness: thresholds/margins are the exact order statistics of the global
projection multiset (not approximations), and the leaf assignment matches
the single-device builder's stable semantics whenever the projections
match.  Projection values themselves may differ from the single-device
build by GEMM reduction order (shard-local sums), the usual float caveat.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ForestConfig
from ..models.forest import RPForest
from ..models.plan import TreePlan, make_plan
from ..ops.build import TreeArrays
from ..utils import gen as rgen

__all__ = ["forest_batch_data_parallel", "brute_force_knn_sharded",
           "DATA_AXIS", "data_mesh"]

DATA_AXIS = "data"


def data_mesh(n_shards: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the data (points) axis."""
    if devices is None:
        devices = jax.devices()
    if n_shards is None:
        n_shards = len(devices)
    return Mesh(np.asarray(devices[:n_shards]), (DATA_AXIS,))


def _f32_to_key(p: jax.Array) -> jax.Array:
    """Monotone f32 -> uint32 (total order matching float comparison)."""
    u = lax.bitcast_convert_type(p, jnp.uint32)
    neg = (u >> 31) == 1
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def _key_to_f32(k: jax.Array) -> jax.Array:
    neg = (k >> 31) == 0
    u = jnp.where(neg, ~k, k & jnp.uint32(0x7FFFFFFF))
    return lax.bitcast_convert_type(u, jnp.float32)


def _count_less(keys_sorted: jax.Array, lo: jax.Array, hi: jax.Array,
                cand: jax.Array, n_local: int) -> jax.Array:
    """Per-segment count of ``keys < cand`` in a flat locally sorted array.

    ``keys_sorted: uint32[n_local]`` sorted within segments ``[lo_j, hi_j)``;
    ``cand: uint32[n_segs]``.  Vectorized binary search: ~log2(n_local)
    rounds of one small gather each (n_segs indices), instead of a
    per-point scan.
    """
    steps = max(1, int(np.ceil(np.log2(max(n_local, 2)))) + 1)
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)

    def body(_, lh):
        lo, hi = lh
        # fixed-trip-count bisection MUST freeze converged lanes: once
        # lo == hi, `mid` points at the NEXT segment's first key (the flat
        # array is sorted only within segments), and an unguarded step
        # would walk past the boundary and overcount
        active = lo < hi
        mid = (lo + hi) // 2
        v = jnp.take(keys_sorted, jnp.clip(mid, 0, n_local - 1))
        below = v < cand
        lo = jnp.where(active & below, mid + 1, lo)
        hi = jnp.where(active & ~below, mid, hi)
        return lo, hi

    lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
    return lo  # == first index with key >= cand


def _select_rank(keys_sorted, seg_lo, seg_hi, ranks, n_local):
    """Distributed order statistic: value of global rank ``ranks[j]`` within
    segment ``j`` (0-indexed), via 32-round radix selection with psum'd
    counts.  Returns ``uint32[n_segs]`` keys."""

    def bit_step(i, prefix):
        bit = jnp.uint32(1) << (31 - i)
        cand = prefix | bit
        local = _count_less(keys_sorted, seg_lo, seg_hi, cand, n_local) - seg_lo
        cnt = lax.psum(local, DATA_AXIS)
        return jnp.where(cnt <= ranks, cand, prefix)

    return lax.fori_loop(0, 32, bit_step, jnp.zeros_like(ranks, jnp.uint32))


@functools.partial(jax.jit, static_argnames=("mesh", "plan"))
def _dp_build_tree(mesh, plan: TreePlan, x, r):
    """One tree's data-parallel build.  ``x: f32[N, D]`` sharded over rows;
    ``r: f32[depth, D]`` replicated.  Returns (thr, mgl, mgh ``[L, S_max]``
    replicated; leaf codes ``int32[N]`` sharded)."""
    nl = plan.n_levels
    smax = max(lp.n_segs for lp in plan.levels) if nl else 1

    # per-level static constants: global ranks of (mgl, thr, mgh) within
    # each segment, global segment start/size (for quotas), padded to smax
    seg_start = np.zeros((nl, smax), np.int32)
    seg_size = np.zeros((nl, smax), np.int32)
    ranks3 = np.zeros((nl, 3, smax), np.int32)
    for l, lp in enumerate(plan.levels):
        ns = lp.n_segs
        seg_start[l, :ns] = lp.seg_start
        seg_size[l, :ns] = lp.seg_size
        ranks3[l, 0, :ns] = lp.mgl_pos - lp.seg_start
        ranks3[l, 1, :ns] = lp.thr_pos - lp.seg_start
        ranks3[l, 2, :ns] = lp.mgr_pos - lp.seg_start
    # child encodings per level (padded): enc >= 0 split-index else leaf
    child = np.zeros((nl, smax, 2), np.int32)
    for l, lp in enumerate(plan.levels):
        child[l, : lp.n_segs] = lp.child_enc

    def block(x_l, r_l):
        n_local = x_l.shape[0]
        my_shard = lax.axis_index(DATA_AXIS)
        n_shards = lax.psum(1, DATA_AXIS)
        proj = jnp.matmul(x_l, r_l[:nl].T,
                          precision=lax.Precision.HIGHEST)  # [n_local, L]
        # frontier code of each local point: split-seg index at level l
        code = jnp.zeros(n_local, jnp.int32)
        # final leaf id of each local point (-1 while still descending)
        leaf = jnp.full(n_local, -1, jnp.int32)
        thr_out, mgl_out, mgh_out = [], [], []
        order0 = jnp.arange(n_local, dtype=jnp.int32)

        for l in range(nl):
            ns = plan.levels[l].n_segs
            p = proj[:, l]
            key = _f32_to_key(p)
            live = leaf < 0
            # dead points park in a sentinel segment after the live ones
            code_l = jnp.where(live, code, ns)
            # local sort by (segment, key, original order)
            _, key_s, idx_s = lax.sort(
                (code_l, key, order0), num_keys=2, is_stable=True
            )
            # local segment boundaries in the sorted layout
            jj = jnp.arange(smax, dtype=jnp.int32)
            code_sorted = jnp.sort(code_l)
            lo = jnp.searchsorted(code_sorted, jj, side="left").astype(jnp.int32)
            hi = jnp.searchsorted(code_sorted, jj, side="right").astype(jnp.int32)

            vals = []
            for t3 in range(3):
                rk = jnp.asarray(ranks3[l, t3])
                sel = _select_rank(key_s, lo, hi, rk, n_local)
                vals.append(_key_to_f32(sel))
            mgl_v, thr_v, mgh_v = vals
            thr_key = _f32_to_key(thr_v)
            mgl_out.append(mgl_v)
            thr_out.append(thr_v)
            mgh_out.append(mgh_v)

            # ---- stable split: strictly-below go left; equals split by
            # global stable order up to the left quota -------------------
            nh = jnp.asarray(seg_size[l]) // 2  # left side size
            less_loc = _count_less(key_s, lo, hi, thr_key, n_local) - lo
            leq_loc = (_count_less(key_s, lo, hi, thr_key + jnp.uint32(1),
                                   n_local) - lo)
            eq_loc = leq_loc - less_loc
            less_glob = lax.psum(less_loc, DATA_AXIS)
            eq_all = lax.all_gather(eq_loc, DATA_AXIS)  # [S, smax]
            sh = lax.broadcasted_iota(jnp.int32, eq_all.shape, 0)
            eq_before = jnp.sum(
                jnp.where(sh < my_shard, eq_all, 0), axis=0
            )  # equals in earlier shards
            quota = jnp.clip(nh - less_glob, 0) - eq_before  # my left-equals

            # per-point: rank among my shard's equals (stable local order)
            pk = _f32_to_key(p)
            my_thr = jnp.take(thr_key, jnp.clip(code_l, 0, smax - 1))
            is_eq = (pk == my_thr) & live
            # local stable rank among equals of the same segment: count of
            # earlier local equals in my segment; via sorted layout:
            # position in sorted array minus (lo + less_loc)
            pos_in_sorted = jnp.zeros(n_local, jnp.int32).at[idx_s].set(
                jnp.arange(n_local, dtype=jnp.int32)
            )
            eq_rank = pos_in_sorted - jnp.take(lo + less_loc,
                                               jnp.clip(code_l, 0, smax - 1))
            go_left = (pk < my_thr) | (is_eq & (eq_rank < jnp.take(
                jnp.clip(quota, 0), jnp.clip(code_l, 0, smax - 1))))

            side = jnp.where(go_left, 0, 1)
            ch = jnp.asarray(child[l])  # [smax, 2]
            nxt = ch[jnp.clip(code_l, 0, smax - 1), side]
            code = jnp.where(live, jnp.where(nxt >= 0, nxt, 0), code)
            leaf = jnp.where(live & (nxt < 0), -(nxt + 1), leaf)

        thr = jnp.stack(thr_out) if nl else jnp.zeros((0, 1), jnp.float32)
        mgl = jnp.stack(mgl_out) if nl else jnp.zeros((0, 1), jnp.float32)
        mgh = jnp.stack(mgh_out) if nl else jnp.zeros((0, 1), jnp.float32)
        return thr, mgl, mgh, leaf

    return jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P(DATA_AXIS)),
        check_vma=False,
    )(x, r)


def forest_batch_data_parallel(
    seed, max_depth: int, min_leaf: int, n_trees: int, pnz: float, data,
    mesh: Optional[Mesh] = None, payloads: Optional[Sequence] = None,
) -> RPForest:
    """Batch-build with the dataset sharded over points.

    The projections and median selection run sharded (each device touches
    only its rows); the finalize step gathers the per-point leaf codes
    (int32[N] per tree -- tiny) to assemble the standard leaf-sorted
    permutation, and returns an ordinary :class:`RPForest`.  ``N`` must be
    divisible by the shard count.
    """
    if mesh is None:
        mesh = data_mesh()
    n_shards = mesh.shape[DATA_AXIS]
    x = jnp.asarray(data, dtype=jnp.float32)
    n, dim = x.shape
    if n % n_shards:
        raise ValueError(f"N={n} not divisible by {n_shards} data shards")
    plan = make_plan(n, max_depth, min_leaf)
    r = rgen.sample_projections(seed, n_trees, max_depth, dim, pnz)
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))

    thrs, mgls, mghs, perms = [], [], [], []
    for t in range(n_trees):
        if plan.n_levels == 0:  # single-leaf tree
            thrs.append(np.zeros((0, 1), np.float32))
            mgls.append(np.zeros((0, 1), np.float32))
            mghs.append(np.zeros((0, 1), np.float32))
            perms.append(np.arange(n, dtype=np.int32))
            continue
        thr, mgl, mgh, leaf = _dp_build_tree(mesh, plan, xs, r[t])
        leaf_np = np.asarray(leaf)
        # stable sort by (leaf, original index) -> the standard permutation
        order = np.argsort(leaf_np, kind="stable")
        perms.append(order.astype(np.int32))
        thrs.append(np.asarray(thr))
        mgls.append(np.asarray(mgl))
        mghs.append(np.asarray(mgh))

    arrays = TreeArrays(
        r=r,
        thr=jnp.asarray(np.stack(thrs)),
        mgl=jnp.asarray(np.stack(mgls)),
        mgh=jnp.asarray(np.stack(mghs)),
        perm=jnp.asarray(np.stack(perms)),
    )
    sq = jnp.sum(x * x, axis=-1)
    cfg = ForestConfig(n_trees=n_trees, max_depth=max_depth,
                       min_leaf=min_leaf, proj_nz_density=pnz, dim=dim)
    return RPForest(plan, arrays, x, sq, cfg, payloads=payloads, seed=seed)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "metric"))
def _bf_sharded(mesh, x, sq, q, k, metric):
    from ..models.forest import _brute_force

    def block(x_l, sq_l, q_l):
        n_l = x_l.shape[0]
        d_l, i_l = _brute_force(x_l, sq_l, q_l, k, metric)
        i_l = jnp.where(i_l >= 0,
                        i_l + lax.axis_index(DATA_AXIS) * n_l, -1)
        d_all = lax.all_gather(d_l, DATA_AXIS)   # [S, B, k]
        i_all = lax.all_gather(i_l, DATA_AXIS)
        s_ = d_all.shape[0]
        d_all = jnp.moveaxis(d_all, 0, 1).reshape(d_l.shape[0], s_ * k)
        i_all = jnp.moveaxis(i_all, 0, 1).reshape(i_l.shape[0], s_ * k)
        dd, ii = lax.sort((d_all, i_all), num_keys=1)
        return dd[:, :k], ii[:, :k]

    return jax.shard_map(
        block, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(x, sq, q)


def brute_force_knn_sharded(data, q, k: int, metric: str = "l2",
                            mesh: Optional[Mesh] = None):
    """Exact kNN with the dataset sharded over points: each shard scans its
    rows (streaming chunked GEMM + running top-k), local ids are offset to
    global, and an all_gather + re-top-k merges -- exact ground truth for
    datasets beyond one chip's HBM (the eval story for sharded builds).
    ``len(data)`` must divide the shard count."""
    if mesh is None:
        mesh = data_mesh()
    n_sh = mesh.shape[DATA_AXIS]
    x = jnp.asarray(data, dtype=jnp.float32)
    if x.shape[0] % n_sh:
        raise ValueError(f"N={x.shape[0]} not divisible by {n_sh} shards")
    xs = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))
    sq = jnp.sum(xs * xs, axis=-1)
    qb = jnp.asarray(q, dtype=jnp.float32)
    if qb.ndim == 1:
        qb = qb[None]
    qb = jax.device_put(qb, NamedSharding(mesh, P()))
    return _bf_sharded(mesh, xs, sq, qb, int(k), metric)
