"""Headline benchmark: batched forest-kNN throughput, TPU engine vs a CPU
re-execution of the reference algorithm's semantics.

The reference publishes no numbers (BASELINE.md), so the baseline is
self-generated: the numpy oracle in :mod:`rptree_tpu.reference` runs the
same forest (same trees, same candidate semantics) query-by-query, the way
the reference library does (``src/Data/RPTree.hs:159-176`` is
single-query).  ``vs_baseline`` is the TPU-QPS / oracle-QPS ratio; the
north-star target is >= 100x (BASELINE.json).

Prints ONE JSON line:
  {"metric": "knn_qps", "value": <tpu qps>, "unit": "queries/s",
   "vs_baseline": <ratio>, ...extras}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import rptree_tpu as rt
    from rptree_tpu import reference as ref

    # SIFT-shaped workload (BASELINE.json configs[3] scaled to bench time):
    # n=100k 128-d dense vectors, 8 trees, auto depth, k=10.
    N, DIM, T, K = 100_000, 128, 8, 10
    MIN_LEAF = 64
    BUDGET = 4     # frontier width; forks are rare on this workload, so
    #                this is recall-equivalent to the reference's unbounded
    #                descent (verified: equal recall at budget 4..32)
    PROBES = 12    # leaf buckets reranked per query (live leaves ~T+forks)
    B = 32768      # total query batch (throughput measurement; amortizes
    #                the tunneled backend's ~25ms host round-trip)
    CHUNK = 4096   # queries per device call (bounds rerank memory ~1.2GB)
    SEED = 20260816

    rng = np.random.default_rng(SEED)
    x = rng.normal(size=(N, DIM)).astype(np.float32)
    q = (x[rng.integers(0, N, size=B)]
         + 0.1 * rng.normal(size=(B, DIM)).astype(np.float32))

    cfg = rt.rp_tree_cfg(MIN_LEAF, N, DIM)

    # ---- TPU build -------------------------------------------------------
    t0 = time.perf_counter()
    f = rt.forest_batch(SEED, cfg.max_depth, MIN_LEAF, T,
                        cfg.proj_nz_density, x)
    np.asarray(f.arrays.perm)  # host fetch: forces real completion
    build_cold_s = time.perf_counter() - t0  # includes one-time jit compile

    t0 = time.perf_counter()
    f2 = rt.forest_batch(SEED + 1, cfg.max_depth, MIN_LEAF, T,
                         cfg.proj_nz_density, x)
    np.asarray(f2.arrays.perm)
    build_s = time.perf_counter() - t0  # steady-state (compile cached)
    del f2

    # serving-path layout: leaf blocks in bf16 (f32 accumulation); recall
    # is reported below and must beat the baseline's -- the reference
    # algorithm itself runs in f64, so precision knobs are part of the
    # speed/quality surface, not hidden
    f.pack_leaves(dtype=jnp.bfloat16)

    qd = jnp.asarray(q)

    def sweep():
        return [f.knn(qd[s:s + CHUNK], K, budget=BUDGET, probes=PROBES,
                      precision="default")
                for s in range(0, B, CHUNK)]

    def sweep_timed():
        # single scalar fetch at the end: one host round-trip times the
        # whole batch (per-chunk fetches through the tunneled TPU backend
        # would serialize ~25ms of RTT each into the measurement)
        outs = sweep()
        total = sum(jnp.sum(jnp.clip(i, 0, None)) for _, i in outs)
        return int(total)

    sweep_timed()  # compile + warm
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        sweep_timed()
    dt = (time.perf_counter() - t0) / reps
    qps = B / dt

    # quality: recall@10 of the returned neighbours vs exact top-k
    outs = sweep()
    got = np.concatenate([np.asarray(i) for _, i in outs], axis=0)
    exact = np.concatenate([
        np.asarray(f.brute_force_knn(qd[s:s + CHUNK], K)[1])
        for s in range(0, B, CHUNK)
    ], axis=0)
    recall = float(np.mean([
        len(set(got[b].tolist()) & set(exact[b].tolist())) / K
        for b in range(B)
    ]))

    # ---- CPU reference-semantics baseline (per-query, as the reference
    # runs: one query at a time over the pointer forest) ------------------
    r_np = np.asarray(f.arrays.r, dtype=np.float64)
    t0 = time.perf_counter()
    ref_forest = ref.ref_forest_batch(x, r_np, cfg.max_depth, MIN_LEAF)
    ref_build_s = time.perf_counter() - t0

    # best-of-3 for the oracle: the single-threaded numpy loop is
    # sensitive to machine load, and taking its fastest run makes the
    # reported ratio conservative
    nq_ref = 64
    ref_recalls = []
    ref_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ref_recalls = []
        for b in range(nq_ref):
            _, rid = ref.ref_knn(ref_forest, x, q[b], K, dedup=True)
            ref_recalls.append(
                len(set(rid.tolist()) & set(exact[b].tolist())) / K
            )
        ref_dt = min(ref_dt, time.perf_counter() - t0)
    ref_qps = nq_ref / ref_dt

    print(json.dumps({
        "metric": "knn_qps",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / ref_qps, 1),
        "recall_at_10": round(recall, 4),
        "baseline_recall_at_10": round(float(np.mean(ref_recalls)), 4),
        "baseline_qps": round(ref_qps, 1),
        "build_s": round(build_s, 3),
        "build_cold_s": round(build_cold_s, 3),
        "baseline_build_s": round(ref_build_s, 3),
        "config": {"n": N, "dim": DIM, "trees": T, "k": K,
                   "max_depth": cfg.max_depth, "min_leaf": MIN_LEAF,
                   "budget": BUDGET, "probes": PROBES, "batch": B,
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
