"""End-to-end ANN pipeline: ingest -> build -> tune -> serve -> evaluate.

The production recipe for an fvecs-format benchmark dataset (SIFT1M /
GIST1M layout: base vectors, query vectors, ivecs ground truth).  Without
arguments it runs on a self-generated synthetic dataset so the script
doubles as an executable smoke test:

    python examples/sift_pipeline.py [base.fvecs query.fvecs gt.ivecs]

Stages:
  1. ingest  -- native chunked readers (rptree_tpu.ingest, C++ via ctypes)
                streamed into the builder (overlapped host->device copies);
  2. build   -- auto-config from the reference's closed-form heuristic;
  3. tune    -- cheapest (budget, probes) meeting the recall target,
                measured against the exact answer on held-out queries;
  4. serve   -- pack_leaves(bf16) + drop_dataset serving mode;
  5. evaluate-- recall@k against the ground truth (file or brute force).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(base=None, query=None, gt=None, n_trees=8, k=10,
         target_recall=0.5):
    import jax.numpy as jnp

    import rptree_tpu as rp

    if base is None:
        import os

        n_syn = int(os.environ.get("RPTREE_EXAMPLE_N", 20_000))
        print(f"no dataset given; generating synthetic (n={n_syn}, d=64)")
        rng = np.random.default_rng(7)
        xb = rng.normal(size=(n_syn, 64)).astype(np.float32)
        xq = (xb[rng.integers(0, len(xb), 256)]
              + 0.05 * rng.normal(size=(256, 64)).astype(np.float32))
        gt_ids = None
        source = iter(np.split(xb, 20))
        n, dim = xb.shape
    else:
        n, dim = rp.ingest.fvecs_meta(base)
        xq = rp.ingest.read_fvecs(query)
        gt_ids = rp.ingest.read_ivecs(gt)[:, :k] if gt else None
        source = rp.ingest.fvecs_source(base, chunk_size=100_000)

    cfg = rp.rp_tree_cfg(min_leaf=64, n=n, dim=dim)
    print(f"config: depth={cfg.max_depth} pnz={cfg.proj_nz_density:.3f}")

    t0 = time.perf_counter()
    f = rp.forest(seed=42, max_depth=cfg.max_depth, min_leaf=64,
                  n_trees=n_trees, chunk_size=cfg.chunk_size,
                  pnz=cfg.proj_nz_density, dim=dim, source=source)
    np.asarray(f.arrays.perm)
    print(f"built {f!r} in {time.perf_counter() - t0:.1f}s")

    f.pack_leaves(dtype=jnp.bfloat16)
    best = rp.tune(f, xq[: min(128, len(xq))], k=k,
                   target_recall=target_recall,
                   budgets=(2, 4, 8), probes_per_tree=(1.0, 1.5, 2.0))
    print(f"tuned: budget={best['budget']} probes={best['probes']} "
          f"recall={best['recall']:.3f} (target met: {best['met']})")

    if gt_ids is None:
        _, gt_ids = f.brute_force_knn(xq, k)
        gt_ids = np.asarray(gt_ids)

    t0 = time.perf_counter()
    if best.get("scan"):
        # tune() found the exact MXU scan to be the cheapest config
        # meeting the target (small/hard datasets) -- serve with it
        print("serving via the exact scan (tune() picked it)")
        _, ids = f.brute_force_knn(xq, k, precision="fastest")
    else:
        f.drop_dataset()  # serve-only: leaf blocks are the remaining copy
        _, ids = f.knn(xq, k, budget=best["budget"], probes=best["probes"],
                       precision="default")
    ids = np.asarray(ids)
    dt = time.perf_counter() - t0
    recall = float(np.mean([
        len(set(ids[b].tolist()) & set(gt_ids[b].tolist())) / k
        for b in range(len(xq))
    ]))
    print(f"served {len(xq)} queries in {dt * 1e3:.1f}ms "
          f"({len(xq) / dt:.0f} QPS incl. host round-trip); "
          f"recall@{k}={recall:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:4])
