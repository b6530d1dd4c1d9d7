"""Benchmark harness (the reference's ``bench/time/Main.hs``).

Reproduces the reference time benchmark's structure:

* a grid of :class:`~rptree_tpu.config.BenchConfig` experiment descriptors
  (``bench/time/Main.hs:42-50`` -- the shipped grid is a single point);
* per config: build a forest over a binary sparse-Gaussian-mixture stream
  (``binMixFQBench``, ``bench/time/Main.hs:54-84`` over ``datS``,
  ``Internal/Testing.hs:38-44``), measure mean recall@10 over the query
  points, and wall-clock build/query times with a numerically stable
  running mean (the vendored benchpress-style ``benchmark`` harness,
  ``bench/time/Main.hs:175-230``);
* results printed as one dict per config (the reference ``print``s to
  stdout, ``bench/time/Main.hs:60-62``).

The TPU additions: batched-query QPS (the reference queries one point at a
time) and optional mesh sharding via the config's ``n_tree_shards`` /
``n_query_shards`` fields.

Run: ``python -m rptree_tpu.benchmarks``.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Tuple

import numpy as np

from .config import BenchConfig
from .models.forest import RPForest, forest_batch
from .utils import gen as rgen

__all__ = ["benchmark", "run_bench", "bench_grid", "DEFAULT_GRID"]


def benchmark(fn: Callable[[], object], reps: int = 2) -> Tuple[float, object]:
    """Mean wall seconds of ``fn`` over ``reps`` runs, running-mean
    accumulation (reference ``benchmark``/``mean``,
    ``bench/time/Main.hs:175-230``; wall clock instead of ``getCPUTime``
    because device work is asynchronous to the host CPU)."""
    mean = 0.0
    out = None
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        mean += (dt - mean) / i
    return mean, out


def _fetch(x) -> np.ndarray:
    """Force completion via host fetch (block_until_ready can return early
    through tunneled TPU backends)."""
    return np.asarray(x)


def run_bench(cfg: BenchConfig, seed: int = 1234, data_nz: float = 0.8,
              reps: int = 2, mesh=None) -> dict:
    """Run one experiment: build + recall@10 + QPS (``binMixFQBench``,
    bench/time/Main.hs:54-84).  ``data_nz`` is the data's nonzero density
    (the reference grid uses 0.8)."""
    gen = lambda key, n: rgen.normal_sparse2(  # noqa: E731
        key, n, cfg.vector_dim, data_nz
    )
    x = np.asarray(rgen.data_batch(seed, cfg.data_size, gen), np.float32)
    q = np.asarray(rgen.data_batch(seed + 1, cfg.num_query_points, gen),
                   np.float32)

    def build() -> RPForest:
        f = forest_batch(seed, cfg.max_depth, cfg.min_leaf, cfg.num_trees,
                         cfg.nz_density, x)
        if mesh is not None or cfg.n_tree_shards * cfg.n_query_shards > 1:
            from .parallel import distribute, forest_mesh

            m = mesh if mesh is not None else forest_mesh(
                cfg.n_tree_shards, cfg.n_query_shards
            )
            f = distribute(f, m)
        _fetch(f.arrays.perm)
        return f

    t_build, f = benchmark(build, reps=1)

    k = 10

    def queries():
        out = []
        for s in range(0, cfg.num_query_points, cfg.batch_size):
            out.append(f.knn(q[s:s + cfg.batch_size], k))
        return [(_fetch(d), _fetch(i)) for d, i in out]

    queries()  # compile + warm
    t_query, outs = benchmark(queries, reps=reps)

    recall = float(np.mean(_fetch(f.recall_with(q, k))))
    return {
        "description": cfg.description,
        "recall_at_10": round(recall, 4),
        "build_s": round(t_build, 4),
        "query_s": round(t_query, 4),
        "qps": round(cfg.num_query_points / t_query, 1),
        "config": cfg,
    }


# the reference's shipped grid: one point (bench/time/Main.hs:42-50)
DEFAULT_GRID: List[BenchConfig] = [
    BenchConfig(
        description="binary sparse-Gaussian mixture",
        max_depth=5, min_leaf=10, num_trees=3, chunk_size=100,
        nz_density=0.2, vector_dim=1000, data_size=1000,
        num_query_points=10, batch_size=10,
    ),
]


def bench_grid(grid: Optional[List[BenchConfig]] = None, seed: int = 1234,
               reps: int = 2) -> List[dict]:
    """Run a grid of configs, printing one result dict per line (the
    reference's main, bench/time/Main.hs:54-66)."""
    results = []
    for cfg in grid if grid is not None else DEFAULT_GRID:
        r = run_bench(cfg, seed=seed, reps=reps)
        print({k: v for k, v in r.items() if k != "config"}, flush=True)
        results.append(r)
    return results


if __name__ == "__main__":
    bench_grid()
