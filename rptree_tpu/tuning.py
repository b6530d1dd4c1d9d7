"""Query-configuration auto-tuning.

The reference exposes raw knobs and a closed-form construction heuristic
(``rpTreeCfg``, Conduit.hs:132-141) but no way to pick query-time
parameters for a quality target.  :func:`tune` sweeps the (budget, probes)
surface on a validation query set against the exact brute-force answer and
returns the cheapest configuration whose measured recall@k clears the
target -- "cheapest" by reranked-candidate volume, the quantity the
serving cost is proportional to.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = ["tune"]


def tune(forest, queries, k: int = 10, target_recall: float = 0.9,
         budgets: Sequence[int] = (1, 2, 4, 8, 16, 32),
         probes_per_tree: Sequence[float] = (1.0, 1.5, 2.0, 3.0, 4.0),
         metric: str = "l2", precision: str = "highest") -> dict:
    """Pick the cheapest (budget, probes) meeting ``target_recall``.

    Returns ``{"budget", "probes", "recall", "cost", "frontier"}`` where
    ``frontier`` lists every measured point (for plotting recall/cost
    curves).  If no configuration reaches the target, the best-recall
    configuration is returned with ``"met": False``.

    The exact scan is always a candidate: when it is the cheapest config
    meeting the target the winner has ``"scan": True`` and
    ``budget``/``probes`` are ``None`` -- serve those queries with
    ``forest.brute_force_knn(..., precision="fastest")`` instead of
    ``knn``.  ALWAYS check ``"scan"`` before feeding the knobs back into
    ``knn`` (passing ``budget=None`` would silently use the defaults).
    """
    from .models.forest import _as_dense_queries

    qb = np.asarray(_as_dense_queries(queries, forest.dim))
    _, exact = forest.brute_force_knn(qb, k)
    exact = np.asarray(exact)
    nq = qb.shape[0]

    lmax = max(forest.plan.max_leaf_len, 1)
    results = []
    for budget in sorted(set(int(b) for b in budgets)):
        budget = max(1, min(budget, forest.plan.n_leaves))
        for ppt in sorted(set(probes_per_tree)):
            probes = max(1, min(int(round(ppt * forest.n_trees)),
                                forest.n_trees * budget))
            _, ids = forest.knn(qb, k, metric=metric, budget=budget,
                                probes=probes, precision=precision)
            ids = np.asarray(ids)
            recall = float(np.mean([
                len(set(ids[b].tolist()) & set(exact[b].tolist())) / k
                for b in range(nq)
            ]))
            results.append({
                "budget": budget, "probes": probes, "recall": recall,
                "cost": probes * lmax,  # reranked candidate slots per query
            })

    # the exact MXU scan is always a candidate operating point: its cost
    # is n reranked slots/query and its recall is 1.0 by definition.  On
    # hard (e.g. iid high-dim) data the forest's recall saturates below
    # high targets while probes * lmax approaches n, so the scan can be
    # the CHEAPEST config meeting the target -- report it honestly.
    results.append({"budget": None, "probes": None, "recall": 1.0,
                    "cost": forest.n_points, "scan": True})

    results.sort(key=lambda r: (r["cost"], -r["recall"]))
    meeting = [r for r in results if r["recall"] >= target_recall]
    if meeting:
        best = dict(meeting[0])
        best["met"] = True
    else:
        best = dict(max(results, key=lambda r: r["recall"]))
        best["met"] = False
    best["frontier"] = results
    return best
