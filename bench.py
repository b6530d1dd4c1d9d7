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
    BUDGET = 2     # frontier width; forks are rare on this workload, so
    #                this is recall-equivalent to the reference's unbounded
    #                descent (verified round-5 on 32768q: recall@10
    #                0.12318 at budget 2 AND 4 -- bit-identical -- vs
    #                0.12298 at the fork-free budget=1; traversal is the
    #                binding stage at iid (roofline, BASELINE.md), so
    #                budget 4 -> 2 moved e2e 45.1 -> 30.4 ms per 32768q
    #                (727k -> 1079k QPS device) for free; budget=1 would
    #                reach 1788k at the -0.0002 recall concession the
    #                bench quality pins refuse)
    PROBES = 10    # leaf buckets reranked per query.  Round-5 sweep on
    #                32768q: probes 10 and 12 return BIT-IDENTICAL recall
    #                (0.12318 -- slots 11-12 are duplicate/masked buckets;
    #                needed tiles don't even change) while the narrower
    #                selection width serves 27.6 vs 30.4 ms; probes=8
    #                reaches 23.3 ms (1409k device) at -0.0003 recall,
    #                declined by the quality pins.  probes=9 LOSES to 10
    #                (9*64=576-wide tail is not lane-tiled).
    B = 524288     # total query batch (throughput measurement): the wall
    #                is dispatch-RPC-bound (~40ms of host work per call
    #                through the tunnel, pipelining does not help --
    #                examples/serving_loop.py), so serve a giant batch as
    #                chunks inside ONE dispatch (B=262144 measured 540.6k
    #                vs 131072's 520.6k wall; chunk=65536 LOSES at iid --
    #                486k -- group density is already fetch-light on int8;
    #                B=524288 amortizes the residual ~20ms RTT further)
    BR = 32768     # recall-probe prefix (plenty for a stable recall@10)
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

    # serving-path layout: int8 leaf blocks (per-leaf scales, exact stored
    # norms, int32 MXU accumulation) -- halves the block-fetch bandwidth
    # vs bf16 at identical recall@10, and the GROUPED int8 tile kernel
    # (int8 x int8 -> int32 MXU dots dequantized against exact stored
    # norms) beats the per-pair int8 path 600k vs 448k QPS device-side at
    # this config (BASELINE.md round-4 continuation; id-overlap 1.0,
    # identical recall).  slack=8 lands the slot axis on the int8 sublane
    # tile (56 -> 64) the kernel needs; the slack slots are ordinary
    # maskable padding.  The reference algorithm itself runs in f64;
    # precision knobs are part of the speed/quality surface, not hidden,
    # and recall is reported below and must beat the baseline's.
    f.pack_leaves(dtype=jnp.int8, slack=8)

    qd = jnp.asarray(q)
    GCH = 32768  # grouped serving chunk (per-chunk tiles ~14k at iid)

    def sweep(check=True):
        # one-dispatch grouped batch (lax.map over chunks): queries
        # probing the same leaf block share one fetch + one MXU matmul;
        # check=False is the steady-state mode (capacity cached by the
        # warm-up call).  selection="kernel" is the fused streaming
        # top-k tail (ops/topk_kernel): one VMEM pass extracts the k
        # smallest distinct ids instead of the ~55-pass payload sort --
        # sort 57.9 -> kernel 44.7 ms per 32768q at this config, ids
        # verified equal on device (BASELINE.md round-4 continuation)
        return f.knn_grouped(qd, K, budget=BUDGET, probes=PROBES,
                             precision="default", tile_m=8, chunk=GCH,
                             check=check, selection="kernel")

    def sweep_timed():
        # single scalar fetch at the end: one host round-trip times the
        # whole batch (per-chunk fetches through the tunneled TPU backend
        # would serialize ~25ms of RTT each into the measurement)
        _, ids = sweep(check=False)
        return int(jnp.sum(jnp.clip(ids, 0, None)))

    np.asarray(sweep(check=True)[1][:8])  # capacity + compile + warm
    sweep_timed()  # warm the timed expression too
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        sweep_timed()
    dt = (time.perf_counter() - t0) / reps
    qps = B / dt

    # device-side QPS (marginal fori_loop; utils/profiling): the wall
    # number above includes this environment's ~25ms tunneled dispatch
    # RTT, which understates the chip -- record both.  The packed arrays
    # are passed as ARGUMENTS (closing over them embeds GBs of constants
    # in the lowered program and stalls the remote compiler for many
    # minutes; CLAUDE.md)
    from rptree_tpu.models.forest import _knn_grouped, _knn_packed_many
    from rptree_tpu.utils.profiling import device_time

    xl_b, sl_b, il_b = f._packed
    sc_b = f._block_scale
    lens_b = f._lens_global()
    ntb = f._grouped_nt[(B, PROBES, 8, 1, GCH)]

    def dev_step(qx, xl, sl, il, ln, sc):
        return _knn_grouped(f.plan, f.arrays, xl, sl, il, ln, qx, K,
                            BUDGET, PROBES, "l2", True, "default", 8,
                            ntb, 2048, block_scale=sc,
                            selection="kernel")[0]

    qps_device = GCH / max(
        device_time(dev_step, qd[:GCH], xl_b, sl_b, il_b, lens_b, sc_b,
                    reps=5), 1e-9)

    # quality: recall@10 of the returned neighbours vs exact top-k
    # (on the first BR queries -- ample for a stable recall statistic)
    got = np.asarray(sweep(check=False)[1])[:BR]
    exact = np.concatenate([
        np.asarray(f.brute_force_knn(qd[s:s + CHUNK], K)[1])
        for s in range(0, BR, CHUNK)
    ], axis=0)
    recall = float(np.mean([
        len(set(got[b].tolist()) & set(exact[b].tolist())) / K
        for b in range(BR)
    ]))

    # ---- CPU reference-semantics baseline (per-query, as the reference
    # runs: one query at a time over the pointer forest) ------------------
    r_np = np.asarray(f.arrays.r, dtype=np.float64)
    t0 = time.perf_counter()
    ref_forest = ref.ref_forest_batch(x, r_np, cfg.max_depth, MIN_LEAF)
    ref_build_s = time.perf_counter() - t0

    # CPU-time-based oracle measurement: the single-threaded numpy loop's
    # wall clock varies ~3x with machine load; process_time is stable and
    # is exactly what the reference's own bench harness measures
    # (getCPUTime, bench/time/Main.hs:188-193)
    nq_ref = 64
    ref_recalls = []
    t0 = time.process_time()
    for b in range(nq_ref):
        _, rid = ref.ref_knn(ref_forest, x, q[b], K, dedup=True)
        ref_recalls.append(
            len(set(rid.tolist()) & set(exact[b].tolist())) / K
        )
    ref_qps = nq_ref / (time.process_time() - t0)
    del ref_forest

    # ---- high-recall operating point (recall@10 >= 0.9), n=100k ---------
    # On iid-Gaussian 128-d data the RP forest's recall saturates per
    # forest shape (forks are structural), so the engine's cheapest
    # >=0.9 config is the exact MXU scan (recall 1.0); the best measured
    # tree point is reported alongside for the frontier.  tune()
    # (rptree_tpu.tuning) automates this sweep offline; the winning
    # configs are pinned here to keep the driver bench's compile count
    # bounded.
    TARGET = 0.9
    QT, MLT, BT, PT = 32, 4096, 2, 32  # quality forest: T=32, min_leaf=4096
    cfg_q = rt.rp_tree_cfg(MLT, N, DIM)
    fq = rt.forest_batch(SEED, cfg_q.max_depth, MLT, QT,
                         cfg_q.proj_nz_density, x)
    fq.pack_leaves(dtype=jnp.bfloat16)
    lmax_q = fq.plan.max_leaf_len
    cbq = 1 << int(np.log2(max(32, (1 << 21) // max(PT * lmax_q, 1))))
    ids_q = np.concatenate(
        [np.asarray(fq.knn(qd[s:s + cbq], K, budget=BT, probes=PT,
                           precision="default")[1])
         for s in range(0, 1024, cbq)], axis=0)
    recall_tree = float(np.mean([
        len(set(ids_q[b].tolist()) & set(exact[b].tolist())) / K
        for b in range(1024)
    ]))

    BQ = 8192  # enough to amortize dispatch at the heavy tree config

    def sweep_q():
        _, ids = fq.knn_batched(qd[:BQ], K, budget=BT, probes=PT,
                                precision="default", chunk=cbq)
        return int(jnp.sum(ids))

    sweep_q()
    t0 = time.perf_counter()
    for _ in range(2):
        sweep_q()
    qps_tree = BQ / ((time.perf_counter() - t0) / 2)
    del fq

    # exact scan on the MXU (the engine's own brute_force_knn),
    # one dispatch for the whole batch
    def sweep_bf():
        _, ids = f.brute_force_knn(qd, K, precision="fastest",
                                   query_chunk=2048)
        return int(jnp.sum(ids))

    sweep_bf()
    t0 = time.perf_counter()
    for _ in range(3):
        sweep_bf()
    qps_scan = B / ((time.perf_counter() - t0) / 3)
    ids_scan = np.concatenate(
        [np.asarray(f.brute_force_knn(qd[s:s + 2048], K,
                                      precision="fastest")[1])
         for s in range(0, 2048, 2048)], axis=0)
    recall_scan = float(np.mean([
        len(set(ids_scan[b].tolist()) & set(exact[b].tolist())) / K
        for b in range(min(1024, ids_scan.shape[0]))
    ]))
    cands = [(qps_tree, recall_tree), (qps_scan, recall_scan)]
    meeting = [c for c in cands if c[1] >= TARGET] or [max(cands,
                                                           key=lambda c: c[1])]
    qps_at_target, recall_at_target = max(meeting)

    # oracle at matched recall: its cheapest >=0.9 semantics-faithful
    # config is likewise the exact scan (its tree at T=32/ml=4096 scans
    # MORE candidates per query with Python overhead on top).  Give the
    # oracle its best shot: factored-distance GEMV with precomputed
    # squared norms (not the naive (x-q)^2 loop).
    nq_bf = 64
    sq_np = np.sum(x * x, axis=1)
    t0 = time.process_time()
    for b in range(nq_bf):
        d2 = sq_np - 2.0 * (x @ q[b])
        np.argpartition(d2, K)[:K]
    ref_qps_target = nq_bf / (time.process_time() - t0)

    # ---- clustered-data tree-served >= 0.9 point (1M) --------------------
    # Gaussian mixtures are the reference's own bench data family
    # (src/Data/RPTree/Internal/Testing.hs:38-50) and the regime real
    # embedding workloads live in.  Here the TREE path is the winning
    # >= 0.9-recall config -- the index beats the engine's own exact MXU
    # scan (which at 1M measures ~0.90 recall at precision="fastest").
    # Config from examples/clustered_1m.py sweep: min_leaf ~ cluster
    # size so the per-tree leaf covers most of the query's cluster,
    # f32 blocks (int8's cross-term error scrambles near-equidistant
    # in-cluster rankings; BASELINE.md round-3), budget=1.
    # sweep (examples/clustered_1m.py, v5e): ml=128 b=1 p=8 -> 74.8k QPS
    # @ 0.929 (vs scan 40.2k @ 0.899); ml=256 -> 52.1k @ 0.975
    NC, CC, SIGC = 1_000_000, 4_000, 0.15
    MLC, TC, BC, PC = 128, 8, 1, 8
    BCQ = 524288  # giant serving batch: the wall is DISPATCH-bound (~40ms
    #               of host RPC per call through the tunnel; pipelining
    #               does not help -- examples/serving_loop.py), so the
    #               batch runs as lax.map chunks of CHC inside ONE
    #               dispatch.  Measured wall: 351k (B=32k) -> 541k
    #               (B=131k, chunk=32k) -> 624k (chunk=64k) -> 708k
    #               (B=262k, chunk=64k) -> 1193k (B=524k, kernel tail).
    #               64k chunks double the per-chunk probe-group density
    #               (halving block-fetch bytes per query) and fit the
    #               kernel's SMEM tile table since lens_t moved to a VMEM
    #               block; chunk=131072 is a measured NEGATIVE even with
    #               an SMEM-fit explicit capacity (934k wall vs 1093k:
    #               the padded capacity tiles still execute, eating the
    #               density gain -- BASELINE.md round-4 continuation 3).
    CHC = 65536

    @jax.jit
    def _gen_clustered(key):
        kc, ka, kn, kq, kp = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (CC, DIM), jnp.float32)
        assign = jax.random.randint(ka, (NC,), 0, CC)
        xc = (jnp.take(centers, assign, axis=0)
              + SIGC * jax.random.normal(kn, (NC, DIM), jnp.float32))
        qi = jax.random.randint(kq, (BCQ,), 0, NC)
        qc = (jnp.take(xc, qi, axis=0)
              + 0.5 * SIGC * jax.random.normal(kp, (BCQ, DIM),
                                               jnp.float32))
        return xc, qc

    xc, qc = _gen_clustered(jax.random.PRNGKey(SEED))
    float(jnp.sum(qc))  # force generation on device
    sqc = jnp.sum(xc * xc, axis=-1)
    from rptree_tpu.models.forest import _brute_force_many

    gt_c = np.asarray(_brute_force_many(xc, sqc, qc[:1024], K, "l2",
                                        "highest", 256)[1])
    # the clustered build config comes from the TUNER, not a hand pin
    # (VERDICT r3 item 5): sweep min_leaf around n_sub/centers on a
    # subsample; the winner transfers by the measured scale law
    # (min_leaf ~ n/centers, BASELINE.md round-3).  Static-cost ranking
    # (measure=False) keeps the driver's compile count bounded and picks
    # the smallest leaf meeting the target -- the measured QPS-optimal
    # direction at these shapes.
    from rptree_tpu.tuning import tune_build

    SUBC = 131072
    tb = tune_build(np.asarray(xc[:SUBC]), np.asarray(qc[:256]), k=K,
                    target_recall=TARGET, centers_estimate=CC,
                    sample=SUBC, full_n=NC, budgets=(BC,),
                    probes_per_tree=(1.0, 2.0), measure=False)
    PC = int(tb["probes"] or PC)
    # candidate leaf sizes, SMALLEST first (smaller leaves serve faster
    # at equal probes): subsample recall within 0.02 of the target is a
    # candidate -- the boundary is noisy at subsample cluster sizes and
    # recall transfers slightly UP with scale (cluster occupancy grows at
    # fixed leaf/cluster ratio).  Each candidate is VERIFIED at full
    # scale; the first one meeting the target serves (bounded fallback:
    # the tuner's own pick always meets by construction of the sweep).
    def _scale_ml(ml):
        v = max(8, int(ml * NC / SUBC))
        return 1 << (v - 1).bit_length() if v & (v - 1) else v

    # ...plus HALF the tuner's pick: subsample leaves near k under-predict
    # the scaled recall (a 16-row leaf cannot hold 10 neighbours the way
    # its 128-row scaled image can), and the at-scale probe below makes
    # trying the smaller config safe
    cands = sorted({
        _scale_ml(r["min_leaf"]) for r in tb["frontier"]
        if r["recall"] >= TARGET - 0.02 and not r.get("scan")
    } | {int(tb["min_leaf_full"]),
         max(8, int(tb["min_leaf_full"]) // 2)})
    fc = None
    for MLC in cands:
        if fc is not None:
            del fc
        cfg_c = rt.rp_tree_cfg(MLC, NC, DIM)
        fc = rt.forest_batch(SEED, cfg_c.max_depth, MLC, TC,
                             cfg_c.proj_nz_density, xc)
        fc.pack_leaves()

        # serve through the query-grouped block-resident rerank
        # (ops/grouped.py): queries probing the same leaf block share ONE
        # fetch of it and ONE MXU matmul -- on clustered data probe sets
        # overlap heavily by construction, measured ~2x over the per-pair
        # path at this flagship at equal recall (BASELINE.md round-4)
        def sweep_c(check=True):
            # the warm-up call validates + caches the tile capacity; the
            # timed loop passes check=False (steady-state serving mode),
            # skipping the per-batch capacity fetch -- a full host RTT
            # (~25ms) through the tunnel that is dispatch, not engine
            # selection="kernel": fused streaming top-k tail -- device
            # 82.8 -> 54.7 ms per 65536q chunk (791k -> 1.20M QPS), wall
            # 703k -> 1.00M QPS at B=262144; ids set-equal, distances
            # bit-equal (BASELINE.md round-4 continuation)
            _, ids = fc.knn_grouped(qc, K, budget=BC, probes=PC,
                                    precision="default", tile_m=8,
                                    chunk=CHC, check=check,
                                    selection="kernel")
            return ids

        ids_g = np.asarray(sweep_c()[:1024])  # capacity + compile + warm
        recall_probe = float(np.mean([
            len(set(ids_g[b].tolist()) & set(gt_c[b].tolist())) / K
            for b in range(1024)
        ]))
        if recall_probe >= TARGET:
            break

    # warm the timed expression too (its tiny sum/clip ops remote-compile
    # ~1.5s on first use, which would otherwise land inside the clock)
    int(jnp.sum(jnp.clip(sweep_c(check=False)[:, 0], 0, 1)))
    t0 = time.perf_counter()
    for _ in range(2):
        int(jnp.sum(jnp.clip(sweep_c(check=False)[:, 0], 0, 1)))
    tree_qps_c = BCQ / ((time.perf_counter() - t0) / 2)

    xl_c, sl_c, il_c = fc._packed
    lens_c = fc._lens_global()
    # per-CHUNK capacity (5-tuple key for chunked batches)
    ntc = fc._grouped_nt[(BCQ, PC, 8, 1, CHC)]
    from rptree_tpu.models.forest import _knn_grouped

    # device-side: ONE chunk through the unchunked pipeline (same
    # per-chunk program the lax.map runs; the marginal fori_loop method
    # needs the single-call form)
    qc_dev = qc[:CHC]

    def dev_step_c(qx, xl, sl, il, ln):
        return _knn_grouped(fc.plan, fc.arrays, xl, sl, il, ln, qx, K,
                            BC, PC, "l2", True, "default", 8, ntc,
                            2048, selection="kernel")[0]

    tree_qps_c_device = CHC / max(
        device_time(dev_step_c, qc_dev, xl_c, sl_c, il_c, lens_c,
                    reps=4),
        1e-9)
    tree_recall_c = recall_probe  # measured on the serving path above

    # per-pair path (the round-3 serving mode), kept for continuity
    def sweep_c_pp():
        _, ids = fc.knn_batched(qc, K, budget=BC, probes=PC,
                                precision="default", chunk=2048)
        return int(jnp.sum(jnp.clip(ids[:, 0], 0, 1)))

    sweep_c_pp()
    t0 = time.perf_counter()
    for _ in range(2):
        sweep_c_pp()
    tree_qps_c_pp = BCQ / ((time.perf_counter() - t0) / 2)

    def dev_step_c_pp(qx, xl, sl, il):
        return _knn_packed_many(fc.plan, fc.arrays, xl, sl, il, qx, K,
                                BC, PC, "l2", True, "default", False,
                                1, None, None, 2048)[0]

    tree_qps_c_pp_device = BCQ / max(
        device_time(dev_step_c_pp, qc, xl_c, sl_c, il_c, reps=4), 1e-9)

    def sweep_scan_c():
        _, ids = _brute_force_many(xc, sqc, qc, K, "l2", "fastest", 1024)
        return int(jnp.sum(jnp.clip(ids, 0, None)))

    sweep_scan_c()
    t0 = time.perf_counter()
    for _ in range(2):
        sweep_scan_c()
    scan_qps_c = BCQ / ((time.perf_counter() - t0) / 2)
    ids_sc = np.asarray(_brute_force_many(xc, sqc, qc[:1024], K, "l2",
                                          "fastest", 256)[1])
    scan_recall_c = float(np.mean([
        len(set(ids_sc[b].tolist()) & set(gt_c[b].tolist())) / K
        for b in range(1024)
    ]))
    del fc, xc, sqc, qc

    # ---- 1M-point high-recall point --------------------------------------
    N1 = 1_000_000
    x1 = rng.normal(size=(N1, DIM)).astype(np.float32)
    f1 = rt.forest_batch(SEED, 3, N1, 1, 1.0, x1)  # single-leaf: scan host
    q1 = qd[:4096]

    def sweep_bf1():
        _, ids = f1.brute_force_knn(q1, K, precision="fastest",
                                    query_chunk=1024)
        return int(jnp.sum(ids))

    sweep_bf1()
    t0 = time.perf_counter()
    for _ in range(2):
        sweep_bf1()
    qps_scan_1m = 4096 / ((time.perf_counter() - t0) / 2)
    exact_1m = np.asarray(f1.brute_force_knn(q1[:256], K)[1])  # highest
    got_1m = np.asarray(f1.brute_force_knn(q1[:256], K,
                                           precision="fastest")[1])
    recall_1m = float(np.mean([
        len(set(got_1m[b].tolist()) & set(exact_1m[b].tolist())) / K
        for b in range(256)
    ]))
    sq1_np = np.sum(x1 * x1, axis=1)
    t0 = time.process_time()
    for b in range(8):
        d2 = sq1_np - 2.0 * (x1 @ q[b])
        np.argpartition(d2, K)[:K]
    ref_qps_1m = 8 / (time.process_time() - t0)
    del f1, x1

    # ---- corruption sanity gate -----------------------------------------
    # A contended/crashed run can corrupt the persistent compile cache so
    # that a later run silently executes a WRONG program (observed: the
    # headline recall read 0.0146 vs the stable 0.123 while QPS looked
    # normal; clearing the cache restored it).  The CPU oracle recall is
    # immune, so structurally-impossible device-side recalls mean a
    # poisoned executable, not a regression -- raise into the self-heal
    # handler (clears the cache, re-execs once) instead of recording
    # garbage.
    oracle_rec = float(np.mean(ref_recalls))
    checks = [
        ("headline recall vs oracle parity", recall >= 0.5 * oracle_rec),
        ("exact-scan recall@target", recall_at_target >= 0.8),
        ("clustered tree recall", tree_recall_c >= 0.8),
        ("1m fastest-scan recall", recall_1m >= 0.8),
    ]
    bad = [name for name, ok in checks if not ok]
    if bad:
        raise RuntimeError(
            "implausible device-side results (suspected corrupted "
            f"compile cache): {', '.join(bad)}")

    print(json.dumps({
        "metric": "knn_qps",
        "value": round(qps, 1),
        "unit": "queries/s",
        "qps_device": round(qps_device, 1),
        "headline_serving_path": "knn_grouped int8 tile kernel + "
                                 "fused top-k tail",
        "vs_baseline": round(qps / ref_qps, 1),
        "recall_at_10": round(recall, 4),
        "baseline_recall_at_10": round(float(np.mean(ref_recalls)), 4),
        "baseline_qps": round(ref_qps, 1),
        "build_s": round(build_s, 3),
        "build_cold_s": round(build_cold_s, 3),
        "baseline_build_s": round(ref_build_s, 3),
        "recall_target": TARGET,
        "qps_at_target": round(qps_at_target, 1),
        "recall_at_target": round(recall_at_target, 4),
        "vs_baseline_at_target": round(qps_at_target / ref_qps_target, 1),
        "baseline_qps_at_target": round(ref_qps_target, 1),
        "tree_point_at_target": {
            "qps": round(qps_tree, 1), "recall": round(recall_tree, 4),
            "trees": QT, "min_leaf": MLT, "budget": BT, "probes": PT},
        "qps_at_target_1m": round(qps_scan_1m, 1),
        "recall_at_target_1m": round(recall_1m, 4),
        "vs_baseline_at_target_1m": round(qps_scan_1m / ref_qps_1m, 1),
        # clustered 1M (reference's own bench data family): the TREE path
        # is the winning >=0.9 config, beating the engine's own exact scan
        "tree_qps_at_target": round(tree_qps_c, 1),
        "tree_qps_device": round(tree_qps_c_device, 1),
        "tree_recall_at_target": round(tree_recall_c, 4),
        # block-resident MXU rerank + fused streaming top-k tail
        "tree_serving_path": "knn_grouped + fused top-k tail",
        "tree_qps_perpair": round(tree_qps_c_pp, 1),
        "tree_qps_perpair_device": round(tree_qps_c_pp_device, 1),
        "clustered_scan_qps": round(scan_qps_c, 1),
        "clustered_scan_recall": round(scan_recall_c, 4),
        "tree_vs_scan_clustered": round(tree_qps_c / scan_qps_c, 2),
        "vs_baseline_tree_at_target": round(tree_qps_c / ref_qps_1m, 1),
        "clustered_config": {"n": NC, "centers": CC, "sigma": SIGC,
                             "trees": TC, "min_leaf": MLC, "budget": BC,
                             "probes": PC, "blocks": "f32",
                             "batch": BCQ, "chunk": CHC,
                             "tuned": True,  # min_leaf/probes from
                             #                 tune_build on a subsample
                             "tuner_subsample": SUBC,
                             "tuner_min_leaf_sub": int(tb["min_leaf"])},
        "config": {"n": N, "dim": DIM, "trees": T, "k": K,
                   "max_depth": cfg.max_depth, "min_leaf": MIN_LEAF,
                   "budget": BUDGET, "probes": PROBES, "batch": B,
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    import os
    import shutil
    import sys

    try:
        main()
    except Exception:
        # the persistent compile cache can hold a corrupted executable
        # (observed once after a heavily contended run: every subsequent
        # run died with INVALID_ARGUMENT until the cache was cleared) --
        # self-heal by wiping it and re-executing once
        cache = os.path.expanduser("~/.cache/rptree_tpu/jax")
        if os.environ.get("RPTREE_BENCH_RETRY") != "1" and os.path.isdir(cache):
            shutil.rmtree(cache, ignore_errors=True)
            sys.stderr.write("bench failed; cleared the persistent compile "
                             "cache, retrying once\n")
            env = dict(os.environ, RPTREE_BENCH_RETRY="1")
            os.execve(sys.executable,
                      [sys.executable, os.path.abspath(__file__)], env)
        raise
