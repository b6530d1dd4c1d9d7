"""Multi-host (DCN) data-parallel build: two separate processes, each
owning half the virtual devices, ingest their own shard of the rows and
run the distributed-median build SPMD (``jax.distributed`` over a CPU
stand-in cluster -- the standard JAX recipe for "multi-node without a
real cluster", SURVEY.md section 4).

The reference has no distributed story at all (SURVEY.md section 2.11);
the spec here is BASELINE.md's GIST-scale ingest: each host feeds only its
local rows (``jax.make_array_from_process_local_data``), the build's
radix-selection collectives run over DCN+ICI, and every host gets the
same replicated tree structure back.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
proc = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=proc)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from rptree_tpu.parallel.data_parallel import (
    DATA_AXIS, data_mesh, forest_batch_data_parallel)

N, DIM, T = 1600, 16, 2
rng = np.random.default_rng(55)
x = rng.normal(size=(N, DIM)).astype(np.float32)  # the full dataset...
mesh = data_mesh()  # all 8 global devices (4 per process)
sharding = NamedSharding(mesh, P(DATA_AXIS))
# ...but each process INGESTS only its own half (per-host shard ingest)
lo, hi = proc * N // nproc, (proc + 1) * N // nproc
xs = jax.make_array_from_process_local_data(sharding, x[lo:hi], (N, DIM))
f = forest_batch_data_parallel(7, 6, 16, T, 1.0, xs, mesh=mesh)
q = jax.device_put(x[:4] + 0.01, NamedSharding(mesh, P()))
d, i = f.knn(q, 3)
# the flagship serving mode over the same multi-process mesh: leaf-
# sharded packed blocks + the query-grouped rerank (its per-shard tile
# capacity rides a psum'd `needed` that every process fetches equally)
f.pack_leaves()
dg, ig = f.knn_grouped(q, 3, budget=4)
# force full replication before the host fetch: jit outputs may live on
# non-addressable devices in a multi-process mesh
repl = NamedSharding(mesh, P())
fetch = jax.jit(lambda a: a, out_shardings=repl)
perm = np.asarray(fetch(f.arrays.perm))
d = np.asarray(fetch(d)); i = np.asarray(fetch(i))
ig = np.asarray(fetch(ig))
out = sys.argv[4]
if proc == 0:
    np.savez(out, perm=perm, ids=i, dists=d, ids_grouped=ig)
print(f"proc {proc} ok")
"""


@pytest.mark.rptree_slow  # ~80s: two full child-interpreter jax.distributed
# boots.  Slow-tier rationale: the DCN/process surface it covers is also
# exercised by examples/multihost_bench.py and the sharding semantics by
# test_data_parallel.py on the in-process mesh; run with RPTREE_SLOW=1.
def test_two_process_data_parallel_build(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    out = str(tmp_path / "result.npz")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), "2", port, out],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    # the multi-host build must place the same points in the same leaves
    # as the single-process build (within-leaf order differs by design:
    # the dp permutation is stable-by-original-index) and answer queries
    # identically
    from rptree_tpu.parallel.data_parallel import (
        data_mesh,
        forest_batch_data_parallel,
    )

    rng = np.random.default_rng(55)
    x = rng.normal(size=(1600, 16)).astype(np.float32)
    # same mesh shape in ONE process (the conftest 8-virtual-device CPU
    # mesh): identical shard-local partitioning => identical STRUCTURE
    single = forest_batch_data_parallel(7, 6, 16, 2, 1.0, x,
                                        mesh=data_mesh(8))
    got = np.load(out)
    np.testing.assert_array_equal(got["perm"],
                                  np.asarray(single.arrays.perm))
    # grouped serving over the 2-process mesh answers like the single-
    # process grouped path (same leaf-sharded blocks, same merge)
    single.pack_leaves()
    _, ig1 = map(np.asarray, single.knn_grouped(x[:4] + 0.01, 3, budget=4))
    np.testing.assert_array_equal(got["ids_grouped"], ig1)
    d1, i1 = map(np.asarray, single.knn(x[:4] + 0.01, 3))
    # distances via the factored |x|^2 - 2 x.q + |q|^2 form cancel
    # catastrophically at near-self distances (~0.04 here vs |x|^2 ~ 16),
    # and the 2-process GEMM partitioning accumulates in a different
    # order -- observed drift up to ~1e-4 absolute on those entries
    np.testing.assert_allclose(got["dists"], d1, atol=5e-4)
