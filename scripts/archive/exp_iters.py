"""Measure while-loop iteration distribution on the bench workload:
how many reads are still pending after t junction iterations, and the
wall cost of the loop at capped max_iters.  Determines whether
tail-compaction (full batch for few iters, then re-batch survivors)
is the right perf lever."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import bench as B

unitigs, codes = B.build_workload()
from dbgtpu.index.build import build_graph_from_seqs
from dbgtpu.index.device import build_device_index
from dbgtpu.engine.core import align_batch, index_to_device
from dbgtpu.seq import encode

g = build_graph_from_seqs(unitigs, B.K)
di = build_device_index(g)
ix = index_to_device(di)

batch = 32768
c = codes[:batch]
nm = np.zeros_like(c, bool)
lens = np.full(batch, B.READ_LEN, np.int32)

cj = jax.device_put(c)
nmj = jax.device_put(nm)
lj = jax.device_put(lens)

for t in [4, 8, 12, 16, 24, 32, 48, 64, 0]:
    fn = lambda: align_batch(ix, cj, nmj, lj, k=B.K, m=B.M,
                             effort=B.EFFORT, max_iters=t if t else 0)
    r = fn(); jax.block_until_ready(r["status"])
    t0 = time.perf_counter()
    for _ in range(3):
        r = fn()
        jax.block_until_ready(r["status"])
    dt = (time.perf_counter() - t0) / 3
    pend = int(np.sum(np.asarray(r["status"]) == 0))
    iters = int(r["iters"])
    print(f"max_iters={t:3d} actual_iters={iters:3d} pending={pend:6d} "
          f"({100*pend/batch:.2f}%)  wall={dt*1e3:7.1f} ms")
