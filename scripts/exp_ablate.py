"""Ablate pieces of the junction body (scratch copy exp_core_abl) to
find what makes a >=2-trip loop cost ~40ms when 1 trip costs 0.25ms."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np, jax
import bench as B
import exp_core_abl as AC

unitigs, codes = B.build_workload()
from dbgtpu.index.build import build_graph_from_seqs
from dbgtpu.index.device import build_device_index

g = build_graph_from_seqs(unitigs, B.K)
ix = AC.index_to_device(build_device_index(g))
batch = 32768
cj = jax.device_put(codes[:batch].astype(np.uint8))
nmj = jax.device_put(np.zeros((batch, B.READ_LEN), bool))
lj = jax.device_put(np.full(batch, B.READ_LEN, np.int32))

abl = os.environ.get("DBGTPU_ABLATE", "")
for n in [2, 4]:
    fn = lambda: AC.align_batch(ix, cj, nmj, lj, k=B.K, m=B.M,
                                effort=B.EFFORT, max_iters=n)
    r = fn(); jax.block_until_ready(r)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"abl=[{abl}] n={n}: {sorted(ts)[2]*1e3:7.2f} ms")
