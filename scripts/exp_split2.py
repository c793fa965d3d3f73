"""Verify what actually forces execution on axon platform."""
import sys, time
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import load_workload, timeit

import jax
import numpy as np

bench, g, di, codes_all = load_workload()
from dbgtpu.engine.core import align_batch, index_to_device

K, M, EFFORT = bench.K, bench.M, bench.EFFORT
B = 32768
dev = jax.devices()[0]
ix = jax.device_put(index_to_device(di), dev)
codes = jax.device_put(codes_all[:B], dev)
nm = jax.device_put(np.zeros(codes.shape, bool), dev)
lens = jax.device_put(np.full(B, bench.READ_LEN, np.int32), dev)
jax.block_until_ready((ix, codes, nm, lens))


def base(mi):
    return align_batch(ix, codes, nm, lens, k=K, m=M, effort=EFFORT,
                       probe_len=di.tbl.probe_len, max_iters=mi)

# variant A: block on status only
timeit(lambda: base(16)["status"], reps=3, label="A block status (mi=16)")
# variant B: block on status+iters
timeit(lambda: (base(16)["status"], base(16)["iters"]),
       reps=3, label="B block status+iters (mi=16)")
# variant C: D2H each rep
def c():
    r = base(16)
    return np.asarray(r["status"])
timeit(c, reps=3, label="C np.asarray status (mi=16)")
# variant D: default mi (same cache entry as bench), D2H
def d():
    r = base(0)
    return np.asarray(r["status"])
timeit(d, reps=3, label="D np.asarray status (mi=0)")
# variant E: default mi, block only
timeit(lambda: base(0)["status"], reps=3, label="E block status (mi=0)")
