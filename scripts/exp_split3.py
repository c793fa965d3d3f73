"""Setup vs loop cost, forcing execution via D2H every rep."""
import sys
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

for mi in (1, 2, 4, 8, 12, 16):
    def run(mi=mi):
        r = align_batch(ix, codes, nm, lens, k=K, m=M, effort=EFFORT,
                        probe_len=di.tbl.probe_len, max_iters=mi)
        return np.asarray(r["status"])
    timeit(run, reps=3, label=f"max_iters={mi}")
