"""Experiment: where does align_batch time go on the real chip?"""
import sys, time
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import load_workload, timeit

import jax
import jax.numpy as jnp
import numpy as np

bench, g, di, codes_all = load_workload()
from dbgtpu.engine.core import align_batch, index_to_device

K, M, EFFORT = bench.K, bench.M, bench.EFFORT
B = 32768
dev = jax.devices()[0]
print("device:", dev, flush=True)

ix = jax.device_put(index_to_device(di), dev)
codes = jax.device_put(codes_all[:B], dev)
nm = jax.device_put(np.zeros(codes.shape, bool), dev)
lens = jax.device_put(np.full(B, bench.READ_LEN, np.int32), dev)
jax.block_until_ready((ix, codes, nm, lens))

def full():
    res = align_batch(ix, codes, nm, lens, k=K, m=M, effort=EFFORT,
                      probe_len=di.tbl.probe_len)
    return res["status"], res["iters"]

t0 = time.perf_counter()
st, iters = full()
jax.block_until_ready((st, iters))
print(f"compile+run: {time.perf_counter()-t0:.1f}s; iters={int(iters)}",
      flush=True)
st = np.asarray(st)
print("status counts:", np.bincount(st, minlength=5), flush=True)

med = timeit(full, reps=3, label=f"align_batch B={B}")
print(f"-> {B/med:,.0f} reads/s", flush=True)
