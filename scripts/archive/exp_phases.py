"""Phase-level timing of align_batch on the real chip:
scan-only vs capped-loop vs staged vs full."""
import sys, os, time
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import load_workload

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
np.asarray(codes[0])  # hard sync (axon block_until_ready unreliable)


def timed(label, **kw):
    def fn():
        res = align_batch(ix, codes, nm, lens, k=K, m=M, effort=EFFORT, **kw)
        return np.asarray(res["status"]), np.asarray(res["iters"])
    st, it = fn()  # compile + first
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[2]
    print(f"{label:28s}: {med*1e3:7.1f} ms  iters={int(it):4d}  "
          f"({B/med/1e3:,.0f}k r/s)", flush=True)
    return med


timed("scan only", ablate="scan")
timed("loop x1", max_iters=1, stage1_iters=0)
timed("loop x2", max_iters=2, stage1_iters=0)
timed("loop x4", max_iters=4, stage1_iters=0)
timed("loop x8", max_iters=8, stage1_iters=0)
timed("loop x12", max_iters=12, stage1_iters=0)
timed("uncapped unstaged", stage1_iters=0)
timed("staged (default)", )
timed("staged s1=8", stage1_iters=8)
timed("staged s1=4", stage1_iters=4)
