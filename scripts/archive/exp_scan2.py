"""Dispatch-overhead floor + scan cost after the mirror/bug-scan opts,
plus bench-style pipelined throughput."""
import sys, time
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import load_workload

import jax
import jax.numpy as jnp
import numpy as np

bench, g, di, codes_all = load_workload()
from dbgtpu.engine.core import align_batch, index_to_device

K, M, EFFORT = bench.K, bench.M, bench.EFFORT
B = 32768
dev = jax.devices()[0]
ix = jax.device_put(index_to_device(di), dev)
batches = [
    jax.device_put(codes_all[i * B : (i + 1) * B], dev) for i in range(4)
]
nm = jax.device_put(np.zeros((B, bench.READ_LEN), bool), dev)
lens = jax.device_put(np.full(B, bench.READ_LEN, np.int32), dev)
np.asarray(batches[0][0])


@jax.jit
def floor_fn(codes, lens):
    return jnp.sum(codes.astype(jnp.uint32)) + jnp.sum(lens)


def timed(label, fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label:26s}: {med*1e3:7.1f} ms", flush=True)
    return med


timed("dispatch floor (sum)", lambda: np.asarray(floor_fn(batches[0], lens)))


def run1(kw):
    res = align_batch(ix, batches[0], nm, lens, k=K, m=M, effort=EFFORT, **kw)
    return np.asarray(res["status"])


timed("scan only", lambda: run1(dict(ablate="scan")))
timed("full s1=4", lambda: run1(dict(stage1_iters=4)))
timed("full s1=6", lambda: run1(dict()))


def pipelined(kw, n=4):
    outs = [
        align_batch(ix, b, nm, lens, k=K, m=M, effort=EFFORT, **kw)["status"]
        for b in batches[:n]
    ]
    return [np.asarray(o) for o in outs]


med = timed("pipelined x4 s1=4", lambda: pipelined(dict(stage1_iters=4)))
print(f"-> {4*B/med:,.0f} reads/s", flush=True)
med = timed("pipelined x4 s1=6", lambda: pipelined(dict()))
print(f"-> {4*B/med:,.0f} reads/s", flush=True)
