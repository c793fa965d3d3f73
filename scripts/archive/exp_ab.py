"""A/B the engine variants on the real bench workload to find the
r2 steady-state regression (508k -> 162k reads/s): pmax on/off,
staged vs single loop, L=100 vs L=128."""
import os
import sys
import time

sys.path.insert(0, "/root/repo/scripts")
sys.path.insert(0, "/root/repo")

import numpy as np
from _benchlib import load_workload

import jax


def main():
    bench, g, di, codes_all = load_workload()
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import _bucket_len, _pmax_for

    dev = jax.devices()[0]
    ix = jax.device_put(index_to_device(di), dev)
    B = 32768
    K, M, E = bench.K, bench.M, bench.EFFORT
    codes100 = codes_all[:B]
    pad = np.zeros((B, 12), np.uint8)
    codes112 = np.concatenate([codes100, pad], axis=1)

    PM = _pmax_for(di, 112)
    cases = [
        ("L112_kmers", codes112, dict(ablate="kmers")),
        ("L112_member", codes112, dict(ablate="member")),
        ("L112_scanonly", codes112, dict(ablate="scan")),
        ("L112_pmax_staged6", codes112, dict(pmax=PM)),
    ]
    for name, codes, kw in cases:
        L = codes.shape[1]
        nm = jax.device_put(np.zeros((B, L), bool), dev)
        lens = jax.device_put(np.full(B, 100, np.int32), dev)
        cd = jax.device_put(codes, dev)

        def step():
            res = align_batch(ix, cd, nm, lens, k=K, m=M, effort=E, **kw)
            a = (res["status"] == 1) | (res["status"] == 2)
            return res["status"].sum() + a.sum()

        out = np.asarray(step())  # compile+first
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            out = np.asarray(step())
            best = min(best, time.monotonic() - t0)
        print(f"{name}: {best*1e3:.0f} ms -> {B/best:,.0f} reads/s",
              flush=True)


if __name__ == "__main__":
    main()
