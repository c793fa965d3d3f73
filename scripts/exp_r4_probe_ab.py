"""One-session A/B of the closure-probe window (4 vs 3 vs none).

Cross-session comparisons are unreliable (±15% relay swings — see the
round-3 scaling-table critique), so this builds ALL probe variants in
ONE process and times each with the whole-workload single-dispatch
method (lax.map over stacked batches, one scalar fetch, null floor
measured in-session).  Hypothesis under test (from the r4 stage
ablations): row-gather rate degrades with table FOOTPRINT, so the
25 MB window-3 table (28 probes/read) can beat the 64 MB window-4
table (21 probes/read).

Writes /tmp/r4_probe_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r4_probe_ab.jsonl", "a")


def rec(**kw):
    kw = {k: (round(v, 4) if isinstance(v, float) else v)
          for k, v in kw.items()}
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()
    print(kw, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    dev = jax.devices()[0]
    t0 = time.monotonic()
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    rec(phase="warmup", dt=time.monotonic() - t0)

    import bench
    import dbgtpu.index.device as dm
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import PMAX_CAP, _bucket_len, _pmax_for

    unitigs, codes_all = bench.build_workload()
    K, M, EFFORT = bench.K, bench.M, bench.EFFORT
    g = build_graph_from_seqs(unitigs, K)
    L = _bucket_len(bench.READ_LEN, K)
    B = 32768
    N = codes_all.shape[0]
    nbatch = N // B
    pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
    cs = jax.device_put(np.stack([
        np.concatenate([codes_all[i * B:(i + 1) * B], pad], axis=1)
        for i in range(nbatch)
    ]), dev)
    nm = jax.device_put(np.zeros((B, L), bool), dev)
    lens = jax.device_put(np.full(B, bench.READ_LEN, np.int32), dev)
    jax.block_until_ready((cs, nm, lens))

    def timed(label, ix, pmax, ab, floor=None, extra=None):
        @jax.jit
        def whole(cs, nm, lens):
            def one(c):
                r = align_batch.__wrapped__(
                    ix, c, nm, lens, k=K, m=M, effort=EFFORT,
                    pmax=pmax, ablate=ab,
                )
                return jnp.sum(r["status"]) + (
                    jnp.sum(r["paths"]) if "paths" in r else 0
                )
            return jnp.sum(jax.lax.map(one, cs))

        t0 = time.monotonic()
        np.asarray(whole(cs, nm, lens))
        warm = time.monotonic() - t0
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            np.asarray(whole(cs, nm, lens))
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        row = dict(phase=label, compile_s=round(warm, 1),
                   per_batch_ms=round(med / nbatch * 1e3, 2),
                   reads_per_s=round(N / med), **(extra or {}))
        if floor is not None:
            row["per_batch_minus_null_ms"] = round(
                (med - floor) / nbatch * 1e3, 2
            )
        rec(**row)
        return med

    def build(window_cap, w4=False):
        old = dm.PROBE_TABLE_MAX_BYTES
        dm.PROBE_TABLE_MAX_BYTES = window_cap
        if w4:
            os.environ["DBGTPU_PROBE_WINDOW"] = "4"
        try:
            di = dm.build_device_index(g)
        finally:
            dm.PROBE_TABLE_MAX_BYTES = old
            os.environ.pop("DBGTPU_PROBE_WINDOW", None)
        return di

    variants = [
        ("w4", 1 << 30, True),
        ("w3", 30_000_000, False),
        ("noprobe", 0, False),
    ]
    for name, cap, w4 in variants:
        di = build(cap, w4)
        ix = index_to_device(di)
        jax.block_until_ready(ix)
        pmax = min(_pmax_for(di, L), PMAX_CAP)
        pt_mb = (di.probe_tbl.rows.nbytes >> 20) if di.probe_tbl else 0
        win = di.probe_tbl.window if di.probe_tbl else 0
        floor = timed(f"{name}_null", ix, pmax, "null",
                      extra={"pt_mb": pt_mb, "window": win})
        timed(f"{name}_member", ix, pmax, "member", floor,
              extra={"pt_mb": pt_mb, "window": win})
        timed(f"{name}_all", ix, pmax, "all", floor,
              extra={"pt_mb": pt_mb, "window": win})
        del di, ix
    rec(phase="done")


if __name__ == "__main__":
    main()
