"""Isolate the packed-entry device regression (old dict entry 58 ms/
batch -> packed 100+ ms/batch): time old align_batch vs packed with
int16/int32 output, and the dense probe table's effect.  One process.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r3_pack.jsonl", "a")


def rec(**kw):
    kw = {k: (round(v, 4) if isinstance(v, float) else v)
          for k, v in kw.items()}
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()
    print(kw, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    dev = jax.devices()[0]

    t0 = time.monotonic()
    np.asarray(jax.jit(lambda a: a * 2)(jax.device_put(
        np.ones((8, 128), np.float32), dev)))
    rec(phase="warmup", dt=time.monotonic() - t0)

    import bench

    unitigs, codes_all = bench.build_workload()
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import (
        align_batch, align_batch_packed, index_to_device,
    )
    from dbgtpu.engine.runner import (
        PMAX_CAP, _bucket_len, _pmax_for, pack_words_batch,
    )

    K, M, EFFORT = bench.K, bench.M, bench.EFFORT
    g = build_graph_from_seqs(unitigs, K)
    di = build_device_index(g)
    t0 = time.monotonic()
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    rec(phase="index_h2d", dt=time.monotonic() - t0,
        mb=sum(np.asarray(a).nbytes for a in ix) >> 20,
        probe_mb=(di.probe_tbl.rows.nbytes >> 20
                  if di.probe_tbl is not None else 0))

    B = 32768
    L = _bucket_len(bench.READ_LEN, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP)
    n_batches = codes_all.shape[0] // B
    pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
    nm = np.zeros((B, L), bool)
    lens_np = np.full(B, bench.READ_LEN, np.int32)
    raw = [
        np.concatenate([codes_all[i * B : (i + 1) * B], pad], axis=1)
        for i in range(n_batches)
    ]
    codes_d = [jax.device_put(c, dev) for c in raw]
    nm_d = jax.device_put(nm, dev)
    packed = [pack_words_batch(c, nm) for c in raw]
    words_d = [(jax.device_put(w, dev), jax.device_put(b, dev))
               for w, b in packed]
    lens_d = jax.device_put(lens_np, dev)
    jax.block_until_ready((codes_d, nm_d, words_d, lens_d))

    def timed(label, fn):
        # warm (compile)
        t0 = time.monotonic()
        np.asarray(fn(0))
        warm = time.monotonic() - t0
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            outs = [fn(i) for i in range(n_batches)]
            for o in outs:
                np.asarray(o)          # includes D2H of the result
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        rec(phase=label, compile_first=warm, total_ms=round(med * 1e3),
            per_batch_ms=round(med / n_batches * 1e3, 1),
            reads_per_s=round(n_batches * B / med))

    # old dict entry, device-resident unpacked inputs, D2H of status only
    def f_old(i):
        r = align_batch(ix, codes_d[i], nm_d, lens_d,
                        k=K, m=M, effort=EFFORT, pmax=PMAX)
        return r["status"]

    # packed int16 / int32
    def f_p16(i):
        w, b = words_d[i]
        return align_batch_packed(ix, w, b, lens_d, mode="greedy",
                                  k=K, m=M, effort=EFFORT, L=L, pmax=PMAX)

    def f_p32(i):
        w, b = words_d[i]
        return align_batch_packed(ix, w, b, lens_d, mode="greedy",
                                  k=K, m=M, effort=EFFORT, L=L, pmax=PMAX,
                                  out_dtype="int32")

    timed("old_status_only", f_old)
    timed("packed_int16", f_p16)
    timed("packed_int32", f_p32)

    # old entry but D2H of the packed paths dict fields (previous runner)
    def f_old_full(i):
        r = align_batch(ix, codes_d[i], nm_d, lens_d,
                        k=K, m=M, effort=EFFORT, pmax=PMAX)
        return r["paths"]

    timed("old_paths_d2h", f_old_full)
    rec(phase="done")


if __name__ == "__main__":
    main()
