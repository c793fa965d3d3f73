"""Shared helpers for perf experiments (not part of the package)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np


def load_workload():
    sys.argv = sys.argv[:1]
    import bench

    unitigs, codes = bench.build_workload()
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index

    g = build_graph_from_seqs(unitigs, bench.K)
    di = build_device_index(g)
    return bench, g, di, codes


def timeit(fn, reps=3, label=""):
    outs = fn()
    jax.block_until_ready(outs)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn()
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label}: median {med*1e3:.1f} ms  (all: "
          + ", ".join(f"{t*1e3:.0f}" for t in ts) + ")", flush=True)
    return med
