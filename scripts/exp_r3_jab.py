"""A/B the junction bucket geometry (32-slot dense vs 8-slot) and
stage split at bench scale, single-dispatch timed."""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r3_jab.jsonl", "a")


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
    nm = jax.device_put(np.zeros((B, L), bool), dev)
    lens = jax.device_put(np.full(B, bench.READ_LEN, np.int32), dev)
    cs = [
        jax.device_put(np.concatenate(
            [codes_all[i * B:(i + 1) * B], pad], axis=1), dev)
        for i in range(nbatch)
    ]
    jax.block_until_ready(cs)

    @functools.partial(jax.jit, static_argnames=("ab", "pmax"))
    def f(ixx, c, nm, lens, *, ab, pmax):
        r = align_batch.__wrapped__(
            ixx, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=pmax,
            ablate=ab,
        )
        return jnp.sum(r["status"]) + (
            jnp.sum(r["paths"]) if "paths" in r else 0
        )

    def run_geom(name, slots, load):
        old = (dm.ST_SLOTS, dm.ST_TARGET_LOAD)
        dm.ST_SLOTS, dm.ST_TARGET_LOAD = slots, load
        try:
            di = dm.build_device_index(g)
        finally:
            dm.ST_SLOTS, dm.ST_TARGET_LOAD = old
        # engine reads ST_SLOTS at trace time: keep it matched
        dm.ST_SLOTS, dm.ST_TARGET_LOAD = slots, load
        try:
            ix = index_to_device(di)
            jax.block_until_ready(ix)
            pmax = min(_pmax_for(di, L), PMAX_CAP)
            for ab in ("scan", "all"):
                t0 = time.monotonic()
                np.asarray(f(ix, cs[0], nm, lens, ab=ab, pmax=pmax))
                warm = time.monotonic() - t0
                ts = []
                for _ in range(4):
                    t0 = time.monotonic()
                    outs = [f(ix, c, nm, lens, ab=ab, pmax=pmax)
                            for c in cs]
                    for o in outs:
                        np.asarray(o)
                    ts.append(time.monotonic() - t0)
                med = sorted(ts)[len(ts) // 2]
                rec(phase=f"{name}_{ab}", compile_s=round(warm, 1),
                    per_batch_ms=round(med / nbatch * 1e3, 1),
                    reads_per_s=round(N / med),
                    st_cols=int(di.scan_tbl.keys.shape[1]) * 5)
        finally:
            dm.ST_SLOTS, dm.ST_TARGET_LOAD = old
        del di

    run_geom("dense32", 32, 12)
    run_geom("slot8", 8, 1)
    rec(phase="done")


if __name__ == "__main__":
    main()
