"""Round-5 stage-split accounting (VERDICT r4 item 3) + 1M geometry A/B.

Method: per ablate variant, the WHOLE stacked workload runs inside an
in-dispatch fori loop (inputs rolled by the rep index to defeat
loop-invariant hoisting); per-variant device time = (T(R) - T(1)) /
(R-1) / n_batches.  Stage costs are CONSECUTIVE DIFFERENCES of the
variant times, so the split telescopes to the full step exactly —
unlike the r3/r4 per-dispatch ablations whose stages summed to ~2/3
of the measured step (tunnel jitter per number).

Variants (cumulative prefixes of the mapping step):
  null   — dispatch+I/O floor (trivial compute)
  images — + read images (packed rows, RC)
  kmers  — + rolling (k-1)-mer scans
  member — + per-position junction membership (closure probes)
  scan   — + anchor extraction (first/last-k hits)
  nopack — + the full walk state machine (pmax=0: no path packing)
  all    — + pack_paths (the shipped result transform)

argv: "bench" (default, 30k unitigs) or "scale" (1M; bench_scale cache)
      + optional "stslots" to run the ST_SLOTS=8 scan-table A/B.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    print(f"warmup {time.monotonic()-t0:.1f}s", flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "bench"
    do_stslots = "stslots" in sys.argv[1:]
    import bench

    if which == "scale":
        import bench_scale

        unitigs, codes_all = bench_scale.workload()
        READ_LEN = bench_scale.READ_LEN
    else:
        unitigs, codes_all = bench.build_workload()
        READ_LEN = bench.READ_LEN
    K, M, EFFORT = bench.K, bench.M, bench.EFFORT

    import dbgtpu.index.device as device_mod
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import (
        PMAX_CAP, PMAX_INIT, _bucket_len, _pmax_for, _quantize_pmax,
    )
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index

    t0 = time.monotonic()
    g = build_graph_from_seqs(unitigs, K)
    di = build_device_index(g)
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    print(f"index {len(unitigs)} unitigs {time.monotonic()-t0:.1f}s",
          flush=True)

    B = 32768
    L = _bucket_len(READ_LEN, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP, _quantize_pmax(PMAX_INIT))
    N = codes_all.shape[0]
    nb = N // B
    pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
    cs = np.stack([
        np.concatenate([codes_all[i * B:(i + 1) * B], pad], axis=1)
        for i in range(nb)
    ])
    cs = jax.device_put(cs, dev)
    nm = jax.device_put(np.zeros((B, L), bool), dev)
    lens = jax.device_put(np.full(B, READ_LEN, np.int32), dev)
    jax.block_until_ready((cs, nm, lens))

    R = int(os.environ.get("DBGTPU_SPLIT_REPS", 9))

    def variant_ms(ix, ablate, pmax, label):
        @functools.partial(jax.jit, static_argnames=("reps",))
        def reps_fn(ix, cs, nm, lens, *, reps):
            def body(i, acc):
                cr = jnp.roll(cs, i, axis=0)

                def one(c):
                    r = align_batch.__wrapped__(
                        ix, c, nm, lens, k=K, m=M, effort=EFFORT,
                        pmax=pmax, ablate=ablate,
                    )
                    s = jnp.sum(r["status"]) + jnp.sum(
                        r["llen"] + r["rlen"])
                    if "paths" in r:
                        s = s + jnp.sum(r["paths"].astype(jnp.int32))
                    return s

                return acc + jnp.sum(jax.lax.map(one, cr))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        times = {}
        for reps in (1, R):
            np.asarray(reps_fn(ix, cs, nm, lens, reps=reps))  # warm
            t0 = time.monotonic()
            np.asarray(reps_fn(ix, cs, nm, lens, reps=reps))
            times[reps] = time.monotonic() - t0
        ms = (times[R] - times[1]) / (R - 1) / nb * 1e3
        print(f"{label:<8} {ms:7.2f} ms/batch", flush=True)
        return ms

    stages = [
        ("null", "null", PMAX), ("images", "images", PMAX),
        ("kmers", "kmers", PMAX), ("member", "member", PMAX),
        ("scan", "scan", PMAX), ("nopack", "all", 0),
        ("all", "all", PMAX),
    ]
    t = {}
    for label, ab, pm in stages:
        t[label] = variant_ms(ix, ab, pm, label)
    print("\n--- telescoped split (ms/32k batch) ---")
    prev = 0.0
    for label, _, _ in stages:
        print(f"{label:<8} +{t[label]-prev:6.2f}  (cum {t[label]:6.2f})")
        prev = t[label]
    full = t["all"]
    print(f"full step {full:.2f} ms -> "
          f"{B/full*1e3:,.0f} reads/s device-only", flush=True)

    if "iters" in sys.argv[1:]:
        # walk per-iteration cost: capped full-batch loop (no staged
        # compaction, no net), slope over max_iters = ms/iteration
        print("\n--- walk iteration cost (stage1=0, capped) ---",
              flush=True)
        prev_ms = None

        def cap_ms(mi, label):
            @functools.partial(jax.jit, static_argnames=("reps",))
            def reps_fn(ix, cs, nm, lens, *, reps):
                def body(i, acc):
                    cr = jnp.roll(cs, i, axis=0)

                    def one(c):
                        r = align_batch.__wrapped__(
                            ix, c, nm, lens, k=K, m=M, effort=EFFORT,
                            pmax=0, max_iters=mi, stage1_iters=0,
                        )
                        return (jnp.sum(r["status"])
                                + jnp.sum(r["llen"] + r["rlen"]))
                    return acc + jnp.sum(jax.lax.map(one, cr))
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

            times = {}
            for reps in (1, R):
                np.asarray(reps_fn(ix, cs, nm, lens, reps=reps))
                t0 = time.monotonic()
                np.asarray(reps_fn(ix, cs, nm, lens, reps=reps))
                times[reps] = time.monotonic() - t0
            ms = (times[R] - times[1]) / (R - 1) / nb * 1e3
            print(f"{label:<12} {ms:7.2f} ms/batch", flush=True)
            return ms

        for mi in (1, 2, 4, 6, 8, 12, 16, 24, 40):
            ms = cap_ms(mi, f"max_iters={mi}")
            if prev_ms is not None:
                pass
            prev_ms = ms
        # staged (production) for comparison, pmax=0
        @functools.partial(jax.jit, static_argnames=("reps",))
        def reps_staged(ix, cs, nm, lens, *, reps):
            def body(i, acc):
                cr = jnp.roll(cs, i, axis=0)

                def one(c):
                    r = align_batch.__wrapped__(
                        ix, c, nm, lens, k=K, m=M, effort=EFFORT,
                        pmax=0,
                    )
                    return (jnp.sum(r["status"])
                            + jnp.sum(r["llen"] + r["rlen"]))
                return acc + jnp.sum(jax.lax.map(one, cr))
            return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

        for s1 in (2, 3, 4, 6):
            @functools.partial(jax.jit, static_argnames=("reps", "s1"))
            def reps_s1(ix, cs, nm, lens, *, reps, s1):
                def body(i, acc):
                    cr = jnp.roll(cs, i, axis=0)

                    def one(c):
                        r = align_batch.__wrapped__(
                            ix, c, nm, lens, k=K, m=M, effort=EFFORT,
                            pmax=0, stage1_iters=s1,
                        )
                        return (jnp.sum(r["status"])
                                + jnp.sum(r["llen"] + r["rlen"]))
                    return acc + jnp.sum(jax.lax.map(one, cr))
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

            times = {}
            for reps in (1, R):
                np.asarray(reps_s1(ix, cs, nm, lens, reps=reps, s1=s1))
                t0 = time.monotonic()
                np.asarray(reps_s1(ix, cs, nm, lens, reps=reps, s1=s1))
                times[reps] = time.monotonic() - t0
            ms = (times[R] - times[1]) / (R - 1) / nb * 1e3
            print(f"staged s1={s1} {ms:7.2f} ms/batch", flush=True)

    if do_stslots:
        print("\n--- ST_SLOTS A/B (scan-table geometry) ---", flush=True)
        from dataclasses import replace

        for S in (32, 8, 16):
            old_s, old_l = device_mod.ST_SLOTS, device_mod.ST_TARGET_LOAD
            device_mod.ST_SLOTS = S
            device_mod.ST_TARGET_LOAD = max(2, (S * 3) // 8)
            try:
                t0 = time.monotonic()
                st = device_mod.build_scan_table(g.jkeys, g.jvals)
                tb = time.monotonic() - t0
            finally:
                device_mod.ST_SLOTS = old_s
                device_mod.ST_TARGET_LOAD = old_l
            di2 = replace(di, scan_tbl=st)
            ix2 = index_to_device(di2)
            jax.block_until_ready(ix2)
            mb = (st.keys.nbytes + st.vals.nbytes) >> 20
            ms = variant_ms(
                ix2, "all", PMAX,
                f"S={S} ({mb}MB, build {tb:.0f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
