"""Single-dispatch ablate profiling of the mapping step.

Each variant runs the WHOLE stacked workload (lax.map over batches)
in ONE dispatch per rep and fetches ONE scalar, so a variant's time
contains exactly one tunnel round-trip; the `null` variant (same I/O,
trivial compute) measures that per-call floor, and
`per_batch_minus_null_ms` is the clean incremental device cost of the
stages the variant enables.  (The former per-batch-dispatch version
folded a ~26 ms RTT into every per-batch number — r3's "scan 26.5 ms"
included the floor.)

Env:
  DBGTPU_SCALE_UNITIGS=1000000 DBGTPU_ABLATE_SCALE=1  -> run on the
    large-graph workload (bench_scale's cache) instead of bench's 30k
  DBGTPU_ABLATE_ONLY=1 -> skip the stage1 sweep and batch-size legs
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r3_ablate.jsonl", "a")


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

    if os.environ.get("DBGTPU_ABLATE_SCALE"):
        import bench_scale

        unitigs, codes_all = bench_scale.workload()
        READ_LEN = bench_scale.READ_LEN
    else:
        unitigs, codes_all = bench.build_workload()
        READ_LEN = bench.READ_LEN
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import _bucket_len, _pmax_for, PMAX_CAP

    K, M, EFFORT = bench.K, bench.M, bench.EFFORT
    t0 = time.monotonic()
    g = build_graph_from_seqs(unitigs, K)
    di = build_device_index(g)
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    rec(phase="index", n_unitigs=len(unitigs),
        dt=time.monotonic() - t0)
    L = _bucket_len(READ_LEN, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP)
    N = codes_all.shape[0]

    def make_inputs(B):
        nb = N // B
        pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
        cs = np.stack([
            np.concatenate([codes_all[i * B:(i + 1) * B], pad], axis=1)
            for i in range(nb)
        ])
        cs = jax.device_put(cs, dev)                  # [nb, B, L]
        nm = jax.device_put(np.zeros((B, L), bool), dev)
        lens = jax.device_put(np.full(B, READ_LEN, np.int32), dev)
        jax.block_until_ready((cs, nm, lens))
        return cs, nm, lens

    floors = {}

    def timed(label, body_fn, inputs, extra=None):
        """body_fn(ix, c [B, L], nm, lens) -> scalar; runs lax.map over
        the stacked batches in ONE dispatch per rep.  `ix` travels as a
        jit ARGUMENT — a closure-captured index becomes an HLO constant
        and the multi-hundred-MB proto blows the remote compile
        endpoint's request limit at 1M unitigs."""
        cs, nm, lens = inputs
        nb = cs.shape[0]

        @jax.jit
        def whole(ix, cs, nm, lens):
            return jnp.sum(
                jax.lax.map(lambda c: body_fn(ix, c, nm, lens), cs)
            )

        t0 = time.monotonic()
        np.asarray(whole(ix, cs, nm, lens))
        warm = time.monotonic() - t0
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            out = np.asarray(whole(ix, cs, nm, lens))
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        per_batch = med / nb * 1e3
        row = dict(phase=label, compile_s=round(warm, 1),
                   per_batch_ms=round(per_batch, 2),
                   reads_per_s=round(N / med), **(extra or {}))
        key = cs.shape[1]
        if label.endswith("null"):
            floors[key] = med
        elif key in floors:
            row["per_batch_minus_null_ms"] = round(
                (med - floors[key]) / nb * 1e3, 2
            )
        rec(**row)

    inputs32 = make_inputs(32768)

    for ab in ("null", "images", "kmers", "member", "scan", "all"):
        def fab(ix, c, nm, lens, _ab=ab):
            r = align_batch.__wrapped__(
                ix, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=PMAX,
                ablate=_ab,
            )
            return jnp.sum(r["status"]) + (
                jnp.sum(r["paths"]) if "paths" in r else 0
            )

        timed(f"ablate_{ab}", fab, inputs32)

    # stage1_iters sweep (opt-in: r3 already established 6)
    for s1 in ((0, 4, 6, 8, 12)
               if os.environ.get("DBGTPU_ABLATE_STAGE1") else []):
        def fs(ix, c, nm, lens, _s1=s1):
            r = align_batch.__wrapped__(
                ix, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=PMAX,
                stage1_iters=_s1,
            )
            return jnp.sum(r["status"]) + jnp.sum(r["paths"])

        timed(f"stage1_{s1}", fs, inputs32)

    # batch-size scaling
    for B in ([] if os.environ.get('DBGTPU_ABLATE_ONLY')
              else (8192, 16384, 65536, 131072)):
        try:
            inp = make_inputs(B)

            def fb(ix, c, nm, lens):
                r = align_batch.__wrapped__(
                    ix, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=PMAX,
                )
                return jnp.sum(r["status"]) + jnp.sum(r["paths"])

            timed(f"batch_{B}", fb, inp, extra={"B": B})
        except Exception as e:
            rec(phase=f"batch_{B}", error=str(e))

    rec(phase="done")


if __name__ == "__main__":
    main()
