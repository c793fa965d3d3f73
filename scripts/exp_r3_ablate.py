"""Single-dispatch ablate profiling of the mapping step: each variant
is ONE jitted program returning one scalar, so stage costs are not
polluted by multi-dispatch/sync overhead.  Also batch-size scaling.
"""

from __future__ import annotations

import functools
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

    unitigs, codes_all = bench.build_workload()
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import _bucket_len, _pmax_for, PMAX_CAP

    K, M, EFFORT = bench.K, bench.M, bench.EFFORT
    g = build_graph_from_seqs(unitigs, K)
    di = build_device_index(g)
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    L = _bucket_len(bench.READ_LEN, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP)
    N = codes_all.shape[0]

    def make_inputs(B):
        nb = N // B
        pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
        nm = jax.device_put(np.zeros((B, L), bool), dev)
        lens = jax.device_put(np.full(B, bench.READ_LEN, np.int32), dev)
        cs = [
            jax.device_put(np.concatenate(
                [codes_all[i * B:(i + 1) * B], pad], axis=1), dev)
            for i in range(nb)
        ]
        jax.block_until_ready((cs, nm, lens))
        return cs, nm, lens

    def timed(label, fn, inputs, extra=None):
        cs, nm, lens = inputs
        t0 = time.monotonic()
        np.asarray(fn(cs[0], nm, lens))
        warm = time.monotonic() - t0
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            outs = [fn(c, nm, lens) for c in cs]
            for o in outs:
                np.asarray(o)
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        rec(phase=label, compile_s=round(warm, 1),
            per_batch_ms=round(med / len(cs) * 1e3, 1),
            reads_per_s=round(N / med), **(extra or {}))

    inputs32 = make_inputs(32768)

    for ab in ("null", "images", "kmers", "member", "scan", "all"):
        @functools.partial(jax.jit, static_argnames=())
        def fab(c, nm, lens, _ab=ab):
            r = align_batch.__wrapped__(
                ix, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=PMAX,
                ablate=_ab,
            )
            return jnp.sum(r["status"]) + (
                jnp.sum(r["paths"]) if "paths" in r else 0
            )

        timed(f"ablate_{ab}", fab, inputs32)

    # stage1_iters sweep
    for s1 in ([] if os.environ.get("DBGTPU_ABLATE_ONLY") else (0, 4, 6, 8, 12)):
        @functools.partial(jax.jit, static_argnames=())
        def fs(c, nm, lens, _s1=s1):
            r = align_batch.__wrapped__(
                ix, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=PMAX,
                stage1_iters=_s1,
            )
            return jnp.sum(r["status"]) + jnp.sum(r["paths"])

        timed(f"stage1_{s1}", fs, inputs32)

    # batch-size scaling
    for B in ([] if os.environ.get('DBGTPU_ABLATE_ONLY') else (65536, 131072)):
        try:
            inp = make_inputs(B)

            @functools.partial(jax.jit, static_argnames=())
            def fb(c, nm, lens):
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
