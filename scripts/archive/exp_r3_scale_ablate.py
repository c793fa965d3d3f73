"""Stage breakdown at 1M unitigs: where does the 830k -> 210k reads/s
gap come from?  Single-dispatch ablates (kmers/member/scan/all) against
the 1M-unitig index, plus the same with the probe table stripped.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r3_scale_ablate.jsonl", "a")


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

    sys.argv = [sys.argv[0]]
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench_scale",
        pathlib.Path(__file__).parent / "bench_scale.py",
    )
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)

    unitigs, codes_all = bs.workload()
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import PMAX_CAP, _bucket_len, _pmax_for

    K, M, EFFORT = bs.K, bs.M, bs.EFFORT
    g = build_graph_from_seqs(unitigs, K)
    t0 = time.monotonic()
    di = build_device_index(g)
    rec(phase="index_build", dt=time.monotonic() - t0)
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    L = _bucket_len(bs.READ_LEN, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP)
    B = 32768
    N = codes_all.shape[0]
    nbatch = N // B
    pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
    nm = jax.device_put(np.zeros((B, L), bool), dev)
    lens = jax.device_put(np.full(B, bs.READ_LEN, np.int32), dev)
    cs = [
        jax.device_put(np.concatenate(
            [codes_all[i * B:(i + 1) * B], pad], axis=1), dev)
        for i in range(nbatch)
    ]
    jax.block_until_ready(cs)

    ix_np = ix._replace(pt_rows=jnp.zeros((0, 32), jnp.uint32))

    @functools.partial(jax.jit, static_argnames=("ab",))
    def f(ixx, c, nm, lens, *, ab):
        # index passed as an argument: a closure would embed it as
        # program constants (HTTP 413 on the remote compile at 1 GB)
        r = align_batch.__wrapped__(
            ixx, c, nm, lens, k=K, m=M, effort=EFFORT, pmax=PMAX,
            ablate=ab,
        )
        return jnp.sum(r["status"]) + (
            jnp.sum(r["paths"]) if "paths" in r else 0
        )

    def timed(label, ixx, ab):
        t0 = time.monotonic()
        np.asarray(f(ixx, cs[0], nm, lens, ab=ab))
        warm = time.monotonic() - t0
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            outs = [f(ixx, c, nm, lens, ab=ab) for c in cs]
            for o in outs:
                np.asarray(o)
            ts.append(time.monotonic() - t0)
        med = sorted(ts)[len(ts) // 2]
        rec(phase=label, compile_s=round(warm, 1),
            per_batch_ms=round(med / nbatch * 1e3, 1),
            reads_per_s=round(N / med))

    for ab in ("kmers", "member", "scan", "all"):
        timed(f"p3_{ab}", ix, ab)
    for ab in ("member", "all"):
        timed(f"noprobe_{ab}", ix_np, ab)
    rec(phase="done")


if __name__ == "__main__":
    main()
