"""H2D latency shape: 3 small arrays vs 1 fused array, and the warm
e2e with native batch packing."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r3_h2d.jsonl", "a")


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
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    rec(phase="warmup", dt=time.monotonic() - t0)

    B = 32768
    words = np.random.randint(0, 2**31, (B, 7), np.int64).astype(np.uint32)
    nmbits = np.random.randint(0, 2**31, (B, 4), np.int64).astype(np.uint32)
    lens = np.full(B, 100, np.int32)
    fusedin = np.concatenate(
        [words, nmbits, lens[:, None].view(np.uint32)], axis=1
    )
    for _ in range(2):   # warm both paths
        jax.block_until_ready(jax.device_put(words, dev))
        jax.block_until_ready(jax.device_put(fusedin, dev))
    for label, fn in (
        ("h2d_3arrays", lambda: jax.block_until_ready((
            jax.device_put(words, dev), jax.device_put(nmbits, dev),
            jax.device_put(lens, dev)))),
        ("h2d_1fused", lambda: jax.block_until_ready(
            jax.device_put(fusedin, dev))),
    ):
        ts = []
        for _ in range(5):
            t0 = time.monotonic()
            fn()
            ts.append(time.monotonic() - t0)
        rec(phase=label, ms=round(sorted(ts)[2] * 1e3, 1))

    # warm e2e with native pack
    import tempfile

    import bench
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.pipeline import run_pipeline

    unitigs, codes_all = bench.build_workload()
    n_reads = codes_all.shape[0]
    g = build_graph_from_seqs(unitigs, bench.K)
    g._device_index = build_device_index(g)
    td = tempfile.mkdtemp()
    uf = os.path.join(td, "unitig.fa")
    rf = os.path.join(td, "reads.fa")
    with open(uf, "wb") as f:
        for i, u in enumerate(unitigs):
            s = u if isinstance(u, bytes) else bytes(u)
            f.write(b">" + str(i).encode() + b"\n" + s + b"\n")
    chars = np.frombuffer(b"ACGT", np.uint8)
    with open(rf, "wb") as f:
        rows = chars[codes_all]
        f.write(b"".join(
            b">r%d\n" % i + r.tobytes() + b"\n"
            for i, r in enumerate(rows)
        ))
    for it in range(3):
        t0 = time.monotonic()
        paths, na, st = run_pipeline(
            [rf], uf, k=bench.K, m=bench.M, effort=bench.EFFORT,
            impl="jax", batch_size=32768, graph=g,
        )
        dt = time.monotonic() - t0
        rec(phase="e2e_warm_nativepack", iter=it, dt=dt,
            reads_per_s=round(n_reads / dt), aligned=st.aligned)
    rec(phase="done")


if __name__ == "__main__":
    main()
