"""Round-3 TPU phase profiler: one process, every measurement the round
needs (axon session warmup is per-process, ~3-10 min — amortize it).

Writes JSON lines to /tmp/r3_phase.jsonl:
  - platform init, tiny-program session warmup
  - dispatch overhead (sync / async), H2D + D2H bandwidth at 1/16/64 MB
  - index build phases (host) + index H2D
  - align_batch AOT split: trace/lower vs backend compile vs first exec
  - ablate step times (kmers / member / scan / full) -> mapping-step
    breakdown
  - steady-state step at B=32k and B=64k
  - drain-style D2H of the real result dict
  - align_bulk (runner path, numpy in) warm x2 with phase prints
  - run_pipeline warm e2e (graph + device index prebuilt)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r3_phase.jsonl", "a")


def rec(**kw):
    kw = {k: (round(v, 4) if isinstance(v, float) else v)
          for k, v in kw.items()}
    OUT.write(json.dumps(kw) + "\n")
    OUT.flush()
    print(kw, file=sys.stderr, flush=True)


def main():
    os.environ.setdefault("DBGTPU_TIMING", "1")
    t0 = time.monotonic()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    dev = jax.devices()[0]
    rec(phase="jax_init", dt=time.monotonic() - t0, platform=dev.platform)

    t0 = time.monotonic()
    x = jax.device_put(np.ones((8, 128), np.float32), dev)
    np.asarray(jax.jit(lambda a: a * 2 + 1)(x))
    rec(phase="session_warmup_tiny", dt=time.monotonic() - t0)

    f = jax.jit(lambda a: a + 1)
    x = jax.device_put(np.zeros((128,), np.int32), dev)
    np.asarray(f(x))
    t0 = time.monotonic()
    for _ in range(50):
        r = f(x)
    np.asarray(r)
    rec(phase="dispatch_50_nosync", dt=time.monotonic() - t0)
    t0 = time.monotonic()
    for _ in range(20):
        np.asarray(f(x))
    rec(phase="dispatch_20_sync", dt=time.monotonic() - t0)

    for mb in (1, 16, 64):
        a = np.random.default_rng(0).integers(
            0, 255, (mb << 20,), np.uint8
        )
        t0 = time.monotonic()
        d = jax.device_put(a, dev)
        jax.block_until_ready(d)
        h2d = time.monotonic() - t0
        t0 = time.monotonic()
        np.asarray(d)
        rec(phase="xfer", mb=mb, h2d=h2d, d2h=time.monotonic() - t0)

    # ---- workload + index ----
    import bench

    t0 = time.monotonic()
    unitigs, codes_all = bench.build_workload()
    rec(phase="workload", dt=time.monotonic() - t0,
        n_unitigs=len(unitigs), n_reads=int(codes_all.shape[0]))

    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import align_batch, index_to_device

    t0 = time.monotonic()
    g = build_graph_from_seqs(unitigs, bench.K)
    t1 = time.monotonic()
    di = build_device_index(g)
    t2 = time.monotonic()
    rec(phase="index_build", graph=t1 - t0, device_layout=t2 - t1)
    g._device_index = di

    t0 = time.monotonic()
    ix = jax.device_put(index_to_device(di), dev)
    jax.block_until_ready(ix)
    rec(phase="index_h2d", dt=time.monotonic() - t0,
        bytes=sum(int(np.asarray(a).nbytes) for a in ix))

    from dbgtpu.engine.runner import _bucket_len, _pmax_for

    K, M, EFFORT = bench.K, bench.M, bench.EFFORT
    L = _bucket_len(bench.READ_LEN, K)
    PMAX = _pmax_for(di, L)
    B = 32768
    n_reads = codes_all.shape[0]
    pad = np.zeros((B, L - codes_all.shape[1]), np.uint8)
    nm = np.zeros((B, L), bool)
    lens = np.full(B, bench.READ_LEN, np.int32)
    batches = [
        jax.device_put(
            np.concatenate(
                [codes_all[i * B : (i + 1) * B], pad], axis=1
            ), dev,
        )
        for i in range(n_reads // B)
    ]
    nm_d = jax.device_put(nm, dev)
    lens_d = jax.device_put(lens, dev)
    jax.block_until_ready((batches, nm_d, lens_d))

    # ---- AOT split: trace/lower vs compile vs first exec ----
    t0 = time.monotonic()
    lowered = align_batch.lower(
        ix, batches[0], nm_d, lens_d, k=K, m=M, effort=EFFORT, pmax=PMAX,
    )
    t1 = time.monotonic()
    compiled = lowered.compile()
    t2 = time.monotonic()
    r = compiled(ix, batches[0], nm_d, lens_d)
    np.asarray(r["status"])
    t3 = time.monotonic()
    rec(phase="aot_split", lower=t1 - t0, compile=t2 - t1,
        first_exec=t3 - t2)

    # ---- ablate breakdown (each pays its own compile; report exec) ----
    for ab in ("kmers", "member", "scan", "all"):
        t0 = time.monotonic()
        r = align_batch(
            ix, batches[0], nm_d, lens_d, k=K, m=M, effort=EFFORT,
            pmax=PMAX, ablate=ab,
        )
        np.asarray(r["status"])
        warm = time.monotonic() - t0
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            r = align_batch(
                ix, batches[0], nm_d, lens_d, k=K, m=M, effort=EFFORT,
                pmax=PMAX, ablate=ab,
            )
            np.asarray(r["status"])
            ts.append(time.monotonic() - t0)
        rec(phase="ablate", which=ab, compile_first=warm,
            exec_ms=round(1e3 * sorted(ts)[1], 1))

    # ---- steady state + D2H of the full result dict ----
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        outs = []
        for b in batches:
            r = align_batch(
                ix, b, nm_d, lens_d, k=K, m=M, effort=EFFORT, pmax=PMAX,
            )
            outs.append(r)
        for r in outs:
            np.asarray(r["status"])
        ts.append(time.monotonic() - t0)
    rec(phase="steady_b32k", dt=sorted(ts)[1],
        reads_per_s=round(n_reads / sorted(ts)[1]))

    t0 = time.monotonic()
    for r in outs:
        np.asarray(r["paths"])
        np.asarray(r["plen"])
        np.asarray(r["status"])
    rec(phase="drain_d2h_4batches", dt=time.monotonic() - t0,
        paths_bytes_per_batch=int(np.asarray(outs[0]["paths"]).nbytes))

    # ---- B=64k variant ----
    try:
        b64 = jax.device_put(
            np.concatenate([np.concatenate(
                [codes_all[:65536], np.zeros((65536, L - codes_all.shape[1]),
                                             np.uint8)], axis=1)]), dev)
        nm64 = jax.device_put(np.zeros((65536, L), bool), dev)
        lens64 = jax.device_put(
            np.full(65536, bench.READ_LEN, np.int32), dev)
        t0 = time.monotonic()
        r = align_batch(
            ix, b64, nm64, lens64, k=K, m=M, effort=EFFORT,
            pmax=PMAX,
        )
        np.asarray(r["status"])
        warm = time.monotonic() - t0
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            r = align_batch(
                ix, b64, nm64, lens64, k=K, m=M, effort=EFFORT, pmax=PMAX,
            )
            np.asarray(r["status"])
            ts.append(time.monotonic() - t0)
        rec(phase="steady_b64k", compile_first=warm, dt=sorted(ts)[1],
            reads_per_s=round(65536 / sorted(ts)[1]))
    except Exception as e:
        rec(phase="steady_b64k", error=f"{type(e).__name__}: {e}")

    # ---- runner path (numpy in, implicit H2D) ----
    import tempfile

    from dbgtpu import native
    from dbgtpu.engine.runner import align_bulk
    from dbgtpu.pipeline import run_pipeline

    td = tempfile.mkdtemp()
    uf = os.path.join(td, "unitig.fa")
    rf = os.path.join(td, "reads.fa")
    with open(uf, "wb") as fh:
        for i, u in enumerate(unitigs):
            s = u if isinstance(u, bytes) else bytes(u)
            fh.write(b">" + str(i).encode() + b"\n" + s + b"\n")
    chars = np.frombuffer(b"ACGT", np.uint8)
    with open(rf, "wb") as fh:
        hdrs = [f">r{i}\n".encode() for i in range(n_reads)]
        rows = chars[codes_all]
        fh.write(b"".join(
            h + r.tobytes() + b"\n" for h, r in zip(hdrs, rows)
        ))

    t0 = time.monotonic()
    parsed = native.parse_reads(rf, K, False)
    rec(phase="native_parse", dt=time.monotonic() - t0, n=parsed.n)

    for it in range(2):
        t0 = time.monotonic()
        status, path_off, flat = align_bulk(
            g, parsed, M, EFFORT, batch_size=B,
        )
        rec(phase="align_bulk", iter=it, dt=time.monotonic() - t0,
            aligned=int(((status == 1) | (status == 2)).sum()))

    for it in range(2):
        t0 = time.monotonic()
        paths, na, st = run_pipeline(
            [rf], uf, k=K, m=M, effort=EFFORT, impl="jax",
            batch_size=B, graph=g,
        )
        rec(phase="run_pipeline_warm", iter=it, dt=time.monotonic() - t0,
            reads_per_s=round(n_reads / (time.monotonic() - t0)),
            aligned=st.aligned, path_bytes=len(paths))

    rec(phase="done")


if __name__ == "__main__":
    main()
