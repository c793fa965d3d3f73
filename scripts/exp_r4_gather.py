"""Row-gather rate vs table geometry at large-graph sizes.

The 1M-unitig stage split shows the walk's junction/umeta gathers
dominate (55 of 68 ms per 32k batch), and rates measured so far
suggest a strong dependence on table footprint (12 MB -> 150M rows/s,
64 MB -> 61M).  This maps the surface: for tables of (rows, width)
covering the real artifacts' shapes, time `reps` rounds of a [Q]-index
row gather + row-sum inside ONE dispatch (indices re-derived from the
round counter so nothing hoists), and report rows/s.

Geometries mirror: st_fused at 1M (131k x 320 int32), a hypothetical
split key table (131k x 64), slot-val rows (4.2M x 8), umeta at 1M
(1M x 36), umeta without embedded seq (1M x 16), probe w3 at 1M
(2M x 96... capped), and small-graph references.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = open("/tmp/r4_gather.jsonl", "a")


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
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    rec(phase="warmup")

    Q = 1 << 20          # gathered rows per round (~walk rows/step x B)
    REPS = 8

    @functools.partial(jax.jit, static_argnames=("reps", "nrows"))
    def bench_tbl(tbl, base_idx, *, reps, nrows):
        def body(i, acc):
            idx = (base_idx * (i + 1) + i) % nrows       # round-varying
            rows = tbl[idx]
            return acc + jnp.sum(rows.astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    rng = np.random.default_rng(0)
    base = jax.device_put(
        rng.integers(0, 1 << 30, Q).astype(np.int32), dev
    )

    if os.environ.get("DBGTPU_GATHER_WIDTHS"):
        # width sweep at 1M rows: is the 4x rate spread between the
        # 36-col umeta (22M rows/s) and the 96-col probe rows (94M)
        # a width/alignment effect?
        geoms = [(f"w{w}_1M", 1048576, w)
                 for w in (8, 16, 24, 32, 36, 40, 48, 64, 80, 96, 128)]
    else:
        geoms = [
            ("st_1M_fused", 131072, 320),
            ("st_1M_keysonly", 131072, 64),
            ("slotvals_1M", 4194304, 8),
            ("umeta_1M", 1048576, 36),
            ("umeta_1M_noseq", 1048576, 16),
            ("probe_w3_1M", 1048576, 96),
            ("st_30k_fused", 4096, 320),
            ("umeta_30k", 32768, 36),
            ("mid_16MB", 131072, 32),
            ("mid_64MB", 524288, 32),
        ]
    for name, nrows, width in geoms:
        tbl = jax.device_put(
            rng.integers(0, 255, (nrows, width), dtype=np.int32), dev
        )
        jax.block_until_ready(tbl)
        # warm
        np.asarray(bench_tbl(tbl, base, reps=1, nrows=nrows))
        np.asarray(bench_tbl(tbl, base, reps=REPS, nrows=nrows))
        ts = {}
        for reps in (1, REPS):
            t0 = time.monotonic()
            np.asarray(bench_tbl(tbl, base, reps=reps, nrows=nrows))
            ts[reps] = time.monotonic() - t0
        dt = (ts[REPS] - ts[1]) / (REPS - 1)
        rec(phase=name, rows=nrows, width_b=width * 4,
            table_mb=nrows * width * 4 >> 20,
            mrows_per_s=round(Q / dt / 1e6, 1),
            gb_per_s=round(Q * width * 4 / dt / 1e9, 1))
        del tbl
    rec(phase="done")


if __name__ == "__main__":
    main()
