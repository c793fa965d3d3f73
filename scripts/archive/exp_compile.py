"""Measure trace vs XLA-compile time of align_batch at bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("B", 32768))
L = int(os.environ.get("L", 100))
K = 31


def main():
    import jax

    if os.environ.get("CACHE"):
        jax.config.update("jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tests import synth
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import align_batch, index_to_device

    rng = np.random.default_rng(1)
    genome = synth.make_genome(rng, 200_000)
    unitigs = synth.chop_unitigs(genome, K, rng, 40, 150)
    g = build_graph_from_seqs(unitigs, K)
    di = build_device_index(g)
    print("index built", flush=True)
    ix = index_to_device(di)
    import jax as _j; _j.block_until_ready(ix)
    print("H2D done", flush=True)

    codes = np.zeros((B, L), np.uint8)
    nm = np.zeros((B, L), bool)
    lens = np.full(B, L, np.int32)

    f = align_batch.__wrapped__  # un-jitted
    jf = jax.jit(
        f,
        static_argnames=(
            "k", "m", "effort", "max_iters", "pmax", "stage1_iters",
            "ablate",
        ),
    )
    t0 = time.monotonic()
    lowered = jf.lower(ix, codes, nm, lens, k=K, m=2, effort=2, pmax=0)
    t_trace = time.monotonic() - t0
    print(f"trace+lower: {t_trace:.1f}s", flush=True)
    hlo = lowered.as_text()
    print(f"stableHLO text size: {len(hlo)/1e6:.1f} MB, "
          f"{hlo.count(chr(10))} lines", flush=True)
    t0 = time.monotonic()
    compiled = lowered.compile()
    t_comp = time.monotonic() - t0
    print(f"XLA compile: {t_comp:.1f}s", flush=True)
    t0 = time.monotonic()
    out = compiled(ix, codes, nm, lens)
    np.asarray(out["status"])
    print(f"first run: {time.monotonic() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
