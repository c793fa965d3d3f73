"""First-execution cost per program variant on the axon platform:
scan-only (no while loop), single uncapped loop (stage1_iters=0),
staged 3-loop (default), capped loop.  Identifies which structure the
remote compile spends its minutes on."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("B", 32768))
L = 100
K = 31
VARIANTS = os.environ.get("VARIANTS", "scan,single,staged").split(",")


def main():
    import jax

    if os.environ.get("CACHE", "1") != "0":
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dbgtpu_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

    from tests import synth
    from dbgtpu.index.build import build_graph_from_seqs
    from dbgtpu.index.device import build_device_index
    from dbgtpu.engine.core import align_batch, index_to_device

    rng = np.random.default_rng(1)
    genome = synth.make_genome(rng, 200_000)
    unitigs = synth.chop_unitigs(genome, K, rng, 40, 150)
    g = build_graph_from_seqs(unitigs, K)
    di = build_device_index(g)
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    print("index on device", flush=True)

    codes = np.zeros((B, L), np.uint8)
    nm = np.zeros((B, L), bool)
    lens = np.full(B, L, np.int32)

    def variant_kwargs(name):
        if name == "scan":
            return dict(ablate="scan")
        if name == "single":
            return dict(stage1_iters=0)
        if name == "staged":
            return dict()
        if name == "capped":
            return dict(max_iters=24, stage1_iters=0)
        raise ValueError(name)

    for name in VARIANTS:
        kw = variant_kwargs(name)
        t0 = time.monotonic()
        out = align_batch(
            ix, codes, nm, lens, k=K, m=2, effort=2, **kw
        )
        s = np.asarray(out["status"])
        dt = time.monotonic() - t0
        print(f"{name}: compile+first exec {dt:.1f}s", flush=True)
        t0 = time.monotonic()
        out = align_batch(
            ix, codes, nm, lens, k=K, m=2, effort=2, **kw
        )
        s = np.asarray(out["status"])
        print(f"{name}: steady {time.monotonic() - t0 :.3f}s", flush=True)


if __name__ == "__main__":
    main()
