"""Round-5 Pallas member-stage attempt (VERDICT r4 item 7).

The member stage is row gathers into the closure probe table (96 B
rows, ~12 MB at survey scale); the telescoped split (exp_r5_split)
measures it at 151M rows/s inside the mapping step, vs 185M rows/s
for a standalone XLA gather on the same geometry.  Question: can a
Pallas kernel — scalar-prefetched indices driving the pipeline's own
double-buffered HBM->VMEM row DMA — exceed XLA's gather emitter on
this access pattern?

Kernels measured, all on the real probe-table geometry:
  A. pallas row-per-step: grid=(N/G, ), block (G, W) rows selected by
     prefetched indices via BlockSpec index_map (the canonical
     PrefetchScalarGridSpec gather), G=1 row per grid step.
  B. same with the whole TABLE resident in VMEM and per-row dynamic
     slices inside a kernel loop (table fits: 12 MB < ~16 MB VMEM).
  C. XLA baseline: tbl[idx] gather, identical shapes.

Each timed with the in-dispatch fori differencing (T(R)-T(1)).
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

from _benchlib import load_workload  # noqa: F401  (path setup)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed_ms(fn, label, R=5):
    np.asarray(fn(1))
    times = {}
    for reps in (1, R):
        np.asarray(fn(reps))
        t0 = time.monotonic()
        np.asarray(fn(reps))
        times[reps] = time.monotonic() - t0
    ms = (times[R] - times[1]) / (R - 1) * 1e3
    print(f"{label:<34} {ms:8.2f} ms", flush=True)
    return ms


def main():
    dev = jax.devices()[0]
    t0 = time.monotonic()
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    print(f"warmup {time.monotonic()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(7)
    NB = 1 << 17          # buckets (survey probe table ~2^17 x 24 cols)
    W = 24
    N = 917504            # gathers per 32k batch in the member stage
    tbl = jnp.asarray(rng.integers(0, 2**31, (NB, W), np.int64)
                      .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, NB, N).astype(np.int32))
    jax.block_until_ready((tbl, idx))
    print(f"table {tbl.nbytes>>20} MB, {N} gathers", flush=True)

    # ---- C: XLA gather baseline ----
    @functools.partial(jax.jit, static_argnames=("reps",))
    def xla_gather(tbl, idx, *, reps):
        def body(i, acc):
            rows = tbl[jnp.roll(idx, i)]
            return acc + jnp.sum(rows, dtype=jnp.uint32)
        return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

    ms = timed_ms(lambda r: xla_gather(tbl, idx, reps=r), "XLA gather")
    print(f"  -> {N/ms/1e3:.0f}M rows/s", flush=True)

    # ---- A: pallas pipelined row DMA (G rows per grid step) ----
    for G in (1, 8):
        def kern(idx_ref, tbl_blk, out_blk):
            out_blk[...] = tbl_blk[...]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // G,),
            in_specs=[
                pl.BlockSpec((G, W), lambda i, idx_ref: (idx_ref[i], 0)),
            ],
            out_specs=pl.BlockSpec((G, W), lambda i, idx_ref: (i, 0)),
        )
        try:
            call = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((N // G, W), jnp.uint32),
                grid_spec=grid_spec,
            )

            @functools.partial(jax.jit, static_argnames=("reps",))
            def pallas_rows(tbl, idxg, *, reps, _call=call, _G=G):
                def body(i, acc):
                    rows = _call(jnp.roll(idxg, i), tbl)
                    return acc + jnp.sum(rows, dtype=jnp.uint32)
                return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

            # for G>1 treat idx as block ids (G consecutive rows); the
            # DMA count is N/G — an upper bound on what blocking buys
            idxg = (idx[: N // G] % (NB // max(G, 1))).astype(np.int32)
            idxg = jnp.asarray(idxg)
            ms = timed_ms(
                lambda r: pallas_rows(tbl, idxg, reps=r),
                f"pallas row-DMA G={G}")
            print(f"  -> {N//G/ms/1e3:.0f}M DMAs/s "
                  f"({N/ms/1e3:.0f}M rows-equiv/s)", flush=True)
        except Exception as e:
            print(f"pallas G={G} failed: {type(e).__name__}: {e}",
                  flush=True)

    # ---- B: table resident in VMEM, per-row loop in kernel ----
    CH = 4096             # rows handled per grid step

    def kern_vmem(idx_ref, tbl_ref, out_ref):
        j = pl.program_id(0)

        def body(t, acc):
            r = idx_ref[j * CH + t]
            acc = acc + jnp.sum(tbl_ref[r, :], dtype=jnp.uint32)
            return acc
        out_ref[0, 0] = jax.lax.fori_loop(0, CH, body, jnp.uint32(0))

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // CH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, idx_ref: (i, 0)),
    )
    try:
        call2 = pl.pallas_call(
            kern_vmem,
            out_shape=jax.ShapeDtypeStruct((N // CH, 1), jnp.uint32),
            grid_spec=grid_spec2,
        )

        @functools.partial(jax.jit, static_argnames=("reps",))
        def pallas_vmem(tbl, idx, *, reps):
            def body(i, acc):
                s = call2(jnp.roll(idx, i), tbl)
                return acc + jnp.sum(s, dtype=jnp.uint32)
            return jax.lax.fori_loop(0, reps, body, jnp.uint32(0))

        ms = timed_ms(lambda r: pallas_vmem(tbl, idx, reps=r),
                      "pallas VMEM-resident loop")
        print(f"  -> {N/ms/1e3:.0f}M rows/s", flush=True)
    except Exception as e:
        print(f"pallas VMEM failed: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
