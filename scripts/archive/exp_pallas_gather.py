"""Can Mosaic do fast dynamic gathers from a VMEM-resident table?"""
import sys
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import timeit

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dev = jax.devices()[0]
rng = np.random.default_rng(0)

NB = 1 << 15
ROWW = 16
B = 32768
TILE = 2048
REPS = 8  # inner repeats to amortize

tbl = jax.device_put(
    rng.integers(0, 1 << 32, size=(NB, ROWW), dtype=np.uint64)
    .astype(np.uint32), dev)
idx = jax.device_put(rng.integers(0, NB, size=(B, 128)).astype(np.int32), dev)
# [B, 128] indices: 128 lookups per read-row to make it lane-shaped


def kernel(idx_ref, tbl_ref, out_ref):
    def body(r, acc):
        ii = idx_ref[:, :] ^ (r.astype(jnp.int32) & 0)  # defeat hoisting? no-op xor
        # vector gather attempt: take rows of tbl for a [TILE,128] index
        g = tbl_ref[ii]     # -> [TILE, 128, ROWW] ??
        return acc + jnp.sum(g.astype(jnp.uint32), axis=(1, 2))
    acc = jnp.zeros((TILE,), jnp.uint32)
    acc = jax.lax.fori_loop(0, REPS, body, acc)
    out_ref[:, 0] = acc


try:
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((TILE, 1), jnp.uint32),
        grid=(B // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, ROWW), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    jf = jax.jit(lambda idx, tbl: f(idx, tbl))
    out = np.asarray(jf(idx, tbl))
    print("3D gather in pallas works, out[0]=", out[0])
    med = timeit(lambda: np.asarray(jf(idx, tbl)), reps=3,
                 label="pallas vmem gather [B,128]->rows16 x8reps")
    rows = B * 128 * REPS
    print(f"  -> {rows/med/1e6:.0f}M rows/s")
except Exception as e:
    print("FAIL 3D gather:", type(e).__name__, str(e)[:500])


# attempt 2: 1D table element gather via take
tbl1 = jax.device_put(
    rng.integers(0, 1 << 32, size=(NB,), dtype=np.uint64).astype(np.uint32),
    dev)


def kernel2(idx_ref, tbl_ref, out_ref):
    def body(r, acc):
        ii = idx_ref[:, :]
        g = jnp.take(tbl_ref[:], ii, axis=0)   # [TILE,128] elements
        return acc + jnp.sum(g, axis=1)
    acc = jnp.zeros((TILE,), jnp.uint32)
    acc = jax.lax.fori_loop(0, REPS, body, acc)
    out_ref[:, 0] = acc


try:
    f2 = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((TILE, 1), jnp.uint32),
        grid=(B // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NB,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    jf2 = jax.jit(lambda idx, tbl: f2(idx, tbl))
    out = np.asarray(jf2(idx, tbl1))
    print("1D element take works, out[0]=", out[0])
    med = timeit(lambda: np.asarray(jf2(idx, tbl1)), reps=3,
                 label="pallas vmem take [B,128] elements x8")
    rows = B * 128 * REPS
    print(f"  -> {rows/med/1e6:.0f}M elems/s")
except Exception as e:
    print("FAIL 1D take:", type(e).__name__, str(e)[:500])
