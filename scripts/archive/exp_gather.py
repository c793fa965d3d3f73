"""Micro-bench: gather shapes on TPU v5e to build a cost model."""
import sys
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import timeit

import jax
import jax.numpy as jnp
import numpy as np
import functools

dev = jax.devices()[0]
rng = np.random.default_rng(0)

N = 1 << 17          # table rows
B = 32768


def bench_gather(row_w, label, n=N, b=B, reps=5):
    tbl = jax.device_put(
        np.arange(n * row_w, dtype=np.uint32).reshape(n, row_w), dev)
    idx = jax.device_put(
        rng.integers(0, n, size=b).astype(np.int32), dev)

    @jax.jit
    def f(tbl, idx):
        g = tbl[idx]                       # [b, row_w]
        return jnp.sum(g, dtype=jnp.uint32)

    def run():
        return np.asarray(f(tbl, idx))
    med = timeit(run, reps=reps, label=label)
    vol = b * row_w * 4
    print(f"    {vol/1e6:.1f} MB gathered -> {vol/med/1e9:.1f} GB/s",
          flush=True)


bench_gather(1, "gather [B] from [N,1]")
bench_gather(4, "gather [B,4] from [N,4]")
bench_gather(8, "gather [B,8] from [N,8]")
bench_gather(16, "gather [B,16] from [N,16]")
bench_gather(32, "gather [B,32] from [N,32]")
bench_gather(128, "gather [B,128] from [N,128]")
bench_gather(256, "gather [B,256] from [N,256]")

# 2D index gather as in the engine: [B,4] indices into [N,16] rows
tbl = jax.device_put(
    np.arange(N * 16, dtype=np.uint32).reshape(N, 16), dev)
idx2 = jax.device_put(rng.integers(0, N, size=(B, 4)).astype(np.int32), dev)

@jax.jit
def f2(tbl, idx2):
    g = tbl[idx2]                          # [B,4,16]
    return jnp.sum(g, dtype=jnp.uint32)

timeit(lambda: np.asarray(f2(tbl, idx2)), reps=5, label="gather [B,4,16] from [N,16]")

# take_along_axis within rows: [B, L] -> [B, S] per-row dynamic cols
L, S = 128, 70
a = jax.device_put(rng.integers(0, 4, size=(B, L)).astype(np.uint32), dev)
cols = jax.device_put(rng.integers(0, L, size=(B, S)).astype(np.int32), dev)

@jax.jit
def f3(a, cols):
    g = jnp.take_along_axis(a, cols, axis=1)
    return jnp.sum(g, dtype=jnp.uint32)

timeit(lambda: np.asarray(f3(a, cols)), reps=5, label="take_along_axis [B,128]->[B,70]")

# scatter: state.at[Bidx, li].set as in the engine
P = 128
buf = jax.device_put(np.zeros((B, P), np.int32), dev)
li = jax.device_put(rng.integers(0, P, size=B).astype(np.int32), dev)
Bidx = jnp.arange(B, dtype=jnp.int32)
vals = jax.device_put(rng.integers(0, 100, size=B).astype(np.int32), dev)

@jax.jit
def f4(buf, li, vals):
    out = buf.at[Bidx, li].set(vals)
    return jnp.sum(out)

timeit(lambda: np.asarray(f4(buf, li, vals)), reps=5, label="scatter [B] into [B,128]")

# one-hot matmul scatter alternative
@jax.jit
def f5(buf, li, vals):
    onehot = (jnp.arange(P, dtype=jnp.int32)[None, :] == li[:, None])
    out = jnp.where(onehot, vals[:, None], buf)
    return jnp.sum(out)

timeit(lambda: np.asarray(f5(buf, li, vals)), reps=5, label="where-onehot into [B,128]")
