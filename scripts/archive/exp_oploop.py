"""Per-op cost inside a single program: fori_loop(REPS) around each op,
with data-dependent carry to defeat CSE/hoisting.  Subtract the empty-
loop baseline and divide by REPS."""
import sys
sys.path.insert(0, "/root/repo/scripts")
from _benchlib import timeit

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

dev = jax.devices()[0]
rng = np.random.default_rng(0)

B = 32768
REPS = 128
NB = 1 << 15     # junction table buckets
U = 30_694       # unitigs + sentinel
PW = 190_000     # pool words
L = 128
Lk = 70
W = 10

tbl_khi = jax.device_put(rng.integers(0, 1 << 32, size=(NB, 4), dtype=np.uint64).astype(np.uint32), dev)
tbl_klo = jax.device_put(rng.integers(0, 1 << 32, size=(NB, 4), dtype=np.uint64).astype(np.uint32), dev)
tbl_vals = jax.device_put(rng.integers(0, U, size=(NB * 4, 8)).astype(np.int32), dev)
pool = jax.device_put(rng.integers(0, 1 << 32, size=PW, dtype=np.uint64).astype(np.uint32), dev)
uarr = jax.device_put(rng.integers(0, 1 << 32, size=U, dtype=np.uint64).astype(np.uint32), dev)
rw = jax.device_put(rng.integers(0, 1 << 32, size=(B, W), dtype=np.uint64).astype(np.uint32), dev)
q0 = jax.device_put(rng.integers(0, 1 << 32, size=B, dtype=np.uint64).astype(np.uint32), dev)
qs = jax.device_put(rng.integers(0, 1 << 32, size=(B, Lk), dtype=np.uint64).astype(np.uint32), dev)

MASK_NB = np.uint32(NB - 1)
MASK_U = np.int32(U - 1)


def loopbench(label, body, carry0, reps=REPS):
    @jax.jit
    def f(c0):
        return jax.lax.fori_loop(0, reps, body, c0)

    def run():
        out = f(carry0)
        return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    med = timeit(run, reps=3, label=label)
    return med


def mix(x):
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


# 0) empty loop (carry passthrough with minimal op)
base = loopbench("empty loop [B] mix", lambda i, c: mix(c), q0)

# 1) hash + row gather [B,4] from [NB,4] x2 arrays (one hash fn of _ht_find)
def b1(i, c):
    bkt = (mix(c) & MASK_NB).astype(jnp.int32)
    rk = tbl_khi[bkt]
    rl = tbl_klo[bkt]
    return c + jnp.sum(rk ^ rl, axis=1)
t1 = loopbench("ht one-choice: 2x gather [B,4] rows", b1, q0)

# 2) vals gather [B,8]
def b2(i, c):
    s = (mix(c).astype(jnp.int32)) & jnp.int32(NB * 4 - 1)
    v = tbl_vals[s]
    return c + jnp.sum(v, axis=1).astype(jnp.uint32)
t2 = loopbench("vals gather [B,8] rows", b2, q0)

# 3) 1D gather [B,4] from [U]
def b3(i, c):
    idx = (mix(c)[:, None] + jnp.arange(4, dtype=jnp.uint32)[None, :]).astype(jnp.int32) & MASK_U
    v = uarr[idx]
    return c + jnp.sum(v, axis=1)
t3 = loopbench("1D gather [B,4] from [U]", b3, q0)

# 4) pool window gather [B,4,11] from [PW]
def b4(i, c):
    p = (mix(c)[:, None].astype(jnp.int32) & jnp.int32(1 << 14)) + jnp.arange(4, dtype=jnp.int32)[None, :] * 100
    w = p[:, :, None] + jnp.arange(11, dtype=jnp.int32)[None, None, :]
    v = pool[jnp.clip(w, 0, PW - 1)]
    return c + jnp.sum(v, axis=(1, 2))
t4 = loopbench("pool gather [B,4,11] from [PW]", b4, q0)

# 5) take_along_axis [B,1,W] -> [B,4,11]
def b5(i, c):
    p = (mix(c)[:, None].astype(jnp.int32) & jnp.int32(3)) + jnp.arange(4, dtype=jnp.int32)[None, :]
    w = jnp.clip(p[:, :, None] + jnp.arange(11, dtype=jnp.int32)[None, None, :], 0, W - 1)
    v = jnp.take_along_axis(rw[:, None, :], w, axis=2)
    return c + jnp.sum(v, axis=(1, 2))
t5 = loopbench("take_along [B,4,11] from own row", b5, q0)

# 6) VPU compare block: xor, shifts, popcount on [B,4,10]
x0 = jax.device_put(rng.integers(0, 1 << 32, size=(B, 4, 10), dtype=np.uint64).astype(np.uint32), dev)
def b6(i, c):
    a = x0 ^ c[:, None, None]
    m = ((a | (a >> 1)) & jnp.uint32(0x55555555))
    s = jnp.sum(jax.lax.population_count(m), axis=(1, 2))
    return c + s
t6 = loopbench("VPU xor+popcount [B,4,10]", b6, q0)

# 7) scatter [B] into [B,128]
buf0 = jax.device_put(np.zeros((B, L), np.int32), dev)
Bidx = jnp.arange(B, dtype=jnp.int32)
def b7(i, c):
    li = (c & jnp.uint32(L - 1)).astype(jnp.int32)
    nb = c[0].astype(jnp.int32)
    buf = buf0.at[Bidx, li].set(nb)
    return c + buf[:, 0].astype(jnp.uint32)
t7 = loopbench("scatter [B] into [B,128]", b7, q0)

# 8) ht_find on [B,70] scan (setup cost, one hash fn)
def b8(i, c):
    q = qs ^ c[:, None]
    bkt = (mix(q) & MASK_NB).astype(jnp.int32)
    rk = tbl_khi[bkt]          # [B,70,4]
    rl = tbl_klo[bkt]
    hit = jnp.any(rk == rl, axis=-1)
    return c + jnp.sum(hit, axis=1).astype(jnp.uint32)
t8 = loopbench("scan ht: 2x gather [B,70,4]", b8, q0, reps=16)

# 9) cumsum + argmax selection over [B,70]
mem = jax.device_put(rng.integers(0, 2, size=(B, Lk)).astype(bool), dev)
def b9(i, c):
    m = mem ^ (c[:, None] > 0)
    cum = jnp.cumsum(m.astype(jnp.int32), axis=1)
    tot = jnp.uint32(0)
    for e in range(2):
        hit = (cum == e + 1) & m
        idx = jnp.argmax(hit, axis=1)
        tot = tot + idx.astype(jnp.uint32)
    return c + tot
t9 = loopbench("cumsum+argmax x2 [B,70]", b9, q0, reps=16)

print("\nper-iteration costs (ms), baseline-subtracted:")
for lbl, t, r in [("ht 2x[B,4]", t1, REPS), ("vals [B,8]", t2, REPS),
                  ("1D [B,4]", t3, REPS), ("pool [B,4,11]", t4, REPS),
                  ("take_along", t5, REPS), ("vpu popcount", t6, REPS),
                  ("scatter", t7, REPS), ("scan-ht", t8, 16),
                  ("cumsum-argmax", t9, 16)]:
    print(f"  {lbl}: {(t - base * (r / REPS)) / r * 1e3:.3f}")
