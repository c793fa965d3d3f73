"""Bisect closure-scan cost on TPU. Usage: exp_scan.py <variant...>
Variants: prep gather w01 full old"""

import sys, os, time, pickle
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp
import bench as B
from dbgtpu.engine import core as C
from dbgtpu.engine.kmer32 import mix32, pair_le

with open('/tmp/di_bench.pkl', 'rb') as f:
    di = pickle.load(f)
_, codes = B.build_workload()
ix = C.index_to_device(di)
batch = 32768
cj = jax.device_put(codes[:batch].astype(np.uint8))
lj = jax.device_put(np.full(batch, B.READ_LEN, np.int32))
k1 = B.K - 1; L = B.READ_LEN; Lk = L - k1 + 1
J = (Lk + 3) // 4
pcols = [min(4 * j + 1, Lk - 1) for j in range(J)]


def timed(f, reps=3):
    np.asarray(jax.tree_util.tree_leaves(f())[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def prep(codes):
    codes32 = codes.astype(jnp.uint32)
    sh, sl = C._scan_kmer_pairs(codes32, k1, False)
    rh, rl = C._scan_kmer_pairs(codes32, k1, True)
    le = pair_le(sh, sl, rh, rl)
    return codes32, jnp.where(le, sh, rh), jnp.where(le, sl, rl), le


def at(arr, cols):
    return jnp.stack([arr[:, c] for c in cols], axis=1)


@jax.jit
def v_prep(codes, lens):
    codes32, ph, plo, le = prep(codes)
    return ph.sum(dtype=jnp.uint32) + plo.sum(dtype=jnp.uint32)


@jax.jit
def v_gather(codes, lens):
    codes32, ph, plo, le = prep(codes)
    qhi = at(ph, pcols); qlo = at(plo, pcols)
    b = (mix32(qhi ^ ix.pt_seed, qlo)
         & jnp.uint32(ix.pt_rows.shape[0] - 1)).astype(jnp.int32)
    return ix.pt_rows[b].sum(dtype=jnp.uint32)


@jax.jit
def v_w01(codes, lens):
    codes32, ph, plo, le = prep(codes)
    qhi = at(ph, pcols); qlo = at(plo, pcols)
    b = (mix32(qhi ^ ix.pt_seed, qlo)
         & jnp.uint32(ix.pt_rows.shape[0] - 1)).astype(jnp.int32)
    row = ix.pt_rows[b]
    ok = (row[..., 0:8] == qhi[..., None]) & (row[..., 8:16] == qlo[..., None])
    w0 = jnp.sum(jnp.where(ok, row[..., 16:24], jnp.uint32(0)), axis=-1,
                 dtype=jnp.uint32)
    w1 = jnp.sum(jnp.where(ok, row[..., 24:32], jnp.uint32(0)), axis=-1,
                 dtype=jnp.uint32)
    return w0.sum(dtype=jnp.uint32) + w1.sum(dtype=jnp.uint32)


@jax.jit
def v_full(codes, lens):
    codes32, ph, plo, le = prep(codes)
    return C._closure_member(ix, ph, plo, le, codes32, k1).sum()


@jax.jit
def v_old(codes, lens):
    codes32, ph, plo, le = prep(codes)
    return C._st_member(ix, ph, plo).sum()


V = dict(prep=v_prep, gather=v_gather, w01=v_w01, full=v_full, old=v_old)
for name in sys.argv[1:]:
    f = V[name]
    print(f"{name:8s}: {timed(lambda: f(cj, lj))*1e3:7.2f} ms", flush=True)
