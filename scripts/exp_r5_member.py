"""Decompose the member stage (6.08 ms of the 14.5 ms step): the raw
probe-row gather measures 2.1 ms standalone, so ~4 ms is elsewhere —
locate it (kmers scan feeding it? extraction bit logic? the has-N cond
carrying a dead slow branch? the [B, J] gather shape?)."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

from _benchlib import load_workload

import jax
import jax.numpy as jnp


def main():
    bench, g, di, codes_all = load_workload()
    from dbgtpu.engine import core
    from dbgtpu.engine.core import index_to_device
    from dbgtpu.engine.runner import _bucket_len

    dev = jax.devices()[0]
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    ix = index_to_device(di)
    jax.block_until_ready(ix)
    K = bench.K
    k1 = K - 1
    B = 32768
    L = _bucket_len(100, K)
    print(f"pt_rows {tuple(np.asarray(ix.pt_rows).shape)} "
          f"{np.asarray(ix.pt_rows).nbytes>>20} MB", flush=True)

    codes = np.zeros((B, L), np.uint8)
    codes[:, :100] = codes_all[:B]
    codes_d = jax.device_put(codes.astype(np.uint8), dev)
    lens_d = jax.device_put(np.full(B, 100, np.int32), dev)
    jax.block_until_ready((codes_d, lens_d))

    R = 9

    def timed(label, jfn):
        np.asarray(jfn(1))
        times = {}
        for reps in (1, R):
            np.asarray(jfn(reps))
            t0 = time.monotonic()
            np.asarray(jfn(reps))
            times[reps] = time.monotonic() - t0
        ms = (times[R] - times[1]) / (R - 1) * 1e3
        print(f"{label:<30} {ms:7.2f} ms", flush=True)
        return ms

    Lk = L - k1 + 1

    def prep(c32):
        rwf = core._pack_rows(c32, 2 * ((L + 15) // 16) + 1)
        std_hi, std_lo = core._scan_kmer_pairs_words(rwf, L, k1)
        from dbgtpu.engine.kmer32 import rcb_pair, pair_le

        rcs_hi, rcs_lo = rcb_pair(std_hi, std_lo, k1)
        le1 = pair_le(std_hi, std_lo, rcs_hi, rcs_lo)
        rep_hi = jnp.where(le1, std_hi, rcs_hi)
        rep_lo = jnp.where(le1, std_lo, rcs_lo)
        return rep_hi, rep_lo, le1

    # full closure member (scan feeding included)
    @functools.partial(jax.jit, static_argnames=("reps",))
    def member_full(ix, codes, *, reps):
        def body(i, acc):
            c32 = jnp.roll(codes, i, axis=0).astype(jnp.uint32)
            rep_hi, rep_lo, le1 = prep(c32)
            m = core._closure_member(ix, rep_hi, rep_lo, le1, c32, k1)
            return acc + jnp.sum(m.astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    # kmer scan only
    @functools.partial(jax.jit, static_argnames=("reps",))
    def scan_only(codes, *, reps):
        def body(i, acc):
            c32 = jnp.roll(codes, i, axis=0).astype(jnp.uint32)
            rep_hi, rep_lo, le1 = prep(c32)
            return acc + jnp.sum((rep_hi ^ rep_lo).astype(jnp.int32)) \
                + jnp.sum(le1.astype(jnp.int32))
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    # probe-row gather only (same [B, J] shape as _closure_member)
    from dbgtpu.index.device import PT_SLOTS as S_
    W = 4 if np.asarray(ix.pt_rows).shape[1] == 4 * S_ else 3
    J = (Lk + W - 1) // W
    from dbgtpu.engine.kmer32 import mix32

    @functools.partial(jax.jit, static_argnames=("reps",))
    def gather_only(ix, codes, *, reps):
        nbp = ix.pt_rows.shape[0]

        def body(i, acc):
            c32 = jnp.roll(codes, i, axis=0).astype(jnp.uint32)
            rep_hi, rep_lo, le1 = prep(c32)
            pcols = [min(W * j + 1, Lk - 1) for j in range(J)]
            qhi = jnp.stack([rep_hi[:, c] for c in pcols], axis=1)
            qlo = jnp.stack([rep_lo[:, c] for c in pcols], axis=1)
            b = (mix32(qhi ^ ix.pt_seed, qlo)
                 & jnp.uint32(nbp - 1)).astype(jnp.int32)
            row = ix.pt_rows[b]
            return acc + jnp.sum(row, dtype=jnp.uint32).astype(jnp.int32)
        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    t_scan = timed("kmer scan + canon", lambda r: scan_only(codes_d, reps=r))
    t_g = timed("scan + [B,J] probe gather",
                lambda r: gather_only(ix, codes_d, reps=r))
    t_m = timed("scan + full closure member",
                lambda r: member_full(ix, codes_d, reps=r))
    print(f"\ngather-only: {t_g-t_scan:.2f} ms; extraction: "
          f"{t_m-t_g:.2f} ms; scan: {t_scan:.2f} ms", flush=True)
    print(f"[B,J]={B}x{J} gathers = {B*J/1e3:.0f}k rows", flush=True)
    return 0


if __name__ == "__main__" and len(sys.argv) == 1:
    sys.exit(main())


def ab_pt_slots():
    """PT_SLOTS A/B: rebuild the probe table under each slot count and
    re-measure the member stage + full step."""
    bench, g, di, codes_all = load_workload()
    import dbgtpu.index.device as dm
    from dataclasses import replace
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import (
        PMAX_CAP, PMAX_INIT, _bucket_len, _pmax_for, _quantize_pmax,
    )

    dev = jax.devices()[0]
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    K = bench.K
    B = 32768
    L = _bucket_len(100, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP, _quantize_pmax(PMAX_INIT))
    codes = np.zeros((B, L), np.uint8)
    codes[:, :100] = codes_all[:B]
    codes_d = jax.device_put(codes, dev)
    nm_d = jax.device_put(np.zeros((B, L), bool), dev)
    lens_d = jax.device_put(np.full(B, 100, np.int32), dev)
    R = 9

    for S in (32, 8, 16):
        old_s, old_l = dm.PT_SLOTS, dm.PT_TARGET_LOAD
        dm.PT_SLOTS = S
        dm.PT_TARGET_LOAD = max(2, (S * 3) // 8)
        try:
            t0 = time.monotonic()
            pt = dm.build_probe_table(g.jkeys, K - 1)
            tb = time.monotonic() - t0
            di2 = replace(di, probe_tbl=pt)
            ix2 = index_to_device(di2)
            jax.block_until_ready(ix2)

            @functools.partial(jax.jit, static_argnames=("reps", "ab"))
            def step(ix, codes, nm, lens, *, reps, ab):
                def body(i, acc):
                    c = jnp.roll(codes, i, axis=0)
                    r = align_batch.__wrapped__(
                        ix, c, nm, lens, k=K, m=2, effort=2,
                        pmax=PMAX, ablate=ab, stage1_iters=3,
                    )
                    s = jnp.sum(r["status"]) + jnp.sum(
                        r["llen"] + r["rlen"])
                    if "paths" in r:
                        s = s + jnp.sum(r["paths"].astype(jnp.int32))
                    return acc + s
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

            for ab in ("member", "all"):
                times = {}
                for reps in (1, R):
                    np.asarray(step(ix2, codes_d, nm_d, lens_d,
                                    reps=reps, ab=ab))
                    t0 = time.monotonic()
                    np.asarray(step(ix2, codes_d, nm_d, lens_d,
                                    reps=reps, ab=ab))
                    times[reps] = time.monotonic() - t0
                ms = (times[R] - times[1]) / (R - 1) * 1e3
                mb = pt.rows.nbytes >> 20
                print(f"PT_SLOTS={S:<3} {ab:<7} {ms:7.2f} ms "
                      f"(table {mb} MB, build {tb:.1f}s)", flush=True)
        finally:
            dm.PT_SLOTS = old_s
            dm.PT_TARGET_LOAD = old_l


if __name__ == "__main__" and "ab" in sys.argv[1:]:
    ab_pt_slots()


def ab_pair():
    """Clean pairwise A/B: S=32 baseline then S=env(DBGTPU_PT_AB), one
    pair per process, device arrays freed between configs."""
    bench, g, di, codes_all = load_workload()
    import gc
    import os
    from dataclasses import replace

    import dbgtpu.index.device as dm
    from dbgtpu.engine.core import align_batch, index_to_device
    from dbgtpu.engine.runner import (
        PMAX_CAP, PMAX_INIT, _bucket_len, _pmax_for, _quantize_pmax,
    )

    dev = jax.devices()[0]
    np.asarray(jax.jit(lambda a: a + 1)(jax.device_put(
        np.zeros(128, np.int32), dev)))
    K = bench.K
    B = 32768
    L = _bucket_len(100, K)
    PMAX = min(_pmax_for(di, L), PMAX_CAP, _quantize_pmax(PMAX_INIT))
    codes = np.zeros((B, L), np.uint8)
    codes[:, :100] = codes_all[:B]
    codes_d = jax.device_put(codes, dev)
    nm_d = jax.device_put(np.zeros((B, L), bool), dev)
    lens_d = jax.device_put(np.full(B, 100, np.int32), dev)
    R = 9
    target = int(os.environ.get("DBGTPU_PT_AB", 8))

    for S in (32, target):
        old_s, old_l = dm.PT_SLOTS, dm.PT_TARGET_LOAD
        dm.PT_SLOTS = S
        dm.PT_TARGET_LOAD = max(2, (S * 3) // 8)
        try:
            pt = dm.build_probe_table(g.jkeys, K - 1)
            di2 = replace(di, probe_tbl=pt)
            ix2 = index_to_device(di2)
            jax.block_until_ready(ix2)

            @functools.partial(jax.jit, static_argnames=("reps", "ab"))
            def step(ix, codes, nm, lens, *, reps, ab):
                def body(i, acc):
                    c = jnp.roll(codes, i, axis=0)
                    r = align_batch.__wrapped__(
                        ix, c, nm, lens, k=K, m=2, effort=2,
                        pmax=PMAX, ablate=ab, stage1_iters=3,
                    )
                    s = jnp.sum(r["status"]) + jnp.sum(
                        r["llen"] + r["rlen"])
                    if "paths" in r:
                        s = s + jnp.sum(r["paths"].astype(jnp.int32))
                    return acc + s
                return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

            for ab in ("member", "all"):
                times = {}
                for reps in (1, R):
                    np.asarray(step(ix2, codes_d, nm_d, lens_d,
                                    reps=reps, ab=ab))
                    t0 = time.monotonic()
                    np.asarray(step(ix2, codes_d, nm_d, lens_d,
                                    reps=reps, ab=ab))
                    times[reps] = time.monotonic() - t0
                ms = (times[R] - times[1]) / (R - 1) * 1e3
                print(f"PT_SLOTS={S:<3} {ab:<7} {ms:7.2f} ms "
                      f"(table {pt.rows.nbytes>>20} MB)", flush=True)
            del di2._ix_arrays, ix2, di2, pt
            gc.collect()
        finally:
            dm.PT_SLOTS = old_s
            dm.PT_TARGET_LOAD = old_l


if __name__ == "__main__" and "pair" in sys.argv[1:]:
    ab_pair()
