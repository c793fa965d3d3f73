"""Batched greedy alignment engine (JAX, jit-compiled, TPU-first).

Design (not a translation of the reference's recursion):
  - a batch of B reads advances in lockstep through a `lax.while_loop`;
    each iteration performs ONE junction step for every read that is
    mid-walk, plus cheap elementwise bookkeeping (anchor fetch, phase
    transitions, orientation switch),
  - per-read state machine phases: FETCH (pick next anchor or finish),
    LEFT (extend toward read start), RIGHT_FIRST (anchor step of the
    right extension, junction chars trusted), RIGHT_CONT (subsequent
    right steps, junction chars compared), DONE,
  - per junction step: one canonical hash-table lookup -> up to 4
    candidate unitigs -> windowed Hamming compare [B, 4, L] against the
    read -> argmin with earliest-index tie-break (equivalent to the
    reference's selection logic, see model.py) -> state update,
  - kmers are (hi, lo) uint32 pairs (no 64-bit integer ALU on TPU),
  - everything is static-shaped; reads that finish early are masked.

Semantics are cross-checked against dbgtpu.model (the executable spec)
and transitively against the compiled reference binary.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    STATUS_ALIGNED_FWD,
    STATUS_ALIGNED_RC,
    STATUS_FAILED,
    STATUS_NO_OVERLAP_FWD,
    STATUS_RC_NO_OVERLAP,
)
from .kmer32 import mix32, pair_le, rcb_pair

# phases
_FETCH, _LEFT, _RFIRST, _RCONT, _DONE = 0, 1, 2, 3, 4
_BIG = np.int32(1 << 30)


class IndexArrays(NamedTuple):
    """Device-side view of DeviceIndex (all jnp arrays)."""

    tbl_khi: jax.Array
    tbl_klo: jax.Array
    tbl_used: jax.Array
    tbl_vals: jax.Array     # [S, 8] left4 | right4
    pool: jax.Array         # uint8
    uoff: jax.Array         # int32 [U+1]
    ulen: jax.Array         # int32 [U+1]
    ubeg_hi: jax.Array
    ubeg_lo: jax.Array
    uend_hi: jax.Array
    uend_lo: jax.Array
    rcbeg_hi: jax.Array
    rcbeg_lo: jax.Array
    rcend_hi: jax.Array
    rcend_lo: jax.Array


def index_to_device(di) -> IndexArrays:
    """DeviceIndex (numpy) -> IndexArrays (jnp)."""
    t = di.tbl
    return IndexArrays(
        tbl_khi=jnp.asarray(t.khi), tbl_klo=jnp.asarray(t.klo),
        tbl_used=jnp.asarray(t.used), tbl_vals=jnp.asarray(t.vals),
        pool=jnp.asarray(di.pool),
        uoff=jnp.asarray(di.uoff), ulen=jnp.asarray(di.ulen),
        ubeg_hi=jnp.asarray(di.ubeg_hi), ubeg_lo=jnp.asarray(di.ubeg_lo),
        uend_hi=jnp.asarray(di.uend_hi), uend_lo=jnp.asarray(di.uend_lo),
        rcbeg_hi=jnp.asarray(di.rcbeg_hi), rcbeg_lo=jnp.asarray(di.rcbeg_lo),
        rcend_hi=jnp.asarray(di.rcend_hi), rcend_lo=jnp.asarray(di.rcend_lo),
    )


def _ht_find(ix: IndexArrays, qhi, qlo, probe_len: int):
    """Slot index of (qhi, qlo) in the junction table, or -1."""
    S = ix.tbl_khi.shape[0]
    mask = jnp.uint32(S - 1)
    h = (mix32(qhi, qlo) & mask).astype(jnp.int32)
    slot = jnp.full(qhi.shape, -1, jnp.int32)
    for p in range(probe_len):
        idx = (h + p) & jnp.int32(S - 1)
        ok = ix.tbl_used[idx] & (ix.tbl_khi[idx] == qhi) & (ix.tbl_klo[idx] == qlo)
        slot = jnp.where((slot < 0) & ok, idx, slot)
    return slot


def _scan_kmer_pairs(codes32, n: int, complement: bool):
    """All n-mer (hi, lo) pairs per position of a [B, L] uint32 code
    array.  complement=True builds the reverse-complement value
    directly (base j weighted 4^j with 3-code)."""
    B, L = codes32.shape
    Lk = L - n + 1
    hi = jnp.zeros((B, Lk), jnp.uint32)
    lo = jnp.zeros((B, Lk), jnp.uint32)
    for j in range(n):
        c = codes32[:, j : j + Lk]
        if complement:
            c = jnp.uint32(3) - c
            shift = 2 * j
        else:
            shift = 2 * (n - 1 - j)
        if shift >= 32:
            hi = hi | (c << (shift - 32))
        else:
            lo = lo | (c << shift)
            if shift > 30:  # cannot happen: shifts are even, <=30 fit
                raise AssertionError
    return hi, lo


def _first_k_hits(member, values_hi, values_lo, positions, E: int):
    """First E True positions per row (+ the value pairs there).
    positions[b, i] gives the reported position for scan index i."""
    cum = jnp.cumsum(member.astype(jnp.int32), axis=1)
    n = jnp.minimum(cum[:, -1], E)
    pos_list, hi_list, lo_list = [], [], []
    Bidx = jnp.arange(member.shape[0])
    for e in range(E):
        hit = (cum == e + 1) & member
        i = jnp.argmax(hit, axis=1)
        pos_list.append(positions[Bidx, i])
        hi_list.append(values_hi[Bidx, i])
        lo_list.append(values_lo[Bidx, i])
    return (
        jnp.stack(pos_list, axis=1).astype(jnp.int32),
        jnp.stack(hi_list, axis=1),
        jnp.stack(lo_list, axis=1),
        n.astype(jnp.int32),
    )


@functools.partial(
    jax.jit, static_argnames=("k", "m", "effort", "probe_len", "max_iters")
)
def align_batch(
    ix: IndexArrays,
    codes,      # uint8 [B, L]
    nmask,      # bool  [B, L]
    lens,       # int32 [B]
    *,
    k: int,
    m: int,
    effort: int,
    probe_len: int,
    max_iters: int = 0,
):
    """Align a batch.  Returns dict of per-read results."""
    B, L = codes.shape
    k1 = k - 1
    Lk = L - k1 + 1
    E = effort
    P = L  # path buffer bound: every junction step advances >= 1 base
    if max_iters == 0:
        max_iters = 2 * E * 2 * L + 64

    lens = lens.astype(jnp.int32)
    codes32 = codes.astype(jnp.uint32)
    col = jnp.arange(L, dtype=jnp.int32)[None, :]

    # ---- reverse-complement read image (RC('N') == 'A' == 3 - code) ----
    ridx = lens[:, None] - 1 - col
    rc_codes = jnp.where(
        ridx >= 0,
        jnp.uint32(3) - jnp.take_along_axis(
            codes32, jnp.clip(ridx, 0, L - 1), axis=1
        ),
        0,
    ).astype(jnp.uint8)
    rc32 = rc_codes.astype(jnp.uint32)

    # ---- anchor scan ----
    # std: N encodes 3 throughout; buggy: rolled-in N encodes 0
    # (reference str2num vs nuc2int quirk, see model.scan_kmers)
    bcodes32 = jnp.where(nmask & (col >= k1), jnp.uint32(0), codes32)
    std_hi, std_lo = _scan_kmer_pairs(codes32, k1, False)
    bug_hi, bug_lo = _scan_kmer_pairs(bcodes32, k1, False)
    rcs_hi, rcs_lo = _scan_kmer_pairs(codes32, k1, True)

    scan_col = jnp.arange(Lk, dtype=jnp.int32)[None, :]
    valid = scan_col <= (lens - k1)[:, None]

    le1 = pair_le(bug_hi, bug_lo, rcs_hi, rcs_lo)
    rep1_hi = jnp.where(le1, bug_hi, rcs_hi)
    rep1_lo = jnp.where(le1, bug_lo, rcs_lo)
    member1 = (_ht_find(ix, rep1_hi, rep1_lo, probe_len) >= 0) & valid

    def _member2():
        le2 = pair_le(std_hi, std_lo, rcs_hi, rcs_lo)
        r_hi = jnp.where(le2, std_hi, rcs_hi)
        r_lo = jnp.where(le2, std_lo, rcs_lo)
        return (_ht_find(ix, r_hi, r_lo, probe_len) >= 0) & valid

    member2 = jax.lax.cond(jnp.any(nmask), _member2, lambda: member1)

    # forward anchors: first E member1 hits, values = buggy fwd kmer
    apos_f, ahi_f, alo_f, n_fwd = _first_k_hits(
        member1, bug_hi, bug_lo,
        jnp.broadcast_to(scan_col, member1.shape), E,
    )
    # rc anchors: scan the RC read = mirrored positions of member2;
    # kmer value at rc position i is rc_std at fwd position len-k1-i
    mir = (lens - k1)[:, None] - scan_col  # [B, Lk]
    mirc = jnp.clip(mir, 0, Lk - 1)
    member_rc = jnp.take_along_axis(member2, mirc, axis=1) & (mir >= 0)
    vr_hi = jnp.take_along_axis(rcs_hi, mirc, axis=1)
    vr_lo = jnp.take_along_axis(rcs_lo, mirc, axis=1)
    apos_r, ahi_r, alo_r, n_rc = _first_k_hits(
        member_rc, vr_hi, vr_lo,
        jnp.broadcast_to(scan_col, member_rc.shape), E,
    )

    Bidx = jnp.arange(B, dtype=jnp.int32)

    state = dict(
        phase=jnp.full((B,), _FETCH, jnp.int32),
        status=jnp.zeros((B,), jnp.int32),
        orient=jnp.zeros((B,), jnp.int32),
        aidx=jnp.zeros((B,), jnp.int32),
        a_hi=jnp.zeros((B,), jnp.uint32),
        a_lo=jnp.zeros((B,), jnp.uint32),
        a_pos=jnp.zeros((B,), jnp.int32),
        cur_hi=jnp.zeros((B,), jnp.uint32),
        cur_lo=jnp.zeros((B,), jnp.uint32),
        pos=jnp.zeros((B,), jnp.int32),
        budget=jnp.zeros((B,), jnp.int32),
        offset=jnp.zeros((B,), jnp.int32),
        llen=jnp.zeros((B,), jnp.int32),
        rlen=jnp.zeros((B,), jnp.int32),
        lbuf=jnp.zeros((B, P), jnp.int32),
        rbuf=jnp.zeros((B, P), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
    )

    def bookkeep(s):
        phase, orient, aidx = s["phase"], s["orient"], s["aidx"]
        # --- FETCH resolution ---
        is_f = phase == _FETCH
        n_cur = jnp.where(orient == 0, n_fwd, n_rc)
        have = aidx < n_cur
        fwd_exh = is_f & ~have & (orient == 0)
        rc_exh = is_f & ~have & (orient == 1)
        st_noov = fwd_exh & (n_fwd == 0)
        to_rc = fwd_exh & (n_fwd > 0)
        st_rcno = rc_exh & (n_rc == 0)
        st_fail = rc_exh & (n_rc > 0)
        load = is_f & have

        ai = jnp.clip(aidx, 0, E - 1)
        sel_pos = jnp.where(
            orient == 0, apos_f[Bidx, ai], apos_r[Bidx, ai]
        )
        sel_hi = jnp.where(orient == 0, ahi_f[Bidx, ai], ahi_r[Bidx, ai])
        sel_lo = jnp.where(orient == 0, alo_f[Bidx, ai], alo_r[Bidx, ai])

        s = dict(s)
        s["status"] = jnp.where(
            st_noov, STATUS_NO_OVERLAP_FWD,
            jnp.where(st_rcno, STATUS_RC_NO_OVERLAP,
                      jnp.where(st_fail, STATUS_FAILED, s["status"])),
        )
        s["phase"] = jnp.where(
            st_noov | st_rcno | st_fail, _DONE,
            jnp.where(load, _LEFT, phase),
        )
        s["orient"] = jnp.where(to_rc, 1, orient)
        s["aidx"] = jnp.where(to_rc, 0, aidx)
        s["a_hi"] = jnp.where(load, sel_hi, s["a_hi"])
        s["a_lo"] = jnp.where(load, sel_lo, s["a_lo"])
        s["a_pos"] = jnp.where(load, sel_pos, s["a_pos"])
        s["cur_hi"] = jnp.where(load, sel_hi, s["cur_hi"])
        s["cur_lo"] = jnp.where(load, sel_lo, s["cur_lo"])
        s["pos"] = jnp.where(load, sel_pos, s["pos"])
        s["budget"] = jnp.where(load, m, s["budget"])
        s["llen"] = jnp.where(load, 0, s["llen"])
        s["rlen"] = jnp.where(load, 0, s["rlen"])
        s["offset"] = jnp.where(load, 0, s["offset"])

        # --- LEFT at read start: offset 0, switch to right walk ---
        l0 = (s["phase"] == _LEFT) & (s["pos"] == 0)
        s["offset"] = jnp.where(l0, 0, s["offset"])
        s["phase"] = jnp.where(l0, _RFIRST, s["phase"])
        s["cur_hi"] = jnp.where(l0, s["a_hi"], s["cur_hi"])
        s["cur_lo"] = jnp.where(l0, s["a_lo"], s["cur_lo"])
        s["pos"] = jnp.where(l0, s["a_pos"], s["pos"])

        # --- right-walk termination (nothing left to map) ---
        aligned_st = jnp.where(
            s["orient"] == 0, STATUS_ALIGNED_FWD, STATUS_ALIGNED_RC
        )
        rf_end = (s["phase"] == _RFIRST) & (lens - s["pos"] - k1 == 0)
        rc_end = (s["phase"] == _RCONT) & (lens - s["pos"] < k)
        fin = rf_end | rc_end
        s["status"] = jnp.where(fin, aligned_st, s["status"])
        s["phase"] = jnp.where(fin, _DONE, s["phase"])
        return s

    def junction(s):
        phase = s["phase"]
        mL = phase == _LEFT
        mRF = phase == _RFIRST
        mRC = phase == _RCONT
        active = mL | mRF | mRC
        pos = s["pos"]
        bhi, blo = s["cur_hi"], s["cur_lo"]

        rhi, rlo = rcb_pair(bhi, blo, k1)
        is_canon = pair_le(bhi, blo, rhi, rlo)
        chi = jnp.where(is_canon, bhi, rhi)
        clo = jnp.where(is_canon, blo, rlo)
        slot = _ht_find(ix, chi, clo, probe_len)
        vals8 = ix.tbl_vals[jnp.maximum(slot, 0)]          # [B, 8]
        use_right = jnp.where(mL, is_canon, ~is_canon)
        cands = jnp.where(use_right[:, None], vals8[:, 4:8], vals8[:, 0:4])
        cands = jnp.where((slot >= 0)[:, None], cands, 0)   # [B, 4]
        valid_c = cands > 0

        # orientation: LEFT wants unitigs ENDING with bin, RIGHT wants
        # unitigs BEGINNING with bin; forward iff that extremity matches
        ext_hi = jnp.where(mL[:, None], ix.uend_hi[cands], ix.ubeg_hi[cands])
        ext_lo = jnp.where(mL[:, None], ix.uend_lo[cands], ix.ubeg_lo[cands])
        is_fwd = (ext_hi == bhi[:, None]) & (ext_lo == blo[:, None])
        ul = ix.ulen[cands]
        uoffc = ix.uoff[cands]

        rem = jnp.where(mL, pos, jnp.where(mRF, lens - pos - k1, lens - pos))
        remc = rem[:, None]
        ended = (ul - k1) >= remc

        # window parameters (see model._walk_left/_walk_right)
        ustart = jnp.where(
            mL[:, None] & ended, ul - remc - k1,
            jnp.where(mRF[:, None], k1, 0),
        )
        rstart = jnp.where(
            mL[:, None],
            jnp.where(ended, 0, pos[:, None] - (ul - k1)),
            jnp.where(mRF[:, None], (pos + k1)[:, None], pos[:, None]),
        )
        w = jnp.where(
            ended, remc,
            jnp.where((mL | mRF)[:, None], ul - k1, jnp.minimum(ul, remc)),
        )

        # windowed compare [B, 4, L]
        orient = s["orient"]
        codes_cur = jnp.where((orient == 0)[:, None], codes, rc_codes)
        nm_cur = nmask & (orient == 0)[:, None]
        t = jnp.arange(L, dtype=jnp.int32)[None, None, :]
        ridx3 = jnp.clip(rstart[:, :, None] + t, 0, L - 1)
        rv = jnp.take_along_axis(codes_cur[:, None, :], ridx3, axis=2)
        nm3 = jnp.take_along_axis(nm_cur[:, None, :], ridx3, axis=2)
        xoff = ustart[:, :, None] + t
        pidx = jnp.where(
            is_fwd[:, :, None],
            uoffc[:, :, None] + xoff,
            uoffc[:, :, None] + (ul[:, :, None] - 1) - xoff,
        )
        pidx = jnp.clip(pidx, 0, ix.pool.shape[0] - 1)
        uv = ix.pool[pidx]
        uv = jnp.where(is_fwd[:, :, None], uv, 3 - uv)
        mism = ((uv != rv) | nm3) & (t < w[:, :, None])
        miss = jnp.sum(mism, axis=2, dtype=jnp.int32)
        miss = jnp.where(valid_c, miss, _BIG)

        bestj = jnp.argmin(miss, axis=1).astype(jnp.int32)

        def sel(x):
            return jnp.take_along_axis(x, bestj[:, None], axis=1)[:, 0]

        best = sel(miss)
        cand_s = sel(cands)
        fwd_s = sel(is_fwd)
        end_s = sel(ended)
        ul_s = sel(ul)
        ust_s = sel(ustart)
        sid = jnp.where(fwd_s, cand_s, -cand_s)

        ok = active & (best <= s["budget"])
        fail = active & (best > s["budget"])

        s = dict(s)
        # path pushes
        push_l = ok & mL
        push_r = ok & (mRF | mRC)
        li = jnp.clip(s["llen"], 0, P - 1)
        ri = jnp.clip(s["rlen"], 0, P - 1)
        s["lbuf"] = s["lbuf"].at[Bidx, li].set(
            jnp.where(push_l, sid, s["lbuf"][Bidx, li])
        )
        s["rbuf"] = s["rbuf"].at[Bidx, ri].set(
            jnp.where(push_r, sid, s["rbuf"][Bidx, ri])
        )
        s["llen"] = s["llen"] + push_l.astype(jnp.int32)
        s["rlen"] = s["rlen"] + push_r.astype(jnp.int32)
        s["budget"] = jnp.where(ok, s["budget"] - best, s["budget"])

        # LEFT ended -> record offset, restart from anchor going right
        le = ok & mL & end_s
        s["offset"] = jnp.where(le, ust_s, s["offset"])
        s["cur_hi"] = jnp.where(le, s["a_hi"], s["cur_hi"])
        s["cur_lo"] = jnp.where(le, s["a_lo"], s["cur_lo"])
        s["pos"] = jnp.where(le, s["a_pos"], s["pos"])
        # LEFT continue
        lc = ok & mL & ~end_s
        nxt_l_hi = jnp.where(fwd_s, ix.ubeg_hi[cand_s], ix.rcend_hi[cand_s])
        nxt_l_lo = jnp.where(fwd_s, ix.ubeg_lo[cand_s], ix.rcend_lo[cand_s])
        s["pos"] = jnp.where(lc, pos - (ul_s - k1), s["pos"])
        s["cur_hi"] = jnp.where(lc, nxt_l_hi, s["cur_hi"])
        s["cur_lo"] = jnp.where(lc, nxt_l_lo, s["cur_lo"])
        # RIGHT ended -> aligned
        re_ = ok & (mRF | mRC) & end_s
        aligned_st = jnp.where(
            s["orient"] == 0, STATUS_ALIGNED_FWD, STATUS_ALIGNED_RC
        )
        s["status"] = jnp.where(re_, aligned_st, s["status"])
        # RIGHT continue
        rc_ = ok & (mRF | mRC) & ~end_s
        nxt_r_hi = jnp.where(fwd_s, ix.uend_hi[cand_s], ix.rcbeg_hi[cand_s])
        nxt_r_lo = jnp.where(fwd_s, ix.uend_lo[cand_s], ix.rcbeg_lo[cand_s])
        s["pos"] = jnp.where(rc_, pos + (ul_s - k1), s["pos"])
        s["cur_hi"] = jnp.where(rc_, nxt_r_hi, s["cur_hi"])
        s["cur_lo"] = jnp.where(rc_, nxt_r_lo, s["cur_lo"])

        # phase transitions: fail -> next anchor; LEFT ended -> right
        # walk; RIGHT ended -> done; RIGHT continue -> RCONT; LEFT
        # continue stays LEFT
        s["phase"] = jnp.where(
            fail, _FETCH,
            jnp.where(le, _RFIRST, jnp.where(re_, _DONE, s["phase"])),
        )
        s["phase"] = jnp.where(rc_, _RCONT, s["phase"])
        s["aidx"] = jnp.where(fail, s["aidx"] + 1, s["aidx"])
        return s

    def cond(s):
        return jnp.any(s["phase"] != _DONE) & (s["iters"] < max_iters)

    def body(s):
        for _ in range(4):
            s = bookkeep(s)
        s = junction(s)
        s["iters"] = s["iters"] + 1
        return s

    state = jax.lax.while_loop(cond, body, state)
    # flush terminal bookkeeping (a read can finish in bookkeep phase
    # right after the final junction iteration)
    for _ in range(4):
        state = bookkeep(state)

    return dict(
        status=state["status"],
        orient=state["orient"],
        offset=state["offset"],
        llen=state["llen"],
        rlen=state["rlen"],
        lbuf=state["lbuf"],
        rbuf=state["rbuf"],
        iters=state["iters"],
    )
