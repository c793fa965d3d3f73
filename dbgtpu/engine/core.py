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
from .kmer32 import mix32, mix32b, pair_le, rcb_pair, rev2_32

# phases
_FETCH, _LEFT, _RFIRST, _RCONT, _DONE = 0, 1, 2, 3, 4
_BIG = np.int32(1 << 30)
_LANE_LO = np.uint32(0x55555555)
_FULL32 = np.uint32(0xFFFFFFFF)


def _pack_rows(vals32):
    """[B, L] uint32 2-bit values -> [B, ceil(L/16)+1] uint32 words,
    value at position i in bits 2*(i%16) of word i//16; one guard word."""
    B, L = vals32.shape
    Lw = (L + 15) // 16
    pad = Lw * 16 - L
    if pad:
        vals32 = jnp.pad(vals32, ((0, 0), (0, pad)))
    lanes = vals32.reshape(B, Lw, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    words = jnp.sum(lanes << shifts, axis=2, dtype=jnp.uint32)
    return jnp.concatenate([words, jnp.zeros((B, 1), jnp.uint32)], axis=1)


def _funnel(w0, w1, sh):
    """Per-lane funnel shift: (w0 >> sh) | (w1 << (32-sh)); sh is an
    even uint32 in [0, 30] (sh == 0 handled without the UB shift)."""
    hi = jnp.where(sh > 0, w1 << ((jnp.uint32(32) - sh) & jnp.uint32(31)),
                   jnp.uint32(0))
    return (w0 >> sh) | hi


class IndexArrays(NamedTuple):
    """Device-side view of DeviceIndex (all jnp arrays)."""

    tbl_khi: jax.Array      # uint32 [nb, 4] bucketed keys (hi)
    tbl_klo: jax.Array      # uint32 [nb, 4]
    tbl_vals: jax.Array     # int32  [nb*4, 8] left4 | right4
    pool_words: jax.Array   # uint32, 16 bases/word (2-bit packed)
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
        tbl_vals=jnp.asarray(t.vals.reshape(-1, t.vals.shape[-1])),
        pool_words=jnp.asarray(di.pool_words),
        uoff=jnp.asarray(di.uoff), ulen=jnp.asarray(di.ulen),
        ubeg_hi=jnp.asarray(di.ubeg_hi), ubeg_lo=jnp.asarray(di.ubeg_lo),
        uend_hi=jnp.asarray(di.uend_hi), uend_lo=jnp.asarray(di.uend_lo),
        rcbeg_hi=jnp.asarray(di.rcbeg_hi), rcbeg_lo=jnp.asarray(di.rcbeg_lo),
        rcend_hi=jnp.asarray(di.rcend_hi), rcend_lo=jnp.asarray(di.rcend_lo),
    )


def _ht_find(ix: IndexArrays, qhi, qlo):
    """Flat slot index (bucket*4 + s) of (qhi, qlo) in the two-choice
    bucketed junction table, or -1.  Exactly two 4-slot bucket-row
    gathers per key array (lookups are gather-throughput bound)."""
    nb = ix.tbl_khi.shape[0]
    mask = jnp.uint32(nb - 1)
    slot = jnp.full(qhi.shape, -1, jnp.int32)
    for hfn in (mix32, mix32b):
        b = (hfn(qhi, qlo) & mask).astype(jnp.int32)
        rk_hi = ix.tbl_khi[b]            # [..., 4]
        rk_lo = ix.tbl_klo[b]
        ok = (rk_hi == qhi[..., None]) & (rk_lo == qlo[..., None])
        s = jnp.argmax(ok, axis=-1).astype(jnp.int32)
        hit = jnp.any(ok, axis=-1)
        slot = jnp.where((slot < 0) & hit, b * 4 + s, slot)
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


def pack_paths(res: dict, pmax: int):
    """Device-side path compaction: [B, pmax] int32 where row i holds
    [offset, reversed left ids, right ids]; plus plen [B] (clamped to
    pmax; entries needing more than pmax slots report the true length
    so the host can recompute the rare overflow rows).  Keeps D2H
    traffic tiny compared to shipping the full lbuf/rbuf buffers."""
    offset, llen, rlen = res["offset"], res["llen"], res["rlen"]
    lbuf, rbuf = res["lbuf"], res["rbuf"]
    B = offset.shape[0]
    j = jnp.arange(pmax, dtype=jnp.int32)[None, :]
    ll = llen[:, None]
    # j==0 -> offset; 1..llen -> lbuf[llen-j]; llen+1.. -> rbuf[j-llen-1]
    li = jnp.clip(ll - j, 0, lbuf.shape[1] - 1)
    ri = jnp.clip(j - ll - 1, 0, rbuf.shape[1] - 1)
    lv = jnp.take_along_axis(lbuf, li, axis=1)
    rv = jnp.take_along_axis(rbuf, ri, axis=1)
    out = jnp.where(j == 0, offset[:, None], jnp.where(j <= ll, lv, rv))
    plen = 1 + llen + rlen
    out = jnp.where(j < plen[:, None], out, 0)
    return out, plen


@functools.partial(
    jax.jit,
    static_argnames=("k", "m", "effort", "probe_len", "max_iters", "pmax"),
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
    pmax: int = 0,
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

    # packed (16 bases/word) images for the junction compare
    rwf = _pack_rows(codes32)
    rwr = _pack_rows(rc32)
    nmw = _pack_rows(nmask.astype(jnp.uint32))

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
    member1 = (_ht_find(ix, rep1_hi, rep1_lo) >= 0) & valid

    def _member2():
        le2 = pair_le(std_hi, std_lo, rcs_hi, rcs_lo)
        r_hi = jnp.where(le2, std_hi, rcs_hi)
        r_lo = jnp.where(le2, std_lo, rcs_lo)
        return (_ht_find(ix, r_hi, r_lo) >= 0) & valid

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
        slot = _ht_find(ix, chi, clo)
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

        # windowed compare, 2-bit packed: XOR + popcount on 16-base
        # word lanes (SURVEY.md §7.1 kernel (c)).  Forward candidates
        # stream pool words ascending; RC candidates stream descending
        # with lanes reversed + complemented (rev2_32 of ~word).
        orient = s["orient"]
        W = (L + 15) // 16 + 1  # output words: window <= L lanes + spill
        jarr = jnp.arange(W + 1, dtype=jnp.int32)[None, None, :]
        p = uoffc + ustart                # [B,4] fwd base pool index
        q = uoffc + ul - 1 - ustart       # [B,4] rc base pool index
        base_w = jnp.where(is_fwd, p >> 4, q >> 4)
        widx = jnp.where(
            is_fwd[:, :, None], base_w[:, :, None] + jarr,
            base_w[:, :, None] - jarr,
        )
        widx = jnp.clip(widx, 0, ix.pool_words.shape[0] - 1)
        wds = ix.pool_words[widx]          # [B,4,W+1]
        wds = jnp.where(
            is_fwd[:, :, None], wds, rev2_32(wds ^ _FULL32)
        )
        sh_a = (
            2 * jnp.where(is_fwd, p & 15, 15 - (q & 15))
        ).astype(jnp.uint32)[:, :, None]
        a = _funnel(wds[..., :-1], wds[..., 1:], sh_a)     # [B,4,W]

        rw_cur = jnp.where((orient == 0)[:, None], rwf, rwr)
        rw0 = rstart >> 4
        ridxw = jnp.clip(rw0[:, :, None] + jarr, 0, rw_cur.shape[1] - 1)
        bwds = jnp.take_along_axis(rw_cur[:, None, :], ridxw, axis=2)
        sh_b = (2 * (rstart & 15)).astype(jnp.uint32)[:, :, None]
        b = _funnel(bwds[..., :-1], bwds[..., 1:], sh_b)
        nwds = jnp.take_along_axis(nmw[:, None, :], ridxw, axis=2)
        nb = _funnel(nwds[..., :-1], nwds[..., 1:], sh_b)
        nb = jnp.where((orient == 0)[:, None, None], nb, jnp.uint32(0))

        x = a ^ b
        mismw = ((x | (x >> 1)) & _LANE_LO) | nb
        v = jnp.clip(
            w[:, :, None]
            - 16 * jnp.arange(W, dtype=jnp.int32)[None, None, :],
            0, 16,
        )
        lane_mask = jnp.where(
            v >= 16, _FULL32,
            (jnp.uint32(1) << (2 * v).astype(jnp.uint32)) - jnp.uint32(1),
        ) & _LANE_LO
        miss = jnp.sum(
            jax.lax.population_count(mismw & lane_mask), axis=2,
        ).astype(jnp.int32)
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
        # one bookkeep resolves a full transition chain (its FETCH ->
        # LEFT -> RFIRST -> DONE checks run sequentially on the updated
        # state), so a single call per junction step suffices
        s = bookkeep(s)
        s = junction(s)
        s["iters"] = s["iters"] + 1
        return s

    state = jax.lax.while_loop(cond, body, state)
    # flush terminal bookkeeping (a read can finish in bookkeep phase
    # right after the final junction iteration)
    for _ in range(2):
        state = bookkeep(state)

    res = dict(
        status=state["status"],
        orient=state["orient"],
        offset=state["offset"],
        llen=state["llen"],
        rlen=state["rlen"],
        lbuf=state["lbuf"],
        rbuf=state["rbuf"],
        iters=state["iters"],
    )
    if pmax:
        res["paths"], res["plen"] = pack_paths(res, pmax)
    return res
