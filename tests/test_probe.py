"""Closure probe-table tests: the 4-position membership probe
(index.device.ProbeTable + engine.core._closure_member) must agree
bit-for-bit with the per-position ScanTable membership scan on N-free
reads of any length/k."""

import numpy as np
import pytest

from dbgtpu import seq
from dbgtpu.engine import kmer32
from dbgtpu.index.build import build_graph_from_seqs
from dbgtpu.index.device import (
    build_device_index,
    build_probe_table,
    pt_member_host,
)

from . import synth


def _random_graph(rng, k, genome_len=6000):
    genome = synth.make_genome(rng, genome_len)
    unitigs = synth.chop_unitigs(genome, k, rng, max(k + 2, 10), 60)
    return build_graph_from_seqs(synth.orient_shuffle(unitigs, rng), k)


def test_probe_self_bit_matches_keyset():
    rng = np.random.default_rng(11)
    keys = np.unique(rng.integers(0, 1 << 40, size=4000, dtype=np.uint64))
    keys = np.minimum(keys, seq.rcb(keys, 21))  # canonical, k1=21
    keys = np.unique(keys)
    pt = build_probe_table(keys, 21)
    hi, lo = kmer32.split64(keys)
    assert pt_member_host(pt, hi, lo).all()
    absent = np.unique(
        rng.integers(0, 1 << 40, size=2000, dtype=np.uint64)
    )
    absent = np.minimum(absent, seq.rcb(absent, 21))
    absent = np.setdiff1d(absent, keys)
    ahi, alo = kmer32.split64(absent)
    assert not pt_member_host(pt, ahi, alo).any()


@pytest.mark.parametrize("window", [4, 3])
@pytest.mark.parametrize("k", [4, 15, 21, 31])
def test_closure_member_equals_per_position_scan(k, window):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from dbgtpu.engine import core as C

    rng = np.random.default_rng(100 + k)
    g = _random_graph(rng, k)
    di = build_device_index(g)
    assert di.probe_tbl is not None
    if window != di.probe_tbl.window:
        pt = build_probe_table(
            np.asarray(g.jkeys, np.uint64), k - 1, window=window
        )
        assert pt is not None and pt.window == window
        di = dataclasses.replace(di, probe_tbl=pt)
    ix = C.index_to_device(di)
    k1 = k - 1

    B, L = 64, 100
    # mix of genome-derived reads (member hits) and random junk, with
    # varying lengths down to the k-mer minimum
    genome = synth.make_genome(np.random.default_rng(7), 6000)
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    lens = rng.integers(k + 1, L + 1, size=B).astype(np.int32)
    lens[:4] = [k + 1, k + 2, L, L - 1]
    for i in range(0, B, 2):
        s = int(rng.integers(0, 6000 - L))
        frag = np.frombuffer(genome[s : s + L], np.uint8)
        codes[i] = np.array([{65: 0, 67: 1, 71: 2, 84: 3}[c] for c in frag],
                            np.uint8)
    for i in range(B):
        codes[i, lens[i]:] = 0  # deterministic pad, as pack_batch does

    codes32 = jnp.asarray(codes.astype(np.uint32))
    Lk = L - k1 + 1
    std_hi, std_lo = C._scan_kmer_pairs(codes32, k1, False)
    rcs_hi, rcs_lo = C._scan_kmer_pairs(codes32, k1, True)
    le = kmer32.pair_le(std_hi, std_lo, rcs_hi, rcs_lo)
    rep_hi = jnp.where(le, std_hi, rcs_hi)
    rep_lo = jnp.where(le, std_lo, rcs_lo)

    valid = (
        jnp.arange(Lk, dtype=jnp.int32)[None, :]
        <= (jnp.asarray(lens) - k1)[:, None]
    )
    ref = np.asarray(C._st_member(ix, rep_hi, rep_lo) & valid)
    got = np.asarray(
        C._closure_member(ix, rep_hi, rep_lo, le, codes32, k1) & valid
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_align_batch_identical_with_and_without_probe_table(tmp_path):
    """End-to-end: engine results identical when the probe table is
    stripped (falls back to the per-position scan)."""
    import jax.numpy as jnp
    from dbgtpu.engine import core as C
    from dbgtpu.engine.runner import pack_batch

    rng = np.random.default_rng(5)
    k = 21
    g = _random_graph(rng, k)
    di = build_device_index(g)
    ix = C.index_to_device(di)
    ix_noprobe = ix._replace(pt_rows=jnp.zeros((0, 32), jnp.uint32))

    genome = synth.make_genome(np.random.default_rng(8), 6000)
    reads = synth.sample_reads(genome, rng, 96, 80, err_frac=0.5)
    codes, nm, lens = pack_batch(reads, 96, 96)
    a = C.align_batch(ix, codes, nm, lens, k=k, m=2, effort=2)
    b = C.align_batch(ix_noprobe, codes, nm, lens, k=k, m=2, effort=2)
    for key in ("status", "offset", "llen", "rlen", "lbuf", "rbuf"):
        np.testing.assert_array_equal(
            np.asarray(a[key]), np.asarray(b[key]), err_msg=key
        )


@pytest.mark.parametrize("window", [4, 3])
def test_probe_bits_match_direct_query_oracle(window):
    """The scatter-inversion build (device.build_probe_table) must set
    exactly the bits the ProbeTable definition states: for key z and
    orientation o, bit 0 = z in S, 1+4o+c = canon(succ1) in S,
    9+4o+b = canon(pred1) in S, and (window 4 only) 17+16o+cc =
    canon(succ2) in S — computed here the slow direct way per stored
    key.  Rows store ~key-hi (empty slots are zeros)."""
    k1 = 14
    rng = np.random.default_rng(99)
    S = np.unique(rng.integers(0, 1 << (2 * k1), 3000, dtype=np.uint64))
    S = np.unique(np.minimum(S, seq.rcb(S, k1)))
    from dbgtpu.index.device import PT_SLOTS as S_

    pt = build_probe_table(S, k1, window=window)
    assert pt.window == window
    assert pt.rows.shape[1] == (4 * S_ if window == 4 else 3 * S_)
    mask = np.uint64((1 << (2 * k1)) - 1)
    top = np.uint64(2 * (k1 - 1))

    def canon(v):
        return np.minimum(v, seq.rcb(v, k1))

    def in_s(v):
        return np.isin(canon(v), S)

    # pull (key, bits) pairs back out of the table rows (inverted hi)
    rows = pt.rows
    used = rows[:, 0:S_] != 0
    keys = ((~rows[:, 0:S_][used]).astype(np.uint64) << np.uint64(32)) | rows[
        :, S_ : 2 * S_
    ][used].astype(np.uint64)
    bits = rows[:, 2 * S_ : 3 * S_][used].astype(np.uint64)
    assert used.sum() > 0 and np.isin(S, keys).all()
    if window == 4:
        w1 = rows[:, 3 * S_ : 4 * S_][used].astype(np.uint64)
        bits = bits | (w1 << np.uint64(32))

    want = np.where(np.isin(keys, S), np.uint64(1), np.uint64(0))
    for o in range(2):
        z = keys if o == 0 else seq.rcb(keys, k1)
        for c in range(4):
            v = ((z << np.uint64(2)) | np.uint64(c)) & mask
            want |= in_s(v).astype(np.uint64) << np.uint64(1 + 4 * o + c)
        for b in range(4):
            v = (z >> np.uint64(2)) | (np.uint64(b) << top)
            want |= in_s(v).astype(np.uint64) << np.uint64(9 + 4 * o + b)
        if window == 4:
            for cc in range(16):
                v = ((z << np.uint64(4)) | np.uint64(cc)) & mask
                want |= in_s(v).astype(np.uint64) << np.uint64(
                    17 + 16 * o + cc
                )
    np.testing.assert_array_equal(bits, want)
