"""Unit tests for host sequence primitives against brute-force oracles."""

import numpy as np
import pytest

from dbgtpu.seq import (
    canonical, codes_to_kmer, decode, encode, hamming, kmers_of, n_mask,
    rc_codes, rcb,
)

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def brute_rc(s: str) -> str:
    return "".join(_COMP[c] for c in reversed(s))


def brute_kmer(s: str) -> int:
    v = 0
    for c in s:
        v = (v << 2) | {"A": 0, "C": 1, "G": 2, "T": 3}[c]
    return v


def test_encode_decode_roundtrip():
    s = "ACGTTGCA"
    assert decode(encode(s)) == s


def test_encode_n_maps_to_t():
    # reference str2num: everything not A/C/G encodes as 3 (utils.cpp:125)
    assert list(encode("ANX")) == [0, 3, 3]
    assert list(n_mask("ANA")) == [False, True, False]


def test_rc_codes_matches_string_rc():
    rng = np.random.default_rng(0)
    for _ in range(20):
        s = "".join(rng.choice(list("ACGT"), size=int(rng.integers(1, 50))))
        assert decode(rc_codes(encode(s))) == brute_rc(s)


def test_rc_codes_n_becomes_a():
    # reference revCompChar maps N (and T) to 'A' (utils.cpp:52-59)
    assert decode(rc_codes(encode("NNC"))) == "GAA"


def test_kmers_of_matches_brute():
    rng = np.random.default_rng(1)
    for n in (3, 15, 31):
        s = "".join(rng.choice(list("ACGT"), size=64))
        kms = kmers_of(encode(s), n)
        assert len(kms) == 64 - n + 1
        for i in range(len(kms)):
            assert int(kms[i]) == brute_kmer(s[i : i + n])


def test_rcb_matches_string_rc():
    rng = np.random.default_rng(2)
    for n in (4, 16, 31, 32):
        s = "".join(rng.choice(list("ACGT"), size=n))
        v = np.uint64(brute_kmer(s))
        assert int(rcb(v, n)) == brute_kmer(brute_rc(s))


def test_rcb_vectorized():
    rng = np.random.default_rng(3)
    vs = rng.integers(0, 2**30, size=100, dtype=np.uint64)
    out = rcb(vs, 15)
    for i in range(100):
        assert int(out[i]) == int(rcb(np.uint64(vs[i]), 15))


def test_canonical():
    v = np.uint64(brute_kmer("AAAC"))
    r = np.uint64(brute_kmer("GTTT"))
    assert int(canonical(v, 4)) == int(v)
    assert int(canonical(r, 4)) == int(v)


def test_hamming_with_nmask():
    a = encode("ACGT")
    b = encode("ACTT")
    assert hamming(a, b) == 1
    nm = np.array([True, False, False, False])
    assert hamming(a, b, nm) == 2  # N position forces mismatch


def test_codes_to_kmer():
    assert int(codes_to_kmer(encode("ACGT"))) == 0b00011011
