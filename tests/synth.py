"""Synthetic genome / unitig / read generation for parity tests.

Builds a linear-path unitig cover of a random genome (consecutive
unitigs overlap by exactly k-1, BCALM2-style contract), optionally adds
"decoy" unitigs (interior-mutated copies sharing both extremities) to
create multi-candidate junctions that exercise tie-breaking, then
samples reads from the genome with optional errors and random strand.
"""

from __future__ import annotations

import numpy as np

BASES = b"ACGT"
_COMP = bytes.maketrans(b"ACGTN", b"TGCAA")


def revcomp(s: bytes) -> bytes:
    return s.translate(_COMP)[::-1]


def make_genome(rng: np.random.Generator, n: int) -> bytes:
    return bytes(rng.choice(np.frombuffer(BASES, np.uint8), size=n).tobytes())


def chop_unitigs(
    genome: bytes, k: int, rng: np.random.Generator,
    min_len: int = 40, max_len: int = 150,
) -> list[bytes]:
    """Cover the genome with unitigs overlapping by exactly k-1."""
    out = []
    pos = 0
    while pos + k <= len(genome):
        L = int(rng.integers(max(min_len, k), max_len + 1))
        L = min(L, len(genome) - pos)
        if L < k:
            break
        out.append(genome[pos : pos + L])
        pos += L - (k - 1)
    return out


def add_decoys(
    unitigs: list[bytes], k: int, rng: np.random.Generator, frac: float = 0.1
) -> list[bytes]:
    """Copies of random unitigs with 1-2 interior mutations, keeping both
    (k-1)-mer extremities intact -> extra junction candidates."""
    out = list(unitigs)
    n_decoys = int(len(unitigs) * frac)
    for _ in range(n_decoys):
        u = bytearray(unitigs[int(rng.integers(len(unitigs)))])
        interior = len(u) - 2 * (k - 1)
        if interior <= 0:
            continue
        for _ in range(int(rng.integers(1, 3))):
            p = (k - 1) + int(rng.integers(interior))
            u[p] = BASES[int(rng.integers(4))]
        out.append(bytes(u))
    return out


def orient_shuffle(
    unitigs: list[bytes], rng: np.random.Generator
) -> list[bytes]:
    """Randomly reverse-complement and shuffle (graph is strandless)."""
    out = [revcomp(u) if rng.random() < 0.5 else u for u in unitigs]
    perm = rng.permutation(len(out))
    return [out[i] for i in perm]


def sample_reads(
    genome: bytes, rng: np.random.Generator, n: int, read_len: int = 100,
    err_frac: float = 0.5, max_errs: int = 2, n_frac: float = 0.0,
) -> list[bytes]:
    reads = []
    for _ in range(n):
        p = int(rng.integers(0, len(genome) - read_len + 1))
        r = bytearray(genome[p : p + read_len])
        if rng.random() < err_frac:
            for _ in range(int(rng.integers(1, max_errs + 1))):
                q = int(rng.integers(read_len))
                r[q] = BASES[int(rng.integers(4))]
        if n_frac > 0 and rng.random() < n_frac:
            r[int(rng.integers(read_len))] = ord("N")
        r = bytes(r)
        if rng.random() < 0.5:
            r = revcomp(r)
        reads.append(r)
    return reads


def to_fasta(seqs: list[bytes], prefix: bytes = b"r") -> bytes:
    return b"".join(
        b">" + prefix + str(i).encode() + b"\n" + s + b"\n"
        for i, s in enumerate(seqs)
    )


def to_fastq(seqs: list[bytes], prefix: bytes = b"r") -> bytes:
    return b"".join(
        b"@" + prefix + str(i).encode() + b"\n" + s + b"\n+\n"
        + b"I" * len(s) + b"\n"
        for i, s in enumerate(seqs)
    )


def make_dataset(
    seed: int,
    genome_len: int = 20000,
    k: int = 31,
    n_reads: int = 200,
    read_len: int = 100,
    decoy_frac: float = 0.1,
    err_frac: float = 0.5,
    n_frac: float = 0.0,
    min_unitig: int = 40,
    max_unitig: int = 150,
):
    """Returns (reads_fasta_bytes, unitigs_fasta_bytes)."""
    rng = np.random.default_rng(seed)
    genome = make_genome(rng, genome_len)
    unitigs = chop_unitigs(genome, k, rng, min_unitig, max_unitig)
    unitigs = add_decoys(unitigs, k, rng, decoy_frac)
    unitigs = orient_shuffle(unitigs, rng)
    reads = sample_reads(
        genome, rng, n_reads, read_len, err_frac, n_frac=n_frac
    )
    return to_fasta(reads), to_fasta(unitigs, prefix=b"u")
