"""Path mode (-p): simple-path constraint + stitching heuristic."""

from __future__ import annotations

import numpy as np
import pytest

from dbgtpu.constants import STATUS_ALIGNED_FWD
from dbgtpu.exhaustive import align_read_exhaustive
from dbgtpu.index.build import build_graph_from_seqs
from dbgtpu.model import recover_path
from dbgtpu.paths_mode import (
    align_read_exhaustive_path,
    align_read_greedy_path,
)
from dbgtpu.pipeline import run_pipeline
from dbgtpu.seq import encode, hamming, n_mask

from . import synth


def _parse_seqs(fa: bytes) -> list[bytes]:
    lines = fa.strip().split(b"\n")
    return [lines[i + 1] for i in range(0, len(lines), 2)]


def _dataset(seed=41, **kw):
    kw.setdefault("genome_len", 15000)
    kw.setdefault("k", 21)
    kw.setdefault("n_reads", 150)
    return synth.make_dataset(seed=seed, **kw)


def test_exhaustive_path_no_revisit_and_valid():
    reads_fa, unitigs_fa = _dataset()
    g = build_graph_from_seqs(_parse_seqs(unitigs_fa), 21)
    n_ok = 0
    for r in _parse_seqs(reads_fa):
        codes, nm = encode(r), n_mask(r)
        st, path = align_read_exhaustive_path(g, codes, nm, 2)
        if st == STATUS_ALIGNED_FWD:
            n_ok += 1
            ids = path[1:]
            assert len(ids) == len(set(ids)), "unitig revisited"
            rec = recover_path(g, path, len(r))
            assert hamming(codes, rec, nm) <= 2
    assert n_ok > 20


def test_exhaustive_path_subset_of_exhaustive():
    """The simple-path constraint only removes alignments."""
    reads_fa, unitigs_fa = _dataset(seed=42)
    g = build_graph_from_seqs(_parse_seqs(unitigs_fa), 21)
    for r in _parse_seqs(reads_fa):
        codes, nm = encode(r), n_mask(r)
        stp, _ = align_read_exhaustive_path(g, codes, nm, 2)
        ste, _ = align_read_exhaustive(g, codes, nm, 2)
        if stp == STATUS_ALIGNED_FWD:
            assert ste == STATUS_ALIGNED_FWD


def test_greedy_path_aligns_and_valid():
    reads_fa, unitigs_fa = _dataset(seed=43, err_frac=0.3)
    g = build_graph_from_seqs(_parse_seqs(unitigs_fa), 21)
    n_ok = 0
    for r in _parse_seqs(reads_fa):
        codes, nm = encode(r), n_mask(r)
        st, path = align_read_greedy_path(g, codes, nm, 2, 2)
        if st == STATUS_ALIGNED_FWD:
            n_ok += 1
            rec = recover_path(g, path, len(r))
            assert hamming(codes, rec, nm) <= 2
    assert n_ok > 20


def test_cli_paths_mode(tmp_path):
    reads_fa, unitigs_fa = _dataset(seed=44)
    rf = tmp_path / "r.fa"
    uf = tmp_path / "u.fa"
    rf.write_bytes(reads_fa)
    uf.write_bytes(unitigs_fa)
    for mode in ("paths", "paths-exhaustive"):
        paths, na, stats = run_pipeline(
            [str(rf)], str(uf), k=21, mode=mode
        )
        assert stats.aligned > 0
        assert paths.count(b"\n") == 2 * stats.aligned
