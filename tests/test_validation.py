"""Round-5 product hardening: k-range validation, --impl auto
resolution, journal fingerprint completeness, cumulative progress."""

from __future__ import annotations

import pytest

from dbgtpu.cli import main as cli_main
from dbgtpu.index.build import build_graph_from_seqs, validate_k
from dbgtpu.pipeline import _journal_fingerprint, run_pipeline_resumable

from .synth import make_dataset


def test_k_out_of_range_rejected():
    # k > 32 used to silently overflow the uint64 extremity shifts and
    # produce wrong output (reference cap: kmer=uint64, utils.h:27-28)
    for bad in (0, 1, 33, 34, 64):
        with pytest.raises(ValueError, match="out of range"):
            validate_k(bad)
        with pytest.raises(ValueError, match="out of range"):
            build_graph_from_seqs([b"ACGTACGTACGT" * 8], bad)
    for ok in (2, 4, 21, 31, 32):
        validate_k(ok)


def test_cli_rejects_bad_k(tmp_path, monkeypatch):
    reads_fa, unitigs_fa = make_dataset(
        seed=5, genome_len=3000, k=21, n_reads=10, err_frac=0.0,
    )
    (tmp_path / "r.fa").write_bytes(reads_fa)
    (tmp_path / "u.fa").write_bytes(unitigs_fa)
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit) as ei:
        cli_main(["-r", "r.fa", "-k", "34", "-g", "u.fa"])
    assert ei.value.code == 2


def test_cli_impl_auto_resolves_on_cpu(tmp_path, monkeypatch, capsys):
    """Default invocation (no --impl) must run end-to-end; on the CPU
    test backend auto resolves to the python spec, on TPU to the device
    engine — output bytes are identical either way (parity suite)."""
    reads_fa, unitigs_fa = make_dataset(
        seed=7, genome_len=3000, k=21, n_reads=20, err_frac=0.3,
    )
    (tmp_path / "r.fa").write_bytes(reads_fa)
    (tmp_path / "u.fa").write_bytes(unitigs_fa)
    monkeypatch.chdir(tmp_path)
    assert cli_main(["-r", "r.fa", "-k", "21", "-g", "u.fa"]) == 0
    want_p = (tmp_path / "paths").read_bytes()
    assert want_p  # something aligned
    # explicit jax engine produces the same bytes
    (tmp_path / "paths").unlink()
    assert cli_main(
        ["-r", "r.fa", "-k", "21", "-g", "u.fa", "--impl", "jax"]
    ) == 0
    assert (tmp_path / "paths").read_bytes() == want_p


def test_fingerprint_covers_partial():
    # ADVICE r4: a run killed without -i and resumed with -i must be
    # rejected — partial changes how records are computed
    base = dict(reads_files=["r.fa"], unitig_file="u.fa", k=21, m=2,
                effort=2, mode="exhaustive", fastq=False,
                correction=False)
    assert (_journal_fingerprint(**base, partial=False)
            != _journal_fingerprint(**base, partial=True))


def test_progress_cumulative_across_segments(tmp_path, capsys):
    """Per-segment align_bulk calls reset done/total; the printer must
    report cumulative counts (ADVICE r4: the reads/s figure collapsed
    toward zero after the first segment)."""
    reads_fa, unitigs_fa = make_dataset(
        seed=11, genome_len=8000, k=21, n_reads=200, err_frac=0.3,
    )
    rf, uf = tmp_path / "r.fa", tmp_path / "u.fa"
    rf.write_bytes(reads_fa)
    uf.write_bytes(unitigs_fa)
    run_pipeline_resumable(
        [str(rf)], str(uf), k=21,
        paths_file=str(tmp_path / "paths"),
        na_file=str(tmp_path / "na.fa"),
        m=2, effort=2, batch_size=32, segment_records=64,
        progress_every=1,
    )
    err = capsys.readouterr().err
    assert "reads 200/200" in err       # cumulative, not per-segment
