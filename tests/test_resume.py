"""Mid-file resume by read offset (SURVEY §5 checkpoint/resume): a run
killed mid-file restarts from its journal and the merged output is
byte-identical to an uninterrupted run.  The reference has no such
capability — it rebuilds and restarts every run (aligner.cpp:537-547).
"""

from __future__ import annotations

import json

import pytest

import dbgtpu.engine.runner as runner_mod
from dbgtpu.pipeline import run_pipeline, run_pipeline_resumable

from .synth import make_dataset


def _dataset(tmp_path):
    reads_fa, unitigs_fa = make_dataset(
        seed=1307, genome_len=15000, k=21, n_reads=400, err_frac=0.5,
    )
    rf = tmp_path / "r.fa"
    uf = tmp_path / "u.fa"
    rf.write_bytes(reads_fa)
    uf.write_bytes(unitigs_fa)
    return str(rf), str(uf)


def _fresh(rf, uf):
    return run_pipeline([rf], uf, k=21, m=2, effort=2, impl="jax",
                        batch_size=32)


@pytest.mark.slow
def test_resume_uninterrupted_matches_buffered(tmp_path):
    rf, uf = _dataset(tmp_path)
    want_p, want_n, want_s = _fresh(rf, uf)
    pf, naf = str(tmp_path / "paths"), str(tmp_path / "na.fa")
    stats = run_pipeline_resumable(
        [rf], uf, k=21, paths_file=pf, na_file=naf, m=2, effort=2,
        batch_size=32, segment_records=64,
    )
    assert open(pf, "rb").read() == want_p
    assert open(naf, "rb").read() == want_n
    assert stats.aligned == want_s.aligned
    assert stats.read_number == want_s.read_number
    assert not (tmp_path / "paths.resume.json").exists()


@pytest.mark.slow
def test_resume_after_kill_byte_identical(tmp_path, monkeypatch):
    rf, uf = _dataset(tmp_path)
    want_p, want_n, want_s = _fresh(rf, uf)
    pf, naf = str(tmp_path / "paths"), str(tmp_path / "na.fa")

    real = runner_mod.align_bulk
    calls = {"n": 0}

    def dying(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:       # "kill -9" during the third segment
            raise KeyboardInterrupt("simulated kill")
        return real(*a, **kw)

    monkeypatch.setattr(runner_mod, "align_bulk", dying)
    with pytest.raises(KeyboardInterrupt):
        run_pipeline_resumable(
            [rf], uf, k=21, paths_file=pf, na_file=naf, m=2, effort=2,
            batch_size=32, segment_records=64,
        )
    monkeypatch.setattr(runner_mod, "align_bulk", real)

    journal = json.load(open(tmp_path / "paths.resume.json"))
    assert 0 < journal["record_off"] < 400   # genuinely mid-file

    # torn tail: bytes appended after the last journaled fsync must be
    # discarded on resume
    with open(pf, "ab") as f:
        f.write(b">torn\n999.\n")

    stats = run_pipeline_resumable(
        [rf], uf, k=21, paths_file=pf, na_file=naf, m=2, effort=2,
        batch_size=32, segment_records=64,
    )
    assert open(pf, "rb").read() == want_p
    assert open(naf, "rb").read() == want_n
    assert stats.aligned == want_s.aligned
    assert stats.read_number == want_s.read_number
    assert not (tmp_path / "paths.resume.json").exists()


def test_resume_rejects_mismatched_journal(tmp_path):
    rf, uf = _dataset(tmp_path)
    pf, naf = str(tmp_path / "paths"), str(tmp_path / "na.fa")
    (tmp_path / "paths.resume.json").write_text(json.dumps(
        {"version": 1, "fingerprint": "deadbeefdeadbeef",
         "file_idx": 0, "record_off": 100, "paths_bytes": 0,
         "na_bytes": 0,
         "stats": {"read_number": 0, "aligned": 0, "not_aligned": 0,
                   "no_overlap": 0}}
    ))
    with pytest.raises(ValueError, match="different inputs"):
        run_pipeline_resumable(
            [rf], uf, k=21, paths_file=pf, na_file=naf, m=2, effort=2,
            batch_size=32, segment_records=64,
        )


def test_progress_callback_fires(tmp_path, capsys):
    rf, uf = _dataset(tmp_path)
    run_pipeline([rf], uf, k=21, m=2, effort=2, impl="jax",
                 batch_size=64, progress_every=1)
    err = capsys.readouterr().err
    assert "[progress]" in err
    assert "400/400" in err
