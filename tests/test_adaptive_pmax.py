"""Adaptive result-width cap (round 5 D2H diet): batches dispatch with
a small pmax; overflowing batches are re-dispatched at the full bound
(device-exact) and the cap ratchets up.  Output bytes must be identical
to the spec regardless of the starting cap."""

from __future__ import annotations

import numpy as np
import pytest

import dbgtpu.engine.runner as runner_mod
from dbgtpu.pipeline import run_pipeline

from .synth import make_dataset


def _run(tmp_path, reads_fa, unitigs_fa, k, **kw):
    rf, uf = tmp_path / "r.fa", tmp_path / "u.fa"
    rf.write_bytes(reads_fa)
    uf.write_bytes(unitigs_fa)
    return run_pipeline([str(rf)], str(uf), k=k, m=2, effort=2, **kw)


def test_overflow_redispatch_byte_identical(tmp_path, monkeypatch):
    """Tiny unitigs (len 22..30 at k=21) make real paths 10-20 slots,
    far over the quantized init cap of 8: every batch overflows and
    takes the whole-batch device redispatch path.  Bytes must equal
    the python spec's."""
    reads_fa, unitigs_fa = make_dataset(
        seed=4242, genome_len=6000, k=21, n_reads=150, err_frac=0.3,
        min_unitig=22, max_unitig=30,
    )
    monkeypatch.setattr(runner_mod, "PMAX_INIT", 4)
    want = _run(tmp_path, reads_fa, unitigs_fa, 21, impl="python")
    got = _run(tmp_path, reads_fa, unitigs_fa, 21, impl="jax",
               batch_size=64)
    assert got[0] == want[0]
    assert got[1] == want[1]
    # sanity: these paths genuinely exceed the init cap
    plens = [len(line.split(b".")) - 1 for line in want[0].split(b"\n")
             if line and not line.startswith(b">")]
    assert plens and max(plens) > 8


def test_payload_accounting(tmp_path):
    reads_fa, unitigs_fa = make_dataset(
        seed=77, genome_len=8000, k=21, n_reads=300, err_frac=0.3,
    )
    _, _, st = _run(tmp_path, reads_fa, unitigs_fa, 21, impl="jax",
                    batch_size=128)
    assert st.payload_h2d_bytes > 0
    assert st.payload_d2h_bytes > 0
    # D2H must reflect the tight adaptive width, not the static bound:
    # <= (2 + cap) int16 per read per batch (plus padding to batch
    # multiples), far under the former 2+30 slots
    d = st.as_dict()
    assert d["payload_h2d_bytes"] == st.payload_h2d_bytes


def test_ratchet_quantization():
    q = runner_mod._quantize_pmax
    assert q(1) == 4 and q(4) == 4 and q(5) == 8 and q(8) == 8
    assert q(9) == 12 and q(30) == 32


def test_compact_d2h_matches_padded(tmp_path, monkeypatch):
    """The compact-D2H result transform (sorted column prefixes + host
    reconstruction) must be byte-identical to the padded path."""
    reads_fa, unitigs_fa = make_dataset(
        seed=909, genome_len=9000, k=21, n_reads=400, err_frac=0.5,
        n_frac=0.05,
    )
    monkeypatch.setenv("DBGTPU_COMPACT_D2H", "0")
    want = _run(tmp_path, reads_fa, unitigs_fa, 21, impl="jax",
                batch_size=2048)
    monkeypatch.setenv("DBGTPU_COMPACT_D2H", "1")
    got = _run(tmp_path, reads_fa, unitigs_fa, 21, impl="jax",
               batch_size=2048)
    assert got[0] == want[0]
    assert got[1] == want[1]
    # compact run must ship fewer result bytes
    assert got[2].payload_d2h_bytes < want[2].payload_d2h_bytes
