"""Index-build scalability (VERDICT r1 item 6).

The reference indexes 30k unitigs in <1 s (aligner.cpp:537-547) with a
shared-memory pthread build; dbgtpu's vectorized numpy build must stay
within the same order at 30k and scale to million-unitig graphs:

  - 200k unitigs: always-on test, full device index < 60 s (the 2 GB
    probe-table cap row scatter is host-bandwidth bound; ~36 s on the
    2-vCPU CI container, seconds on a real TPU host VM),
  - 1M unitigs (DBGTPU_SCALE_TESTS=1): < 60 s, probe table correctly
    skipped (bytes cap) with the visible fallback warning.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np
import pytest

from dbgtpu.index.build import build_graph_from_seqs
from dbgtpu.index.device import build_device_index, hbm_report

from . import synth


def _unitigs(n_target: int, seed: int):
    # ~65 bases of unique genome per unitig at 40-150 bp, k=31
    rng = np.random.default_rng(seed)
    genome = synth.make_genome(rng, int(n_target * 65))
    return synth.chop_unitigs(genome, 31, rng, 40, 150)


def test_build_200k_unitigs_fast():
    unitigs = _unitigs(200_000, 17)
    t0 = time.monotonic()
    g = build_graph_from_seqs(unitigs, 31)
    di = build_device_index(g)
    dt = time.monotonic() - t0
    assert len(unitigs) > 150_000
    assert dt < 60, f"200k-unitig build took {dt:.1f}s"
    assert di.probe_tbl is not None  # within the bytes cap at this size
    rep = hbm_report(di)
    assert rep["total"] > 0


@pytest.mark.skipif(
    not os.environ.get("DBGTPU_SCALE_TESTS"),
    reason="set DBGTPU_SCALE_TESTS=1 (adds ~1 min)",
)
def test_build_1m_unitigs_under_60s(caplog):
    unitigs = _unitigs(1_000_000, 18)
    t0 = time.monotonic()
    with caplog.at_level(logging.WARNING, logger="dbgtpu.index"):
        g = build_graph_from_seqs(unitigs, 31)
        di = build_device_index(g)
    dt = time.monotonic() - t0
    assert len(unitigs) > 900_000
    assert dt < 60, f"1M-unitig build took {dt:.1f}s"
    # probe table exceeds the bytes cap at this scale: skipped with a
    # visible warning, engine falls back to per-position probes
    assert di.probe_tbl is None
    assert any("probe table skipped" in r.message for r in caplog.records)
