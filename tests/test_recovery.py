"""Batch-level failure recovery (SURVEY §5): a device dispatch or
result-fetch failure must not lose the run — the affected batches are
recomputed on host (mapping is stateless per read) and the output
stays byte-identical.  Dispatch is grouped (runner.DISPATCH_GROUP), so
a failure recovers every batch of its group."""

from __future__ import annotations

import pytest

import dbgtpu.engine.runner as runner_mod
from dbgtpu.pipeline import run_pipeline

from .synth import make_dataset

pytestmark = pytest.mark.slow  # heavy parity/scale suite (full gate)


def _dataset(tmp_path):
    reads_fa, unitigs_fa = make_dataset(
        seed=611, genome_len=15000, k=21, n_reads=400, err_frac=0.5,
    )
    rf = tmp_path / "r.fa"
    uf = tmp_path / "u.fa"
    rf.write_bytes(reads_fa)
    uf.write_bytes(unitigs_fa)
    return str(rf), str(uf)


def test_dispatch_failure_recovers_byte_identical(tmp_path, monkeypatch):
    rf, uf = _dataset(tmp_path)
    monkeypatch.setenv("DBGTPU_DISPATCH_GROUP", "2")  # 4 batches, 2 groups
    want_p, want_n, want_s = run_pipeline(
        [rf], uf, k=21, m=2, effort=2, impl="jax", batch_size=128,
    )

    real = runner_mod.align_batches_packed_compact
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:      # second group dispatch blows up
            raise RuntimeError("injected device failure")
        return real(*a, **kw)

    monkeypatch.setattr(runner_mod, "align_batches_packed_compact", flaky)
    got_p, got_n, got_s = run_pipeline(
        [rf], uf, k=21, m=2, effort=2, impl="jax", batch_size=128,
    )
    assert calls["n"] >= 2       # the injection actually fired
    assert got_p == want_p
    assert got_n == want_n
    assert got_s.aligned == want_s.aligned


def test_result_fetch_failure_recovers(tmp_path, monkeypatch):
    rf, uf = _dataset(tmp_path)
    monkeypatch.setenv("DBGTPU_DISPATCH_GROUP", "2")
    want_p, want_n, _ = run_pipeline(
        [rf], uf, k=21, m=2, effort=2, impl="jax", batch_size=128,
    )

    real = runner_mod.align_batches_packed_compact
    calls = {"n": 0}

    class _Poison:
        """Looks dispatchable; fails at result-fetch time."""

        def copy_to_host_async(self):
            pass

        def __array__(self, *a, **kw):
            raise RuntimeError("injected fetch failure")

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return _Poison(), _Poison()
        return real(*a, **kw)

    monkeypatch.setattr(runner_mod, "align_batches_packed_compact", flaky)
    got_p, got_n, _ = run_pipeline(
        [rf], uf, k=21, m=2, effort=2, impl="jax", batch_size=128,
    )
    assert got_p == want_p
    assert got_n == want_n


def test_persistent_failure_fails_fast(tmp_path, monkeypatch):
    """A fault on EVERY dispatch must not silently degrade into the
    ~50x-slower host spec for the whole run (ADVICE r3): the runner
    raises after MAX_CONSEC_RECOVERIES consecutive recoveries."""
    rf, uf = _dataset(tmp_path)
    monkeypatch.setenv("DBGTPU_DISPATCH_GROUP", "1")
    monkeypatch.setattr(runner_mod, "MAX_CONSEC_RECOVERIES", 2)

    def always_fail(*a, **kw):
        raise RuntimeError("persistent device fault")

    monkeypatch.setattr(runner_mod, "align_batches_packed_compact",
                        always_fail)
    with pytest.raises(RuntimeError, match="consecutive batch-level"):
        run_pipeline(
            [rf], uf, k=21, m=2, effort=2, impl="jax", batch_size=64,
        )
