"""Byte-parity of the executable spec vs the compiled reference on
synthetic datasets across k, m, effort, error rates (SURVEY.md §4 item 1)."""

import pytest

from dbgtpu.pipeline import run_pipeline
from . import oracle, synth


def _run_both(reads_fa: bytes, unitigs_fa: bytes, k: int, m: int, effort: int,
              tmp_path, correction: bool = False):
    ref_paths, ref_na, _ = oracle.run_reference(
        reads_fa, unitigs_fa, k=k, m=m, effort=effort,
        extra_flags=["-c"] if correction else None,
    )
    rp = tmp_path / "reads.fa"
    up = tmp_path / "unitig.fa"
    rp.write_bytes(reads_fa)
    up.write_bytes(unitigs_fa)
    paths, na, _ = run_pipeline(
        [str(rp)], str(up), k=k, m=m, effort=effort, impl="python",
        correction=correction,
    )
    return (paths, na), (ref_paths, ref_na)


pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference not mounted"
)


@pytest.mark.parametrize("seed,k,m", [
    (1, 31, 2),
    (2, 31, 0),
    (3, 15, 2),
    (4, 21, 1),
    (5, 31, 2),
])
def test_parity_synthetic(tmp_path, seed, k, m):
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=seed, genome_len=20000, k=k, n_reads=300,
    )
    ours, ref = _run_both(reads_fa, unitigs_fa, k, m, 2, tmp_path)
    assert ours[0] == ref[0]
    assert ours[1] == ref[1]


def test_parity_high_effort(tmp_path):
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=11, genome_len=15000, k=31, n_reads=200, err_frac=0.9,
    )
    ours, ref = _run_both(reads_fa, unitigs_fa, 31, 2, 10, tmp_path)
    assert ours == ref


def test_parity_short_unitigs(tmp_path):
    # unitigs barely longer than k -> deep walks, many junctions
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=21, genome_len=8000, k=15, n_reads=200,
        min_unitig=15, max_unitig=40,
    )
    ours, ref = _run_both(reads_fa, unitigs_fa, 15, 2, 2, tmp_path)
    assert ours == ref


def test_parity_n_reads(tmp_path):
    # reads containing 'N': encodes as T for anchors, literal mismatch in
    # compares, RC('N')='A'
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=31, genome_len=10000, k=21, n_reads=300, n_frac=0.5,
    )
    ours, ref = _run_both(reads_fa, unitigs_fa, 21, 2, 2, tmp_path)
    assert ours == ref


def test_parity_correction_mode(tmp_path):
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=41, genome_len=10000, k=31, n_reads=200,
    )
    ours, ref = _run_both(
        reads_fa, unitigs_fa, 31, 2, 2, tmp_path, correction=True
    )
    assert ours == ref


def test_parity_multifile(tmp_path):
    reads_a, unitigs_fa = synth.make_dataset(seed=51, genome_len=10000, k=31,
                                             n_reads=100)
    reads_b, _ = synth.make_dataset(seed=52, genome_len=10000, k=31,
                                    n_reads=100)
    ref_paths, ref_na, _ = oracle.run_reference(
        b"", unitigs_fa, k=31, reads_files=[reads_a, reads_b]
    )
    pa = tmp_path / "a.fa"
    pb = tmp_path / "b.fa"
    up = tmp_path / "unitig.fa"
    pa.write_bytes(reads_a)
    pb.write_bytes(reads_b)
    up.write_bytes(unitigs_fa)
    paths, na, _ = run_pipeline(
        [str(pa), str(pb)], str(up), k=31, m=2, effort=2, impl="python"
    )
    assert paths == ref_paths
    assert na == ref_na
