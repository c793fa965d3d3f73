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


pytestmark = [
    pytest.mark.skipif(
        not oracle.reference_available(), reason="reference not mounted"
    ),
    pytest.mark.slow,  # reference binary + both impls per test
]


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


def _fastq_dataset(seed, genome_len=12000, k=21, n_reads=200):
    import numpy as np

    rng = np.random.default_rng(seed)
    genome = synth.make_genome(rng, genome_len)
    unitigs = synth.chop_unitigs(genome, k, rng, 40, 150)
    unitigs = synth.orient_shuffle(unitigs, rng)
    reads = synth.sample_reads(genome, rng, n_reads, 80, err_frac=0.4)
    return synth.to_fastq(reads), synth.to_fasta(unitigs, b"u")


def test_parity_fastq(tmp_path):
    """Pipeline-level fastq parity vs the reference, modulo its
    documented EOF defect: the reference processes the LAST record
    twice (aligner.cpp:50-69), emitting a duplicate of its output under
    an EMPTY header — verified here to be exactly `b"\\n" + <last
    line>` appended to our byte-identical prefix."""
    reads_fq, unitigs_fa = _fastq_dataset(61)
    ref_paths, ref_na, ref_out = oracle.run_reference(
        reads_fq, unitigs_fa, k=21, m=2, effort=2, extra_flags=["-q"]
    )
    rp = tmp_path / "reads.fq"
    up = tmp_path / "unitig.fa"
    rp.write_bytes(reads_fq)
    up.write_bytes(unitigs_fa)
    paths, na, stats = run_pipeline(
        [str(rp)], str(up), k=21, m=2, effort=2, impl="python",
        fastq=True,
    )
    # reference counts the duplicated last record too
    assert f"Reads : {stats.read_number + 1}" in ref_out
    if ref_paths != paths:
        assert ref_paths.startswith(paths)
        extra = ref_paths[len(paths):]
        last_line = paths.rstrip(b"\n").rsplit(b"\n", 1)[-1]
        assert extra == b"\n" + last_line + b"\n"
        assert ref_na == na
    else:
        # last record did not align: the duplicate lands in notAligned
        assert ref_na.startswith(na)
        extra = ref_na[len(na):]
        last_seq = na.rstrip(b"\n").rsplit(b"\n", 1)[-1]
        assert extra == b"\n" + last_seq + b"\n"


def test_parity_fastq_jax_equals_python(tmp_path):
    """Device engine == executable spec on fastq input, full bytes."""
    reads_fq, unitigs_fa = _fastq_dataset(62)
    rp = tmp_path / "reads.fq"
    up = tmp_path / "unitig.fa"
    rp.write_bytes(reads_fq)
    up.write_bytes(unitigs_fa)
    want = run_pipeline([str(rp)], str(up), k=21, m=2, effort=2,
                        impl="python", fastq=True)
    got = run_pipeline([str(rp)], str(up), k=21, m=2, effort=2,
                       impl="jax", fastq=True, batch_size=256)
    assert got[0] == want[0]
    assert got[1] == want[1]


def test_parity_stdout_stats_block(tmp_path):
    """Our RunStats.summary() count lines must be byte-equal to the
    reference's end-of-run stdout block (aligner.cpp:588-596); the two
    timing lines are excluded (wall-clock dependent)."""
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=71, genome_len=15000, k=21, n_reads=250, err_frac=0.6,
        decoy_frac=0.3,
    )
    _, _, ref_out = oracle.run_reference(
        reads_fa, unitigs_fa, k=21, m=2, effort=2
    )
    rp = tmp_path / "reads.fa"
    up = tmp_path / "unitig.fa"
    rp.write_bytes(reads_fa)
    up.write_bytes(unitigs_fa)
    _, _, stats = run_pipeline(
        [str(rp)], str(up), k=21, m=2, effort=2, impl="python",
    )
    want_lines = [
        l for l in ref_out.splitlines()
        if l.startswith(("The End", "Reads :", "No overlap",
                         "Got overlap", "Overlap "))
    ]
    got_lines = [
        l for l in stats.summary().splitlines()
        if l.startswith(("The End", "Reads :", "No overlap",
                         "Got overlap", "Overlap "))
    ]
    assert got_lines == want_lines
