"""Multi-device (virtual 8-CPU mesh) tests: sharded batch == single
device results; psum stats correct; driver entry points run."""

import numpy as np
import pytest

import dbgtpu  # noqa: F401  (package import first)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    res = jax.jit(fn)(*args)
    jax.block_until_ready(res)
    status = np.asarray(res["status"])
    assert (status[:2] == 1).all()


@pytest.mark.slow
def test_sharded_matches_single():
    import jax
    from dbgtpu.dist.mesh import align_batch_sharded, make_mesh
    from dbgtpu.engine.core import align_batch
    from dbgtpu.engine.runner import get_device_index, pack_batch
    from dbgtpu.engine.core import index_to_device
    from dbgtpu.index.build import build_graph_from_seqs

    from .synth import make_dataset

    reads_fa, unitigs_fa = make_dataset(seed=301, genome_len=8000, k=21,
                                        n_reads=64)
    useqs = [l for i, l in enumerate(unitigs_fa.splitlines()) if i % 2 == 1]
    g = build_graph_from_seqs(useqs, 21)
    di = get_device_index(g)
    ix = index_to_device(di)
    rseqs = [l for i, l in enumerate(reads_fa.splitlines()) if i % 2 == 1]
    codes, nm, lens = pack_batch(rseqs, 64, 128)

    single = align_batch(ix, codes, nm, lens, k=21, m=2, effort=2)
    mesh = make_mesh(8)
    sharded, counts = align_batch_sharded(
        mesh, ix, codes, nm, lens, k=21, m=2, effort=2,
    )
    for key in ("status", "offset", "llen", "rlen", "lbuf", "rbuf",
                "orient"):
        np.testing.assert_array_equal(
            np.asarray(single[key]), np.asarray(sharded[key]), err_msg=key
        )
    counts = np.asarray(counts)
    assert counts.sum() == 64
    st = np.asarray(single["status"])
    for s in range(6):
        assert counts[s] == (st == s).sum()
