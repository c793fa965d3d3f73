"""MPHF (BBHash-equivalent) unit tests: perfect-hash property, host vs
device lookup equivalence, persistence roundtrip."""

from __future__ import annotations

import numpy as np
import pytest

from dbgtpu.engine.kmer32 import split64
from dbgtpu.index.mphf import (
    MPHF,
    build_mphf,
    device_lookup,
    to_device_arrays,
)


def _random_keys(n, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 2**63, size=2 * n, dtype=np.uint64)
    return np.unique(keys)[:n]


@pytest.mark.parametrize("n,gamma", [(0, 2.0), (1, 2.0), (100, 2.0),
                                     (5000, 2.0), (5000, 10.0),
                                     (5000, 1.05)])
def test_mphf_is_minimal_and_perfect(n, gamma):
    keys = _random_keys(n, seed=n)
    m = build_mphf(keys, gamma=gamma)
    slots = m.lookup(keys)
    assert sorted(slots.tolist()) == list(range(n))


def test_mphf_tight_gamma_uses_final_table():
    keys = _random_keys(4000, seed=3)
    m = build_mphf(keys, gamma=1.05, max_levels=3)
    assert m.final_tbl is not None  # survivors fell through 3 levels
    slots = m.lookup(keys)
    assert sorted(slots.tolist()) == list(range(4000))


def test_absent_keys_alias_or_not_found():
    keys = _random_keys(2000, seed=5)
    m = build_mphf(keys, gamma=2.0)
    absent = _random_keys(4000, seed=99)
    absent = np.setdiff1d(absent, keys)
    slots = m.lookup(absent)
    # contract: any value in [0, n) or NOT_FOUND; never >= n
    assert slots.max() < 2000
    # most absent keys do land somewhere (bit aliasing) or NOT_FOUND;
    # both are fine — just must not crash or exceed range
    assert (slots >= -1).all()


def test_device_lookup_matches_host():
    import jax

    keys = _random_keys(3000, seed=7)
    m = build_mphf(keys, gamma=1.2, max_levels=4)  # forces final table
    arrs = to_device_arrays(m)
    absent = np.setdiff1d(_random_keys(1000, seed=13), keys)
    queries = np.concatenate([keys, absent])
    qhi, qlo = split64(queries)

    fn = jax.jit(lambda h, l: device_lookup(arrs, h, l))
    dev = np.asarray(fn(qhi, qlo))
    host = m.lookup(queries)
    np.testing.assert_array_equal(dev, host.astype(np.int64))


def test_engine_mphf_slot_matches_device_lookup():
    """engine.core._mphf_slot reimplements mphf.device_lookup over the
    fused final-table rows; the two must agree on key AND non-key
    queries (advisor r2: divergence guard)."""
    import jax.numpy as jnp

    from dbgtpu.engine import core as C
    from dbgtpu.index.device import build_mphf_junction

    keys = _random_keys(3000, seed=21)
    vals = np.arange(8 * 3000, dtype=np.int32).reshape(3000, 8)
    mj = build_mphf_junction(keys, vals)
    m = mj.mphf

    class _DI:  # minimal DeviceIndex stand-in for index_to_device
        scan_tbl = None
        probe_tbl = None
        anchor_scan = None
        mphf_junction = mj
        umeta = np.zeros((1, 16), np.int32)
        pool_rows = np.zeros((1, 10), np.uint32)
        n_chunks = 1

    ix = C.index_to_device(_DI())
    jl = C.jl_meta_of(_DI())
    absent = np.setdiff1d(_random_keys(1500, seed=23), keys)
    queries = np.concatenate([keys, absent])
    qhi, qlo = split64(queries)
    got = np.asarray(C._mphf_slot(ix, jl, jnp.asarray(qhi),
                                  jnp.asarray(qlo)))
    want = np.asarray(device_lookup(to_device_arrays(m), qhi, qlo))
    np.testing.assert_array_equal(got, want)


def test_save_load_roundtrip(tmp_path):
    keys = _random_keys(2500, seed=11)
    m = build_mphf(keys, gamma=2.0)
    p = str(tmp_path / "idx.mphf.npz")
    m.save(p)
    m2 = MPHF.load(p)
    np.testing.assert_array_equal(m.lookup(keys), m2.lookup(keys))
    assert m2.total_bits() == m.total_bits()


def test_total_bits_reasonable():
    keys = _random_keys(10000, seed=17)
    m = build_mphf(keys, gamma=2.0)
    # pow2-rounded gamma=2 cascade stays well under 64 bits/key
    assert m.total_bits() / len(keys) < 64
