"""Multi-host helpers: sharding determinism + ordered merge."""

from __future__ import annotations

import pytest

from dbgtpu.dist.multihost import (
    merge_shards,
    shard_files,
    shard_path,
    shard_ranges,
)


def test_shard_files_partition():
    files = [f"f{i}" for i in range(7)]
    shards = [shard_files(files, p, 3) for p in range(3)]
    assert sorted(sum(shards, [])) == sorted(files)
    assert shards[0] == ["f0", "f3", "f6"]


def test_shard_ranges_cover():
    rs = shard_ranges(10, 3)
    assert rs == [(0, 4), (4, 7), (7, 10)]
    assert shard_ranges(2, 4) == [(0, 1), (1, 2), (2, 2), (2, 2)]


def test_merge_shards_order_and_missing(tmp_path):
    base = str(tmp_path / "paths")
    for i, content in enumerate([b"AAA", b"BBB", b"CCC"]):
        open(shard_path(base, i), "wb").write(content)
    merge_shards(base, 3)
    assert open(base, "rb").read() == b"AAABBBCCC"
    # missing shard refuses to merge
    open(shard_path(base, 0), "wb").write(b"X")
    with pytest.raises(FileNotFoundError):
        merge_shards(base, 2)  # shard1 was removed by previous merge
