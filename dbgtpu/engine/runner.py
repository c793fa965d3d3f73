"""Host-side batching around the device engine.

Collects parsed reads into fixed-shape batches (static B, length-
bucketed L so jit compiles once per bucket), ships them through
align_batch, and unpacks per-read paths in input order.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from ..constants import STATUS_ALIGNED_FWD, STATUS_ALIGNED_RC
from ..index.build import UnitigGraph
from ..index.device import DeviceIndex, build_device_index
from ..seq import encode, n_mask
from .core import align_batch, index_to_device

_ALIGNED = (STATUS_ALIGNED_FWD, STATUS_ALIGNED_RC)


def get_device_index(graph: UnitigGraph) -> DeviceIndex:
    di = getattr(graph, "_device_index", None)
    if di is None:
        di = build_device_index(graph)
        graph._device_index = di
    return di


def _bucket_len(n: int, k: int) -> int:
    """Round read length up to a bucket (powers of two up to 256, then
    multiples of 256) to bound jit recompiles."""
    n = max(n, k + 1, 64)
    if n <= 256:
        b = 64
        while b < n:
            b *= 2
        return b
    return ((n + 255) // 256) * 256


def pack_batch(seqs: list[bytes], B: int, L: int):
    codes = np.zeros((B, L), np.uint8)
    nm = np.zeros((B, L), bool)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = encode(s)
        nm[i, : len(s)] = n_mask(s)
        lens[i] = len(s)
    return codes, nm, lens


def unpack_result(res: dict, i: int):
    """(status, path or None) for batch row i."""
    status = int(res["status"][i])
    if status not in _ALIGNED:
        return status, None
    llen = int(res["llen"][i])
    rlen = int(res["rlen"][i])
    path = [int(res["offset"][i])]
    path.extend(int(v) for v in res["lbuf"][i, :llen][::-1])
    path.extend(int(v) for v in res["rbuf"][i, :rlen])
    return status, path


def align_stream_jax(
    graph: UnitigGraph,
    records: Iterator[Tuple[bytes, bytes]],
    m: int,
    effort: int,
    batch_size: int = 8192,
):
    """Yield (header, seq, status, path) in input order."""
    di = get_device_index(graph)
    ix = index_to_device(di)
    k = graph.k
    probe_len = di.tbl.probe_len

    pending: list[Tuple[bytes, bytes]] = []

    def flush():
        if not pending:
            return
        B = batch_size
        L = _bucket_len(max(len(s) for _, s in pending), k)
        codes, nm, lens = pack_batch([s for _, s in pending], B, L)
        res = align_batch(
            ix, codes, nm, lens,
            k=k, m=m, effort=effort, probe_len=probe_len,
        )
        res = {kk: np.asarray(v) for kk, v in res.items()}
        for i, (header, seq) in enumerate(pending):
            status, path = unpack_result(res, i)
            yield header, seq, status, path
        pending.clear()

    for rec in records:
        pending.append(rec)
        if len(pending) == batch_size:
            yield from flush()
    yield from flush()
