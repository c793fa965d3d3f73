"""Host-side batching around the device engine.

Collects parsed reads into fixed-shape batches (static B, length-
bucketed L so jit compiles once per bucket), ships them through
align_batch, and unpacks per-read paths in input order.
"""

from __future__ import annotations

import functools
from typing import Iterator, Tuple

import numpy as np

from ..constants import STATUS_ALIGNED_FWD, STATUS_ALIGNED_RC
from ..index.build import UnitigGraph
from ..index.device import DeviceIndex, build_device_index
from ..seq import encode, n_mask
from .core import align_batch, index_to_device, jl_meta_of

_ALIGNED = (STATUS_ALIGNED_FWD, STATUS_ALIGNED_RC)


def get_device_index(
    graph: UnitigGraph, layout: str = "scan"
) -> DeviceIndex:
    attr = "_device_index" if layout == "scan" else f"_device_index_{layout}"
    di = getattr(graph, attr, None)
    if di is None:
        di = build_device_index(graph, layout=layout)
        setattr(graph, attr, di)
    return di


def _bucket_len(n: int, k: int) -> int:
    """Round read length up to a bucket (multiples of 16 up to 256,
    then multiples of 256) to bound jit recompiles.  16-granular
    buckets keep scan/compare work proportional to the real read
    length (a 100 bp read maps at L=112, not 128 — the pow-2 bucketing
    wasted ~15% of the mapping step); reads within a batch share one
    bucket, and datasets are near-uniform length in practice."""
    n = max(n, k + 1, 64)
    if n <= 256:
        return ((n + 15) // 16) * 16
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


def _pmax_for(di: DeviceIndex, L: int) -> int:
    """Static packed-path bound: offset + per-direction walk count.
    Each junction consumes at least (min unitig len - (k-1)) read bases;
    overflow rows (plen > pmax) are recomputed on host (rare)."""
    ul = di.ulen[1:]
    stride = max(1, int(ul.min(initial=1)) - (di.k - 1))
    return int(1 + 2 * ((L + stride - 1) // stride) + 4)


def align_bulk(
    graph: UnitigGraph,
    parsed,                      # native.ParsedReads
    m: int,
    effort: int,
    batch_size: int = 8192,
    mode: str = "greedy",
    partial: bool = False,
    mesh=None,                   # jax.sharding.Mesh: shard batches over it
    index_layout: str = "scan",  # "mphf" = compact junction layout
):
    """Bulk array alignment, input order preserved.

    Returns (status int32 [N], path_off int64 [N+1], paths_flat int32)
    where aligned reads' spans hold [offset, signed ids...] and
    non-aligned reads have empty spans.

    With `mesh`, every batch is sharded over the mesh's reads axis
    (index replicated, packed paths computed per shard on device, stats
    psum-reduced) — the multi-chip path; output bytes are identical to
    the single-device run.
    """
    if mode == "greedy":
        from ..model import align_read_greedy

        def batch_fn(ix, codes, nmask, lens, *, k, m, pmax):
            return align_batch(
                ix, codes, nmask, lens, k=k, m=m, effort=effort,
                pmax=pmax, jl_meta=jlm,
            )

        def spec_align(graph, codes, nm):
            return align_read_greedy(graph, codes, nm, m, effort)
    elif mode == "anchors":
        from ..anchors import align_read_greedy_anchors
        from .dog import align_batch_anchors

        def batch_fn(ix, codes, nmask, lens, *, k, m, pmax):
            return align_batch_anchors(
                ix, codes, nmask, lens, k=k, m=m, effort=effort,
                pmax=pmax, jl_meta=jlm,
            )

        def spec_align(graph, codes, nm):
            return align_read_greedy_anchors(graph, codes, nm, m, effort)
    elif mode == "exhaustive":
        from ..exhaustive import align_read_exhaustive
        from .exhaustive import align_batch_exhaustive

        def batch_fn(ix, codes, nmask, lens, *, k, m, pmax):
            return align_batch_exhaustive(
                ix, codes, nmask, lens, k=k, m=m, partial=partial,
                pmax=pmax, jl_meta=jlm,
            )

        def spec_align(graph, codes, nm):
            return align_read_exhaustive(graph, codes, nm, m, partial)
    else:
        raise ValueError(f"no device engine for mode {mode!r}")
    di = get_device_index(graph, index_layout)
    jlm = jl_meta_of(di)
    ix = index_to_device(di)
    k = graph.k
    if mesh is not None:
        from ..dist.mesh import shard_batch_fn

        nmesh = mesh.devices.size
        if batch_size % nmesh:
            batch_size = ((batch_size + nmesh - 1) // nmesh) * nmesh
        inner = batch_fn

        def batch_fn(ix, codes, nmask, lens, *, k, m, pmax):
            bound = functools.partial(inner, k=k, m=m, pmax=pmax)
            res, _counts = shard_batch_fn(mesh, bound)(
                ix, codes, nmask, lens
            )
            return res
    N = parsed.n
    lens_all = np.diff(parsed.seq_off).astype(np.int32)
    status_all = np.zeros(N, np.int32)
    counts_all = np.zeros(N, np.int64)
    flat_parts: list[np.ndarray] = []

    pending: list[tuple[int, dict, int, int]] = []  # (s0, res, nb, pmax)

    def drain():
        for s0, res, nb, pmax in pending:
            status = np.asarray(res["status"])[:nb]
            paths = np.asarray(res["paths"])[:nb]
            plen = np.asarray(res["plen"])[:nb]
            aligned = (status == 1) | (status == 2)
            over = aligned & (plen > pmax)
            if over.any():
                # rare fallback: recompute overflow rows on host
                for i in np.nonzero(over)[0]:
                    gi = s0 + int(i)
                    _, codes, nm = parsed.record(gi)
                    st, path = spec_align(graph, codes, nm)
                    status[i] = st
                    row = np.zeros(pmax, np.int32)
                    pl = 0
                    if path is not None:
                        pl = min(len(path), pmax)
                        row[:pl] = path[:pl]
                    paths[i] = row
                    plen[i] = pl
                aligned = (status == 1) | (status == 2)
            status_all[s0 : s0 + nb] = status
            counts = np.where(aligned, np.minimum(plen, pmax), 0)
            counts_all[s0 : s0 + nb] = counts
            cols = np.arange(paths.shape[1])[None, :]
            mask = aligned[:, None] & (cols < counts[:, None])
            flat_parts.append(paths[mask])
        pending.clear()

    for s0 in range(0, N, batch_size):
        nb = min(batch_size, N - s0)
        lens = lens_all[s0 : s0 + nb]
        L = _bucket_len(int(lens.max(initial=k + 1)), k)
        pmax = _pmax_for(di, L)
        starts = parsed.seq_off[s0 : s0 + nb]
        col = np.arange(L, dtype=np.int64)[None, :]
        gidx = starts[:, None] + np.minimum(col, (lens - 1)[:, None])
        valid = col < lens[:, None]
        codes = np.zeros((batch_size, L), np.uint8)
        nmask = np.zeros((batch_size, L), bool)
        codes[:nb] = np.where(valid, parsed.codes[gidx], 0)
        nmask[:nb] = parsed.nmask[gidx] & valid
        blens = np.zeros(batch_size, np.int32)
        blens[:nb] = lens
        res = batch_fn(
            ix, codes, nmask, blens,
            k=k, m=m, pmax=pmax,
        )
        pending.append((s0, res, nb, pmax))
        if len(pending) >= 4:  # keep a short device pipeline
            drain()
    drain()

    path_off = np.zeros(N + 1, np.int64)
    np.cumsum(counts_all, out=path_off[1:])
    paths_flat = (
        np.concatenate(flat_parts) if flat_parts else np.zeros(0, np.int32)
    )
    return status_all, path_off, paths_flat


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
    pending: list[Tuple[bytes, bytes]] = []

    def flush():
        if not pending:
            return
        B = batch_size
        L = _bucket_len(max(len(s) for _, s in pending), k)
        codes, nm, lens = pack_batch([s for _, s in pending], B, L)
        res = align_batch(
            ix, codes, nm, lens,
            k=k, m=m, effort=effort,
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
