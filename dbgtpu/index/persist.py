"""Index persistence: save/load the built graph index.

The reference ships BooPHF save/load (BooPHF.h:927-1005) but never
calls it — every run rebuilds the index (SURVEY.md §5).  dbgtpu makes
persistence first-class: `--save-index` / `--load-index` on the CLI so
large-graph startup is an mmap-fast npz load instead of a rebuild.

The file stores the UnitigGraph's flat arrays plus the junction/anchor
dictionaries in array form; device tables are rebuilt from these in
vectorized numpy (fast) on load.
"""

from __future__ import annotations

import numpy as np

from .build import UnitigGraph

_MAGIC = "dbgtpu-index-v1"


def _dict_to_arrays(d: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """{key -> [ids]} -> (keys u64 [N], flat int32, off int64 [N+1])."""
    keys = np.fromiter(d.keys(), dtype=np.uint64, count=len(d))
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    lists = list(d.values())
    flat = []
    off = [0]
    for i in order:
        ids = lists[i]
        flat.extend(ids)
        off.append(off[-1] + len(ids))
    return keys, np.array(flat, np.int32), np.array(off, np.int64)


def _arrays_to_dict(keys, flat, off) -> dict:
    return {
        int(k): [int(v) for v in flat[off[i] : off[i + 1]]]
        for i, k in enumerate(keys)
    }


def save_graph(g: UnitigGraph, path: str) -> None:
    lk, lf, lo = _dict_to_arrays(g.left)
    rk, rf, ro = _dict_to_arrays(g.right)
    d = dict(
        magic=_MAGIC, k=g.k, n_unitigs=g.n_unitigs,
        pool=g.pool, offsets=g.offsets, lengths=g.lengths,
        ubeg=g.ubeg, uend=g.uend,
        left_keys=lk, left_flat=lf, left_off=lo,
        right_keys=rk, right_flat=rf, right_off=ro,
        dog_mode=g.dog_mode,
    )
    if g.dog_mode and g.anchors:
        ak = np.fromiter(g.anchors.keys(), np.uint64, count=len(g.anchors))
        order = np.argsort(ak, kind="stable")
        av = np.array(list(g.anchors.values()), np.int64)
        d.update(anchor_keys=ak[order], anchor_vals=av[order])
    np.savez_compressed(path, **d)


def load_graph(path: str) -> UnitigGraph:
    z = np.load(path)
    if str(z["magic"]) != _MAGIC:
        raise ValueError(f"{path}: not a dbgtpu index file")
    g = UnitigGraph(
        k=int(z["k"]), n_unitigs=int(z["n_unitigs"]),
        pool=z["pool"], offsets=z["offsets"], lengths=z["lengths"],
        ubeg=z["ubeg"], uend=z["uend"],
        dog_mode=bool(z["dog_mode"]),
    )
    g.left = _arrays_to_dict(z["left_keys"], z["left_flat"], z["left_off"])
    g.right = _arrays_to_dict(z["right_keys"], z["right_flat"], z["right_off"])
    if "anchor_keys" in z:
        av = z["anchor_vals"]
        g.anchors = {
            int(k): (int(av[i][0]), int(av[i][1]))
            for i, k in enumerate(z["anchor_keys"])
        }
    return g
