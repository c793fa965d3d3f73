"""Index persistence roundtrip + CLI --save-index/--load-index."""

from __future__ import annotations

import json

from dbgtpu.cli import main as cli_main
from dbgtpu.index.build import build_graph_from_seqs
from dbgtpu.index.persist import load_graph, save_graph

from . import synth


def test_roundtrip(tmp_path):
    _, unitigs_fa = synth.make_dataset(
        seed=31, genome_len=8000, k=21, n_reads=1
    )
    seqs = [
        unitigs_fa.strip().split(b"\n")[i + 1]
        for i in range(0, unitigs_fa.strip().count(b"\n") + 1, 2)
    ]
    g = build_graph_from_seqs(seqs, 21, dog_mode=True)
    p = str(tmp_path / "g.idx.npz")
    save_graph(g, p)
    g2 = load_graph(p)
    assert g2.k == g.k and g2.n_unitigs == g.n_unitigs
    assert g2.left == g.left and g2.right == g.right
    assert g2.anchors == g.anchors
    assert (g2.pool == g.pool).all()
    assert (g2.offsets == g.offsets).all()


def test_cli_save_load_and_json(tmp_path, monkeypatch):
    reads_fa, unitigs_fa = synth.make_dataset(
        seed=32, genome_len=8000, k=21, n_reads=50
    )
    (tmp_path / "r.fa").write_bytes(reads_fa)
    (tmp_path / "u.fa").write_bytes(unitigs_fa)
    monkeypatch.chdir(tmp_path)
    cli_main([
        "-r", "r.fa", "-k", "21", "-g", "u.fa",
        "--save-index", "g.idx.npz", "--json-summary", "run.json",
    ])
    first = (tmp_path / "paths").read_bytes()
    s = json.loads((tmp_path / "run.json").read_text())
    assert s["reads"] == s["aligned"] + s["not_aligned"] + s["no_overlap"]
    # rerun from the persisted index: identical output
    cli_main(["-r", "r.fa", "--load-index", "g.idx.npz"])
    assert (tmp_path / "paths").read_bytes() == first
