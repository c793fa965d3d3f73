"""Companion tool tests (SURVEY.md §2.2 parity)."""

from __future__ import annotations

import io

from dbgtpu.tools.convert_one_line import convert
from dbgtpu.tools.get_large_unitigs import get_large_unitigs
from dbgtpu.tools.no_n import no_n


def test_get_large_unitigs(tmp_path):
    inp = tmp_path / "u.fa"
    inp.write_bytes(
        b">u1\nACGTACGTACGT\n>u2\nacg\n>u3\nggggccccaaaa\n"
    )
    out = tmp_path / "big.fa"
    get_large_unitigs(str(inp), str(out), 5)
    assert out.read_bytes() == b">N\nACGTACGTACGTGGGGCCCCAAAA\n"


def test_convert_one_line():
    src = io.BytesIO(b">a\nACG\nTAC\n>b\nGGG\n")
    dst = io.BytesIO()
    convert(src, dst)
    assert dst.getvalue() == b">a\nACGTAC\n>b\nGGG\n"


def test_no_n():
    src = io.BytesIO(b">a\nACGN\n>b\nACGT\n")
    dst = io.BytesIO()
    no_n(src, dst)
    assert dst.getvalue() == b">b\nACGT\n"
