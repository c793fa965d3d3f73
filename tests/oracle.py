"""Reference-binary oracle harness.

Compiles the reference bgreat (once per session, cached in /tmp) and
runs it on given inputs, returning the produced `paths` and
`notAligned.fa` bytes.  Used for golden-output parity tests
(SURVEY.md §4 plan item 1).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from pathlib import Path

REFERENCE = Path("/root/reference")
BUILD_DIR = Path("/tmp/dbgtpu-oracle-build")


def reference_available() -> bool:
    return (REFERENCE / "bgreat.cpp").exists()


def build_reference() -> Path:
    """Compile the reference into BUILD_DIR (cached)."""
    binary = BUILD_DIR / "bgreat"
    if binary.exists():
        return binary
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    for f in REFERENCE.glob("*.cpp"):
        shutil.copy(f, BUILD_DIR)
    for f in REFERENCE.glob("*.h"):
        shutil.copy(f, BUILD_DIR)
    shutil.copy(REFERENCE / "makefile", BUILD_DIR)
    subprocess.run(
        ["make", "-j2"], cwd=BUILD_DIR, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return binary


def run_reference(
    reads_fa: bytes,
    unitigs_fa: bytes,
    k: int,
    m: int = 2,
    effort: int = 2,
    extra_flags: list[str] | None = None,
    reads_files: list[bytes] | None = None,
):
    """Run the oracle; returns (paths_bytes, not_aligned_bytes, stdout)."""
    binary = build_reference()
    with tempfile.TemporaryDirectory(prefix="dbgtpu-oracle-") as td:
        tdp = Path(td)
        if reads_files is None:
            reads_files = [reads_fa]
        names = []
        for i, content in enumerate(reads_files):
            p = tdp / f"reads{i}.fa"
            p.write_bytes(content)
            names.append(str(p))
        (tdp / "unitig.fa").write_bytes(unitigs_fa)
        cmd = [
            str(binary), "-r", ",".join(names), "-k", str(k),
            "-g", str(tdp / "unitig.fa"), "-m", str(m), "-e", str(effort),
        ] + (extra_flags or [])
        out = subprocess.run(
            cmd, cwd=td, check=True, capture_output=True, timeout=600
        )
        paths = (tdp / "paths").read_bytes() if (tdp / "paths").exists() else b""
        na = (
            (tdp / "notAligned.fa").read_bytes()
            if (tdp / "notAligned.fa").exists()
            else b""
        )
        return paths, na, out.stdout.decode()
