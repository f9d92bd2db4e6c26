"""Audit the reference citations embedded in our source.

The repo convention cites reference code as `PlotEngine.py:123` /
`GUI.py:248-267` in docstrings and comments so parity claims are checkable.
Citations rot silently; this audit validates every fully-qualified citation
against the actual reference checkout: the file must exist and the cited
line range must be inside it (and non-empty — a citation pointing at blank
lines is almost certainly stale). Skipped when the checkout is absent.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

import reference_exec

if not reference_exec.available():  # pragma: no cover
    pytest.skip("reference checkout not available", allow_module_level=True)

REPO = Path(__file__).resolve().parent.parent
REF = reference_exec.REF_DIR

_CITE = re.compile(r"\b(PlotEngine|GUI|SweepManager|ExportManager)\.py:"
                   r"(\d+)(?:-(\d+))?")


def _reference_line_counts():
    return {f"{p.stem}.py": len(p.read_text().splitlines())
            for p in REF.glob("*.py")}


def _iter_citations():
    for src in sorted((REPO / "spectral_tpu").rglob("*.py")) + [
            REPO / "bench.py", REPO / "__graft_entry__.py"]:
        text = src.read_text()
        for m in _CITE.finditer(text):
            line_no = text[: m.start()].count("\n") + 1
            yield src.relative_to(REPO), line_no, m.group(1) + ".py", \
                int(m.group(2)), int(m.group(3)) if m.group(3) else None


def test_all_reference_citations_resolve():
    counts = _reference_line_counts()
    ref_lines = {name: (REF / name).read_text().splitlines()
                 for name in counts}
    bad = []
    n = 0
    for src, line_no, ref_file, lo, hi in _iter_citations():
        n += 1
        total = counts.get(ref_file)
        where = f"{src}:{line_no} -> {ref_file}:{lo}" + \
            (f"-{hi}" if hi else "")
        if total is None:
            bad.append(f"{where}: no such reference file")
            continue
        if not (1 <= lo <= total):
            bad.append(f"{where}: start beyond EOF ({total} lines)")
            continue
        if hi is not None and not (lo <= hi <= total):
            bad.append(f"{where}: bad range (file has {total} lines)")
            continue
        span = ref_lines[ref_file][lo - 1: (hi or lo)]
        if not any(s.strip() for s in span):
            bad.append(f"{where}: cited lines are blank")
    assert n > 100, "citation scan found suspiciously few citations"
    assert not bad, "stale reference citations:\n" + "\n".join(bad)
