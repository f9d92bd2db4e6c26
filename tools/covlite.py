"""Dependency-free line coverage via sys.monitoring (PEP 669).

The image has no `coverage` package and installs are off-limits; this
uses CPython 3.12's monitoring API instead. First-hit semantics: each
(code, line) location is DISABLE'd as soon as it fires, so steady-state
overhead is near zero and a full test-suite run stays practical.

Usage:
    python tools/covlite.py OUT.json -m pytest tests/ -q
    python tools/covlite.py OUT.json some_script.py args...
    python tools/covlite.py --report OUT.json [more.json ...]

The run mode executes the given module/script under monitoring and
writes {abs_file: [lines...]} for files under spectral_tpu/. The report
mode diffs executed lines against each file's ast-derived executable
lines and prints the gaps as ranges. Several JSON files merge (e.g. one
per subprocess-heavy run).
"""

from __future__ import annotations

import ast
import json
import os
import runpy
import sys
from collections import defaultdict

PKG_MARKER = os.sep + "spectral_tpu" + os.sep

_seen: dict[str, set] = defaultdict(set)


def _install():
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "covlite")

    def on_line(code, line):
        fn = code.co_filename
        if PKG_MARKER in fn and "site-packages" not in fn:
            _seen[fn].add(line)
        return mon.DISABLE  # first hit recorded; stop paying for this site

    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)


def _dump(out_path: str):
    with open(out_path, "w") as fh:
        json.dump({f: sorted(ls) for f, ls in _seen.items()}, fh)
    total = sum(len(v) for v in _seen.values())
    print(f"[covlite] {total} lines across {len(_seen)} files -> {out_path}",
          file=sys.stderr)


def executable_lines(path: str) -> set:
    """Approximate executable lines: every statement's lineno, minus
    module/class/function docstrings and bare ellipsis bodies."""
    with open(path, encoding="utf-8") as fh:
        tree = ast.parse(fh.read(), path)
    lines = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.stmt):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef, ast.Module)):
                continue  # def/class lines fire at definition time anyway
            if isinstance(node, ast.Expr) and isinstance(
                    node.value, ast.Constant) and isinstance(
                    node.value.value, (str, type(Ellipsis))):
                continue  # docstring / ellipsis
            lines.add(node.lineno)
    return lines


def _ranges(nums):
    nums = sorted(nums)
    out, i = [], 0
    while i < len(nums):
        j = i
        while j + 1 < len(nums) and nums[j + 1] == nums[j] + 1:
            j += 1
        out.append(str(nums[i]) if i == j else f"{nums[i]}-{nums[j]}")
        i = j + 1
    return ",".join(out)


def report(json_paths):
    executed: dict[str, set] = defaultdict(set)
    for p in json_paths:
        with open(p) as fh:
            for f, ls in json.load(fh).items():
                executed[f].update(ls)
    # include package files the run never imported at all
    pkg_root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "spectral_tpu")
    for dirpath, _dirs, files in os.walk(pkg_root):
        for name in files:
            if name.endswith(".py"):
                executed.setdefault(os.path.join(dirpath, name), set())
    rows = []
    tot_exec = tot_all = 0
    for f in sorted(executed):
        if not os.path.exists(f):
            continue
        exe = executable_lines(f)
        hit = executed[f] & exe
        missing = exe - executed[f]
        tot_exec += len(hit)
        tot_all += len(exe)
        pct = 100.0 * len(hit) / max(1, len(exe))
        rows.append((pct, f, missing, len(exe)))
    for pct, f, missing, n in sorted(rows):
        rel = f.split("spectral_tpu" + os.sep)[-1]
        print(f"{pct:6.1f}%  {rel:<28} ({n} stmts)"
              + (f"  missing: {_ranges(missing)}" if missing else ""))
    print(f"\nTOTAL {100.0 * tot_exec / max(1, tot_all):.1f}% "
          f"({tot_exec}/{tot_all} executable lines)")


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--report":
        report(sys.argv[2:])
        return
    out = sys.argv[1]
    _install()
    import atexit
    atexit.register(_dump, out)
    if sys.argv[2] == "-m":
        mod = sys.argv[3]
        sys.argv = [mod] + sys.argv[4:]
        runpy.run_module(mod, run_name="__main__", alter_sys=True)
    else:
        script = sys.argv[2]
        sys.argv = sys.argv[2:]
        runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
