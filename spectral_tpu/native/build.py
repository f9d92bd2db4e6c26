"""Build the native components with the system C++ toolchain.

Invoked lazily on first use (and cached); can also be run directly:
``python -m spectral_tpu.native.build``.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))

TARGETS = {
    "libspectpu_png.so": (["png_encoder.cpp"], ["-lz"]),
}


def lib_path(name: str) -> str:
    return os.path.join(_DIR, name)


def build(name: str, verbose: bool = False) -> bool:
    """Compile one target. Returns True when the shared library exists and is
    newer than its sources."""
    srcs, libs = TARGETS[name]
    out = lib_path(name)
    src_paths = [os.path.join(_DIR, s) for s in srcs]
    if os.path.exists(out) and all(
            os.path.getmtime(out) >= os.path.getmtime(s) for s in src_paths):
        return True
    # compile to a unique temp path and os.rename into place: concurrent
    # lazy builds (e.g. several process-pool encode workers triggering
    # their first encode at once) would otherwise interleave g++ writes to
    # the same -o file, and the corrupt .so — newer than its sources —
    # would pass the freshness check forever after
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = (["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp]
           + src_paths + libs)
    def _cleanup():
        try:
            os.remove(tmp)
        except OSError:
            pass

    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        _cleanup()
        return False
    if res.returncode != 0:
        if verbose:
            sys.stderr.write(res.stderr)
        _cleanup()
        return False
    try:
        os.rename(tmp, out)          # atomic within the directory
    except OSError:
        _cleanup()
        return os.path.exists(out)   # a concurrent build won the race
    return True


def build_all(verbose: bool = False) -> bool:
    return all(build(name, verbose) for name in TARGETS)


if __name__ == "__main__":
    ok = build_all(verbose=True)
    print("native build:", "ok" if ok else "FAILED")
    sys.exit(0 if ok else 1)
