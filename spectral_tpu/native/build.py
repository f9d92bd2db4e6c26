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
    cmd = (["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", out]
           + src_paths + libs)
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        if verbose:
            sys.stderr.write(res.stderr)
        return False
    return True


def build_all(verbose: bool = False) -> bool:
    return all(build(name, verbose) for name in TARGETS)


if __name__ == "__main__":
    ok = build_all(verbose=True)
    print("native build:", "ok" if ok else "FAILED")
    sys.exit(0 if ok else 1)
