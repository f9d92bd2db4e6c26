"""Bounded accelerator-backend init probe.

The axon-tunneled TPU backend can go fully DOWN: `jax.devices()` then
blocks 25-50 minutes in-process before raising UNAVAILABLE. Every tool
that needs to know whether the chip is reachable (doctor --init-timeout,
bench's preflight) probes in a SUBPROCESS bounded by a timeout — a hung
init is killed at the deadline without poisoning the calling process's
backend state. One implementation here so the triage behavior (message
extraction, timeout semantics) cannot drift between the tools.
"""

from __future__ import annotations

import subprocess
import sys
from typing import Tuple


def probe_backend_init(timeout: float) -> Tuple[bool, str]:
    """(reachable, detail): run `import jax; jax.devices()` in a fresh
    subprocess, killed after `timeout` seconds. detail is the last stderr
    line on failure ('' on success)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout, capture_output=True, text=True)
        if r.returncode == 0 and "ok" in r.stdout:
            return True, ""
        lines = (r.stderr or "").strip().splitlines()
        return False, lines[-1] if lines else "unknown init failure"
    except subprocess.TimeoutExpired:
        return False, f"backend init still blocked after {timeout:.0f}s"
