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


_transfer_warmed = False


def warm_transfer_path() -> float:
    """Pay the tunnel's per-client transfer-path setup with a TINY fetch.

    Measured (r5, STALL_CAPTURE.json + /tmp probe): a fresh client's
    FIRST sizeable device->host fetch can stall for minutes (938.7 s for
    1 MB in the captured worst case) while the setup cost for an 8-int32
    first fetch was ~7 s — after which the next 1 MB fetch took 0.16 s.
    The setup is per-client, not per-byte, so warming with the smallest
    possible fetch bounds the worst case. Idempotent per process; no-op
    cost (~ms) on local backends. Returns the seconds the warm fetch
    took (0.0 when already warmed).

    Call AFTER backend selection, right before the first real device
    work — never at import time (initializes the backend, CLAUDE.md).
    """
    global _transfer_warmed
    if _transfer_warmed:
        return 0.0
    _transfer_warmed = True
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    out = jax.jit(lambda v: v + 1)(jnp.zeros(8, jnp.int32))
    t0 = time.time()
    np.asarray(out)                       # the tiny first D2H
    return time.time() - t0


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
