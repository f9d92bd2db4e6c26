#!/usr/bin/env python
"""Capture and attribute one real tail-latency stall (r4 verdict item 3).

The multi-second tails that contaminated the r3/r4 bench artifacts (e.g.
the stereo streaming rep at 6.943 s vs a 0.088 s median) were always
median-ed away, never attributed. The one *reproducible* member of that
class is the per-process cold-transfer stall: the FIRST sizeable
device->host fetch over the axon tunnel can take orders of magnitude
longer than every later fetch (CLAUDE.md "tunnel pathologies"). This
tool runs as a FRESH process (never run it alongside another TPU
client — one client at a time per CLAUDE.md) and records the whole
sequence with timings:

  1. compile+execute of a trivial 1 MB program (compile time recorded);
  2. the process's FIRST 1 MB device->host fetch  <- the stall;
  3. a dispatch-floor probe immediately after (tiny program + 8-int32
     fetch);
  4. a SECOND 1 MB fetch, then three more for a warm-rate baseline.

Attribution logic (encoded in the output): first fetch slow + floor and
second fetch immediately normal => the stall is the tunnel's per-client
transfer-path setup — not chip compute (the program had already finished
before the fetch), not a compile (timed separately), and not a
persisting outage (the same client is healthy milliseconds later). If
the later fetches are ALSO slow, the tunnel itself is degraded and the
run records that instead.

Writes one JSON blob (default STALL_CAPTURE.json) and prints it.

Usage: python tools/stall_capture.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STALL_CAPTURE.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    prog = jax.jit(lambda v: v * 2)
    z = jnp.zeros(262144, jnp.float32)             # 1 MB
    tiny = jax.jit(lambda v: v + 1)
    zt = jnp.zeros(8, jnp.int32)

    t0 = time.time()
    out = prog(z)
    out.block_until_ready()                        # compute done (best
    # effort: over the tunnel this is not a hard barrier, which is WHY the
    # fetch below is timed separately — any residual compute it absorbs is
    # bounded by this program's microseconds of work)
    compile_s = time.time() - t0

    t0 = time.time()
    np.asarray(out)                                # FIRST 1 MB D2H: the stall
    first_fetch_s = time.time() - t0

    t0 = time.time()
    np.asarray(tiny(zt))                           # dispatch floor right after
    floor_after_ms = (time.time() - t0) * 1000

    fetches = []
    for _ in range(4):                             # second..fifth fetches
        t0 = time.time()
        np.asarray(prog(z))
        fetches.append(time.time() - t0)
    second_fetch_s = fetches[0]
    warm_mb_s = 1.0 / max(min(fetches), 1e-9)

    ratio = first_fetch_s / max(min(fetches), 1e-9)
    if ratio >= 5 and floor_after_ms < 1000 and min(fetches) < 1.0:
        verdict = (
            "per-client TRANSFER-PATH WARMUP: this process's first 1 MB "
            f"fetch took {first_fetch_s:.3f} s; {floor_after_ms:.0f} ms "
            "later the dispatch floor was normal and the next fetch took "
            f"{second_fetch_s:.3f} s ({ratio:.0f}x faster). The compute "
            f"had already finished (compile+run {compile_s:.2f} s, timed "
            "separately), so the stall is the tunnel's one-time transfer "
            "setup for this client — the same class as the r3/r4 "
            "multi-second bench tails, which sampled it whenever a timed "
            "region contained a process's first sizeable D2H")
    elif ratio >= 5:
        verdict = ("tunnel DEGRADATION: the first fetch stalled AND later "
                   "probes stayed slow — a live outage window, not "
                   "per-client warmup")
    else:
        verdict = (f"no stall captured (first/min-warm ratio {ratio:.1f}x)"
                   ": the cold-transfer pathology is intermittent — this "
                   "run is a healthy-day record; re-run to sample again")

    blob = {"timestamp": time.time(),
            "backend": jax.default_backend(),
            "compile_s": round(compile_s, 2),
            "first_1mb_fetch_s": round(first_fetch_s, 3),
            "dispatch_floor_after_ms": round(floor_after_ms, 1),
            "warm_1mb_fetches_s": [round(f, 3) for f in fetches],
            "warm_d2h_mb_s": round(warm_mb_s, 1),
            "stall_ratio_first_vs_warm": round(ratio, 1),
            "attribution": verdict}
    with open(args.out, "w") as fh:
        json.dump(blob, fh, indent=2)
    print(json.dumps(blob, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
