"""Warm serving-worker round-trip latency on the real TPU.

Spawns ONE spectral-tpu serve worker (the queue's single-TPU-process
rule: this script itself does not initialize a backend), warms the
detect path, then times warm detect round trips through ServeClient.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

from spectral_tpu.client import ServeClient  # noqa: E402
from spectral_tpu.io.wav import write_wav  # noqa: E402

fs = 1000.0
rng = np.random.RandomState(0)
n = int(fs * 60)
t = np.arange(n) / fs
x = (0.05 * rng.randn(n)).astype(np.float32)
for a, b in ((10.0, 15.0), (30.0, 38.0)):
    m = (t >= a) & (t < b)
    x[m] += (0.5 * np.sin(2 * np.pi * 6.0 * t[m])).astype(np.float32)
wav = "/tmp/chip_queue/serve_eeg.wav"
write_wav(wav, x, fs)

cfg = {"nperseg": 1024, "fmin": 0.0, "fmax": 30.0}
t0 = time.time()
with ServeClient.spawn() as c:           # default backend: the chip
    print(f"[{time.time()-t0:6.1f}s] worker up, ping={c.ping()}",
          flush=True)
    ev = c.detect([wav], config=cfg)     # cold: compiles
    print(f"[{time.time()-t0:6.1f}s] cold detect: {len(ev)} events "
          f"{ev}", flush=True)
    lat = []
    for _ in range(10):
        r0 = time.time()
        ev2 = c.detect([wav], config=cfg)
        lat.append((time.time() - r0) * 1000)
    assert ev2 == ev
    stats = c.stats()
    print(f"[{time.time()-t0:6.1f}s] warm detect round trip: "
          f"median {statistics.median(lat):.1f} ms "
          f"(min {min(lat):.1f}, max {max(lat):.1f}); "
          f"worker stats {json.dumps(stats)}", flush=True)
print("SERVE LATENCY DRIVE PASSED", flush=True)
