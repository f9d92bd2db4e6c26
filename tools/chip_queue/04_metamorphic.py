"""Chip drive: metamorphic exactness claims on real TPU hardware.

tests/test_metamorphic.py proves sign-flip / power-of-two scaling /
hop-shift invariances bitwise on CPU; the MXU's tiled f32 reductions
could in principle break 'bitwise' (they shouldn't: negation and
power-of-two scaling commute with every rounding step regardless of
reduction order). Verify on the chip, plus the session overflow guard.
"""
import time
import numpy as np

t0 = time.time()
def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

import jax
import jax.numpy as jnp
log(f"devices: {jax.devices()}")

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.stft import spectrogram

fs = 1000.0
x = np.random.default_rng(0).standard_normal(4103).astype(np.float32)
cfg = SpecConfig(nperseg=256)

def sxx(sig):
    _, _, s = spectrogram(jnp.asarray(sig), fs, cfg)
    return np.asarray(s)

base = sxx(x)
_ = float(base.sum())  # warm the transfer path
log(f"signflip bitwise on chip: {np.array_equal(sxx(-x), base)}")
log(f"pow2 x16 bitwise on chip: {np.array_equal(sxx(4.0*x), 16.0*base)}")
hop = 224; k = 3
sh = sxx(x[k*hop:])
log(f"hopshift bitwise on chip: {np.array_equal(sh, base[:, k:k+sh.shape[1]])}")

from spectral_tpu.api.session import AnalysisSession
from spectral_tpu.io.registry import SweepEntry
from spectral_tpu.config import ViewSettings
s = AnalysisSession(warm_detection=False)
big = (1e19 * np.random.default_rng(1).standard_normal(8192)).astype(np.float32)
s.registry.register("big_sweep0", SweepEntry("f", 0, fs, fs, big, None))
try:
    s.plot_sweeps(["big_sweep0"], cfg, ViewSettings())
    log("OVERFLOW GUARD FAILED: no error raised on chip")
    raise SystemExit(1)
except ValueError as e:
    log(f"overflow guard raised on chip: {str(e)[:60]}...")
log("ALL METAMORPHIC CHIP DRIVES PASSED")
