"""Chip probe: dense vs CT DFT at nfft=1024 — speed at the headline bench
shape and display-dB error vs a scipy f64 oracle, both engines in ONE
process back to back (honest comparison; whole-output checksum timer).

Run on the real TPU: python /tmp/ct1024_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import spectral_tpu.core.stft as st
from spectral_tpu.config import SpecConfig
from spectral_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
fs = 16000.0
B = 256
rng = np.random.RandomState(0)
xb = jnp.asarray(rng.randn(B, 160000).astype(np.float32))
print("backend:", jax.default_backend())


def timer(fn, reps=3):
    j = jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
    float(j(xb))  # warm
    t0 = time.time()
    for _ in range(reps):
        float(j(xb))
    return (time.time() - t0) / reps * 1000.0 / B  # ms/clip


def disp(s):
    n = np.clip(s / (s.max() + 1e-20), 0, 1)
    db = np.nan_to_num(10 * np.log10(n + 1e-12))
    r = db.max() - db.min()
    return (db - db.min()) / r, r


def db_err(psd, **kw):
    from scipy.signal import spectrogram as sp
    x64 = np.asarray(xb[0], np.float64)
    _f, _t, sxx = sp(x64, fs=fs, scaling="density", mode="psd", **kw)
    ref = sxx.T
    rel = float(np.max(np.abs(psd - ref) / ref.max()))
    di, r = disp(psd)
    do, _ = disp(ref)
    return rel, float(np.max(np.abs(di - do)) * r)


for name, cfg, kw in [
    ("north1024", SpecConfig.north_star(1024, 256),
     dict(window="hann", nperseg=1024, noverlap=768, detrend=False)),
    ("scipy1024", SpecConfig.scipy_default(1024), dict(nperseg=1024)),
]:
    res = {}
    for label, ctmin in (("dense", 2048), ("ct", 1024)):
        st.CT_MIN_NFFT = ctmin
        if label == "ct":
            assert st.ct_factors(cfg) == (128, 8)
        ms = timer(lambda x, c=cfg: st.power_spectrogram(
            x, fs, c, use_matmul=True))
        psd = np.asarray(jax.jit(lambda x, c=cfg: st.power_spectrogram(
            x, fs, c, use_matmul=True))(xb[:1]))[0]
        rel, dbe = db_err(psd, **kw)
        res[label] = (ms, rel, dbe)
        print(f"{name} {label:5s}: {ms:.4f} ms/clip  rel={rel:.2e} "
              f"db={dbe:.2e}")
    st.CT_MIN_NFFT = 2048
    d, c = res["dense"], res["ct"]
    print(f"{name}: CT speedup x{d[0] / c[0]:.3f}, "
          f"db {'better' if c[2] <= d[2] else 'WORSE'}")
