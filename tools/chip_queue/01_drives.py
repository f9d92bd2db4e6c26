"""Block-5/6 chip drives (verify skill): run through the INSTALLED package
on the real TPU. One TPU process at a time; run under nohup."""
import sys
import time

import numpy as np

t_start = time.time()


def log(msg):
    print(f"[{time.time() - t_start:7.1f}s] {msg}", flush=True)


import jax                                                        # noqa: E402
import jax.numpy as jnp                                           # noqa: E402

log(f"devices: {jax.devices()}")
from spectral_tpu.utils.cache import enable_compilation_cache     # noqa: E402
enable_compilation_cache()

from spectral_tpu.config import SpecConfig                        # noqa: E402
from spectral_tpu.core.stft import (power_spectrogram,            # noqa: E402
                                    power_spectrogram_fm)

fs = 1000.0
rng = np.random.RandomState(0)
x = rng.randn(4, 60_000).astype(np.float32) * 0.3
xd = jnp.asarray(x)

# warm the transfer path with a throwaway fetch
_ = np.asarray(jnp.arange(1024.0) * 2)
log("transfer path warmed")

# ---- (1) banded fold: bitwise vs sliced full-band at the same flip sense
cfg = SpecConfig.north_star(1024, 256)
band = (0, 31)  # EEG default fmax=30 at fs=1000: bins [0, 31)
for flip in (False, True):
    full = jax.jit(lambda a: power_spectrogram_fm(
        a, fs, cfg, flip_freqs=flip))(xd)
    banded = jax.jit(lambda a: power_spectrogram_fm(
        a, fs, cfg, flip_freqs=flip, band=band))(xd)
    F = full.shape[-2]
    lo, hi = band
    sl = full[..., F - hi:F - lo, :] if flip else full[..., lo:hi, :]
    same = bool(jnp.all(banded == sl))
    log(f"banded fold flip={flip}: bitwise == sliced full-band: {same}")
    assert same, "banded fold is NOT bitwise on TPU"

# freq-major vs swapaxes(frame-major): bitwise on the dense route
fm = jax.jit(lambda a: power_spectrogram_fm(a, fs, cfg))(xd)
tm = jax.jit(lambda a: jnp.swapaxes(
    power_spectrogram(a, fs, cfg), -1, -2))(xd)
same = bool(jnp.all(fm == tm))
log(f"freq-major == swapaxes(frame-major) bitwise: {same}")
assert same

# ---- (2) flip fold in the batched pipeline: packed words bitwise
from spectral_tpu.parallel.sharding import batched_spectrogram_fn  # noqa: E402
from spectral_tpu.ops.colormap import colormap_index_packed        # noqa: E402
cfgl = SpecConfig.north_star(1024, 256, log_scale=True)
f_flip = jax.jit(lambda a: colormap_index_packed(
    batched_spectrogram_fn(fs, cfgl, use_matmul=True,
                           flip_image=True)(a)["image"],
    flip_rows=False))
f_noflip = jax.jit(lambda a: colormap_index_packed(
    batched_spectrogram_fn(fs, cfgl, use_matmul=True,
                           flip_image=False)(a)["image"],
    flip_rows=True))
same = bool(jnp.all(f_flip(xd) == f_noflip(xd)))
log(f"flip-fold packed words bitwise == flip pass: {same}")
assert same

# ---- (3) fused interactive plot path vs CPU
from spectral_tpu.api.session import AnalysisSession               # noqa: E402
from spectral_tpu.io.registry import SweepEntry, SweepRegistry     # noqa: E402
from spectral_tpu.config import ViewSettings                       # noqa: E402


def plot_once():
    s = AnalysisSession(warm_detection=False)
    s.registry.register("clip_sweep0", SweepEntry(
        filepath="clip", sweep_idx=0, fs=fs, fs_raw=fs,
        raw=x[0], processed=None))
    cfgp = SpecConfig.scipy_default(1024, fmin=0.0, fmax=30.0,
                                    log_scale=True)
    r = s.plot_sweeps(["clip_sweep0"], cfgp, ViewSettings())
    return s, r


s, r = plot_once()
log(f"fused plot path: sxx {r.sxx.shape} image in "
    f"[{r.image.min():.3f}, {r.image.max():.3f}]")
assert r.image.min() == 0.0 and r.image.max() == 1.0, \
    "normalize clip regression: max pixel must be exactly 1.0 on chip"

# warm interactive latency (plot -> image), second call = steady state
t0 = time.time()
s2, r2 = plot_once()
warm_ms = (time.time() - t0) * 1000
log(f"warm interactive plot latency: {warm_ms:.1f} ms")

# CPU comparison of the same plot
import jax as _jax                                                # noqa: E402
cpu = _jax.devices("cpu")[0]
with _jax.default_device(cpu):
    s3, r3 = plot_once()
err_sxx = float(np.max(np.abs(r.sxx - r3.sxx))
                / max(float(np.max(np.abs(r3.sxx))), 1e-30))
err_img = float(np.max(np.abs(r.image - r3.image)))
log(f"chip vs CPU: sxx rel {err_sxx:.2e}, image abs {err_img:.2e}")
assert err_sxx < 1e-4 and err_img < 1e-4

# ---- (4) tone-orientation PNG through the export pipeline
import os                                                         # noqa: E402
import tempfile                                                   # noqa: E402
from spectral_tpu.io.wav import write_wav                         # noqa: E402
from spectral_tpu.parallel.pipeline import (export_spectrograms,  # noqa: E402
                                            wav_clip_source)
from spectral_tpu.render.png import decode_png                    # noqa: E402
tmp = tempfile.mkdtemp()
tone_fs = 16000.0
tt = np.arange(int(tone_fs * 10)) / tone_fs
tone = (0.5 * np.sin(2 * np.pi * 100.0 * tt)).astype(np.float32)
wavp = os.path.join(tmp, "tone100.wav")
write_wav(wavp, tone, tone_fs)
stats = export_spectrograms(
    wav_clip_source([wavp]), tone_fs,
    SpecConfig.north_star(1024, 256, log_scale=True),
    tmp, clip_samples=int(tone_fs * 10), batch=1)
img = decode_png(os.path.join(tmp, "tone100.png"))
h = img.shape[0]
red = img[..., 0].astype(int) - img[..., 2].astype(int)
row_energy = red.mean(axis=1)
bottom = row_energy[int(h * 0.9):].mean()
top = row_energy[:int(h * 0.1)].mean()
log(f"tone PNG orientation: bottom-red {bottom:.1f} vs top {top:.1f}")
assert bottom > top, "row 0 must be the HIGHEST frequency (flip lost?)"

# ---- (4b) block-9 per-clip health flag on chip: overflow, TOTAL
# underflow (tiny-but-real clip), silence/DC, healthy — both pipelines
from spectral_tpu.ops.stft_pallas import (pallas_pipeline_fn,      # noqa: E402
                                          pallas_supported)
hb = jnp.asarray(np.stack([
    rng.randn(16000).astype(np.float32),
    (1e19 * rng.randn(16000)).astype(np.float32),
    (1e-25 * rng.randn(16000)).astype(np.float32),
    np.zeros(16000, np.float32),
    np.full(16000, 0.25, np.float32)]))
want = [True, False, False, True, True]
cfgh = SpecConfig.north_star(512, 128, log_scale=True)
got_xla = list(np.asarray(jax.jit(
    batched_spectrogram_fn(tone_fs, cfgh, use_matmul=True))(hb)["finite"]))
log(f"health flag XLA: {got_xla}")
assert got_xla == want
if pallas_supported(cfgh):
    got_pl = list(np.asarray(jax.jit(
        pallas_pipeline_fn(tone_fs, cfgh))(hb)["finite"]))
    log(f"health flag Pallas: {got_pl}")
    assert got_pl == want

# ---- (5) chirp ridge sanity at the scipy-compat CT sizes
try:
    from scipy.signal import spectrogram as sp_spec
    chirp_fs = 16000.0
    tt = np.arange(int(chirp_fs * 10)) / chirp_fs
    chirp = np.sin(2 * np.pi * (100 + 300 * tt) * tt).astype(np.float32)
    for N in (2048, 4096, 8192):
        cfgN = SpecConfig.scipy_default(N)
        dev = np.asarray(jax.jit(lambda a: power_spectrogram(
            a, chirp_fs, cfgN, use_matmul=True))(jnp.asarray(chirp)))
        _f, _t, sxx = sp_spec(chirp.astype(np.float64), fs=chirp_fs,
                              nperseg=N, scaling="density", mode="psd")
        rel = np.max(np.abs(dev.T - sxx) / (np.max(sxx)))
        ridge_ok = bool(np.all(np.argmax(dev.T, axis=0)
                               == np.argmax(sxx, axis=0)))
        log(f"CT scipy-compat N={N}: rel {rel:.2e}, ridge match {ridge_ok}")
        assert rel < 5e-6 and ridge_ok
except ImportError:
    log("scipy unavailable; skipping CT parity drive")

# ---- (6) forced-device detection == CPU events (EM precision guard:
# AUTO-CPU masks device bugs; zero events on device = regression)
from spectral_tpu.models.detector import BurstDetector            # noqa: E402
from spectral_tpu.core.stft import freq_axis, time_axis           # noqa: E402
from spectral_tpu.core import events as ev_mod                    # noqa: E402
eeg_fs = 1000.0
tt6 = np.arange(int(eeg_fs * 60)) / eeg_fs
eeg = (0.05 * rng.randn(tt6.size)).astype(np.float32)
for a, b in ((10.0, 15.0), (30.0, 38.0)):
    m = (tt6 >= a) & (tt6 < b)
    eeg[m] += (0.5 * np.sin(2 * np.pi * 6.0 * tt6[m])).astype(np.float32)
cfge = SpecConfig.scipy_default(1024, fmin=0.0, fmax=30.0)
fe = freq_axis(cfge, eeg_fs)
te = time_axis(cfge, eeg_fs, eeg.size)
psd_e = power_spectrogram(jnp.asarray(eeg), eeg_fs, cfge)
feats = np.asarray(ev_mod.features_from_psd(fe, psd_e, 0.0, 30.0))
ev_dev = BurstDetector(device="default").unsupervised_detect(te, feats)
ev_cpu = BurstDetector(device="cpu").unsupervised_detect(te, feats)
log(f"forced-device detect: {len(ev_dev)} events (cpu {len(ev_cpu)})")
assert ev_dev and ev_dev == ev_cpu, (ev_dev, ev_cpu)

log("ALL CHIP DRIVES PASSED")
