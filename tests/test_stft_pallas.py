"""Pallas fused STFT kernel: equivalence with the jnp reference path.

On the CPU test rig the kernel runs in interpreter mode (same program,
unlowered); on-TPU compiled equivalence is exercised by bench/verify runs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.stft import power_spectrogram, num_frames
from spectral_tpu.ops.stft_pallas import (stft_psd_pallas, pallas_supported,
                                          pallas_pipeline_fn)


@pytest.mark.parametrize("nperseg,hop,n", [
    (1024, 256, 160000),   # north-star config 1
    (1024, 256, 5000),     # short signal, partial last block
    (512, 128, 16000),
    (256, 64, 4096),
    (1024, 1024, 20000),   # non-overlapping frames (r = 1)
    (256, 128, 10000),     # r = 2
])
def test_pallas_matches_jnp(nperseg, hop, n):
    fs = 16000.0
    cfg = SpecConfig.north_star(nperseg, hop)
    rng = np.random.RandomState(0)
    x = rng.randn(n).astype(np.float32)
    ref = np.asarray(power_spectrogram(jnp.asarray(x), fs, cfg,
                                       use_matmul=True))
    out = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg))
    assert out.shape == ref.shape == (num_frames(n, nperseg, hop),
                                      cfg.n_freqs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-10)


def test_pallas_batched_and_scipy_compat_detrend():
    # scipy-default semantics with a dividing hop: tukey window + constant
    # detrend folded into the DFT matrices
    fs = 1000.0
    cfg = SpecConfig(nperseg=512, hop=256)  # tukey(.25), detrend constant
    rng = np.random.RandomState(1)
    xb = rng.randn(3, 8192).astype(np.float32) + 5.0  # DC offset: detrend!
    ref = np.asarray(power_spectrogram(jnp.asarray(xb), fs, cfg,
                                       use_matmul=True))
    out = np.asarray(stft_psd_pallas(jnp.asarray(xb), fs, cfg))
    # near-zero bins under a +5 DC offset see catastrophic cancellation;
    # bound them by an absolute floor relative to the spectrum peak
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=ref.max() * 1e-6)

    import scipy.signal
    f, t, sxx = scipy.signal.spectrogram(np.asarray(xb[0], np.float64),
                                         fs=fs, nperseg=512, noverlap=256,
                                         scaling="density", mode="psd")
    np.testing.assert_allclose(out[0].T, sxx, rtol=2e-4,
                               atol=sxx.max() * 2e-5)


def test_pallas_log10_output():
    fs = 16000.0
    cfg = SpecConfig.north_star(512, 128)
    x = np.random.RandomState(2).randn(8000).astype(np.float32)
    lin = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg))
    logd = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg,
                                      log10_out=True))
    np.testing.assert_allclose(logd, np.log10(lin + 1e-20), rtol=1e-5,
                               atol=1e-5)


def test_pallas_rejects_unsupported():
    with pytest.raises(ValueError, match="unsupported"):
        stft_psd_pallas(jnp.zeros(10000), 1000.0,
                        SpecConfig.north_star(16384, 4096))
    assert not pallas_supported(SpecConfig.north_star(16384, 4096))
    assert not pallas_supported(
        SpecConfig.north_star(1024, 256, nfft=2048))  # zero-padded nfft
    assert not pallas_supported(
        SpecConfig.north_star(1024, 255))  # gcd 1: degenerate row width
    assert pallas_supported(SpecConfig.scipy_default(1024))  # hop 896
    assert pallas_supported(SpecConfig.scipy_default(8192))  # gcd 1024
    assert pallas_supported(SpecConfig.north_star(2048, 512))  # freq-tiled
    assert pallas_supported(SpecConfig.north_star(4096, 1024))
    assert pallas_supported(SpecConfig.north_star(8192, 2048))  # manual DMA
    assert pallas_supported(SpecConfig.north_star(1024, 256))
    # tiny hop at huge nperseg: the gcd framing's forced overlap block
    # (q_max=341 frames of (S=3, g=8) rows) alone exceeds the on-chip VMEM
    # budget — must be rejected so callers fall back to the XLA path
    # instead of failing Mosaic compilation mid-job
    assert not pallas_supported(SpecConfig.north_star(8192, 24))
    with pytest.raises(ValueError, match="unsupported"):
        stft_psd_pallas(jnp.zeros(100000), 1000.0,
                        SpecConfig.north_star(8192, 24))


@pytest.mark.parametrize("nperseg,n", [
    (1024, 160000),   # the reference's exact default path (hop 896, g 128)
    (512, 30000),     # hop 448, g 64
    (256, 10000),     # hop 224, g 32
    (2048, 120000),   # hop 1792, g 256, freq-tiled
    (8192, 200000),   # hop 7168, g 1024: GUI ceiling, manual-DMA A tiles
])
def test_pallas_scipy_default_hop(nperseg, n):
    """The reference's own config (PlotEngine.py:113: Tukey 0.25, hop =
    nperseg - nperseg//8, constant detrend) through the kernel: the
    non-dividing hop exercises the gcd framing (g-wide pieces, S > 1)."""
    fs = 16000.0
    cfg = SpecConfig.scipy_default(nperseg)
    assert cfg.nperseg % cfg.hop_ != 0          # truly non-dividing
    rng = np.random.RandomState(7)
    x = rng.randn(n).astype(np.float32) + 2.5   # DC offset: detrend matters
    ref = np.asarray(power_spectrogram(jnp.asarray(x), fs, cfg,
                                       use_matmul=True))
    out = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg))
    assert out.shape == ref.shape == (num_frames(n, nperseg, cfg.hop_),
                                      cfg.n_freqs)
    # f32 accumulation-order noise under the DC offset: worst observed
    # 2.4e-4 relative on bins ~1e-5 of the spectrum peak
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=ref.max() * 1e-6)


def test_pallas_scipy_default_vs_scipy_oracle():
    import scipy.signal
    fs = 1000.0
    cfg = SpecConfig.scipy_default(1024)
    x = np.random.RandomState(11).randn(60000).astype(np.float32)
    out = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg))
    f, t, sxx = scipy.signal.spectrogram(np.asarray(x, np.float64), fs=fs,
                                         nperseg=1024, scaling="density",
                                         mode="psd")
    assert out.T.shape == sxx.shape
    np.testing.assert_allclose(out.T, sxx, rtol=2e-4, atol=sxx.max() * 2e-5)


def test_pallas_hop_larger_than_nperseg():
    # gapped framing (hop > nperseg): rp = 1 with zero-padded tail rows
    fs = 16000.0
    cfg = SpecConfig.north_star(256, 384)
    x = np.random.RandomState(13).randn(20000).astype(np.float32)
    ref = np.asarray(power_spectrogram(jnp.asarray(x), fs, cfg,
                                       use_matmul=True))
    out = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-10)


def test_pallas_with_stats_matches_full_reduction():
    """with_stats returns each image's exact PSD min/max (masked over the
    padded frames/bins), and normalize_from_stats is bit-identical to
    normalize on those stats."""
    from spectral_tpu.core.scale import normalize, normalize_from_stats
    fs = 16000.0
    cfg = SpecConfig.north_star(512, 128, log_scale=True)
    rng = np.random.RandomState(17)
    xb = jnp.asarray(rng.randn(3, 15000).astype(np.float32))  # partial block
    psd, pmin, pmax = stft_psd_pallas(xb, fs, cfg, with_stats=True)
    ref = np.asarray(stft_psd_pallas(xb, fs, cfg))
    np.testing.assert_array_equal(np.asarray(psd), ref)
    np.testing.assert_array_equal(np.asarray(pmin), ref.min(axis=(1, 2)))
    np.testing.assert_array_equal(np.asarray(pmax), ref.max(axis=(1, 2)))
    for i in range(3):
        s = jnp.swapaxes(psd[i], 0, 1)
        a = np.asarray(normalize(s, True))
        b = np.asarray(normalize_from_stats(s, pmin[i], pmax[i], True))
        np.testing.assert_array_equal(a, b)
    # scipy-default hop through the stats path too (gcd framing)
    cfg2 = SpecConfig.scipy_default(1024)
    psd2, lo2, hi2 = stft_psd_pallas(xb, fs, cfg2, with_stats=True)
    ref2 = np.asarray(stft_psd_pallas(xb, fs, cfg2))
    np.testing.assert_array_equal(np.asarray(lo2), ref2.min(axis=(1, 2)))
    np.testing.assert_array_equal(np.asarray(hi2), ref2.max(axis=(1, 2)))
    with pytest.raises(ValueError, match="with_stats"):
        stft_psd_pallas(xb, fs, cfg, log10_out=True, with_stats=True)


def test_pallas_short_signal_zero_frames():
    cfg = SpecConfig.north_star(1024, 256)
    out = stft_psd_pallas(jnp.zeros(100), 16000.0, cfg)
    assert out.shape == (0, 513)
    # batched + with_stats on the degenerate shape: empty PSD plus
    # per-clip zero extrema (not a crash or a (0,)-shaped stat)
    psd, pmin, pmax = stft_psd_pallas(jnp.zeros((3, 100)), 16000.0, cfg,
                                      with_stats=True)
    assert psd.shape == (3, 0, 513)
    assert pmin.shape == pmax.shape == (3,)


def test_pallas_pipeline_matches_xla_pipeline():
    from spectral_tpu.parallel.sharding import batched_spectrogram_fn
    fs = 16000.0
    cfg = SpecConfig.north_star(512, 128, log_scale=True)
    xb = jnp.asarray(np.random.RandomState(3).randn(2, 16000)
                     .astype(np.float32))
    ref = batched_spectrogram_fn(fs, cfg, use_matmul=True)(xb)
    out = pallas_pipeline_fn(fs, cfg)(xb)
    np.testing.assert_allclose(np.asarray(out["psd"]), np.asarray(ref["psd"]),
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=5e-5)
    # different accumulation orders perturb the image at ~4e-5, pushing a
    # small fraction of pixels across a 1/256 LUT-bin edge
    a = np.asarray(out["rgb_packed"]).ravel()
    b = np.asarray(ref["rgb_packed"]).ravel()
    assert (a != b).mean() < 5e-3

    # the per-clip health flag agrees with the XLA path's contract:
    # overflow (inf) and TOTAL underflow (tiny-but-real clip) unhealthy;
    # normal, exact-silence, and pure-DC clips healthy
    rng = np.random.RandomState(4)
    xb2 = jnp.asarray(np.stack([
        rng.randn(16000).astype(np.float32),
        (1e19 * rng.randn(16000)).astype(np.float32),
        (1e-25 * rng.randn(16000)).astype(np.float32),
        np.zeros(16000, np.float32),
        np.full(16000, 0.25, np.float32)]))
    want = [True, False, False, True, True]
    assert list(np.asarray(pallas_pipeline_fn(fs, cfg)(xb2)["finite"])) == want
    assert list(np.asarray(
        batched_spectrogram_fn(fs, cfg, use_matmul=True)(xb2)["finite"])) == want


@pytest.mark.parametrize("nperseg,hop,n", [
    (2048, 512, 60000),    # first freq-tiled size (FT < Fp)
    (4096, 1024, 60000),   # largest auto-pipelined tiled size
    (8192, 2048, 120000),  # GUI ceiling: manual-DMA A tiles (HBM + scratch)
])
def test_pallas_freq_tiled_matches_jnp(nperseg, hop, n):
    from spectral_tpu.ops.stft_pallas import _freq_dims
    fs = 16000.0
    cfg = SpecConfig.north_star(nperseg, hop)
    _f, fp, ft = _freq_dims(cfg)
    assert ft < fp                     # the tiled path is actually exercised
    x = np.random.RandomState(5).randn(n).astype(np.float32)
    ref = np.asarray(power_spectrogram(jnp.asarray(x), fs, cfg,
                                       use_matmul=True))
    out = np.asarray(stft_psd_pallas(jnp.asarray(x), fs, cfg))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=ref.max() * 1e-7)


def test_pallas_supported_rejects_semantics_it_cannot_compute():
    """The kernel computes uncentered PSD only: center/magnitude/mel
    configs must be rejected so pipeline callers fall back to the XLA
    path instead of silently getting wrong timing/values/shape."""
    base = dict(nperseg=1024, hop=256, window="hann", detrend="none")
    assert pallas_supported(SpecConfig(**base))
    assert not pallas_supported(SpecConfig(**base, center=True))
    assert not pallas_supported(SpecConfig(**base, mode="magnitude"))
    assert not pallas_supported(SpecConfig(**base, n_mels=64))
    # the kernel computes full-band PSD only; a band mask must route to
    # the XLA pipeline, which masks before normalizing (PlotEngine.py:114)
    assert not pallas_supported(SpecConfig(**base, fmin=0.0, fmax=30.0))
    assert not pallas_supported(SpecConfig(**base, fmax=100.0))
    with pytest.raises(ValueError, match="center"):
        stft_psd_pallas(jnp.zeros(4096), 1000.0,
                        SpecConfig(**base, center=True))


def test_matmul_precision_fallback_is_accurate(monkeypatch):
    """Without DotAlgorithmPreset (older jax), the 'fast' tier must
    degrade to HIGHEST — the plain default bf16 dot loses the spectrum
    (17 dB error)."""
    import jax
    from spectral_tpu.core.stft import matmul_precision
    monkeypatch.delattr(jax.lax, "DotAlgorithmPreset")
    assert (matmul_precision(SpecConfig(precision="fast"))
            == jax.lax.Precision.HIGHEST)


def test_pallas_integer_input_promotes():
    """Integer PCM promotes to float32 before the in-kernel windowed DFT
    (same rule as core.stft.frame_signal)."""
    fs = 1000.0
    xf = (np.sin(2 * np.pi * 40 * np.arange(4096) / fs) * 1000
          ).astype(np.float32)
    xi = xf.astype(np.int16)
    cfg = SpecConfig(nperseg=256, hop=128)
    pi = np.asarray(stft_psd_pallas(jnp.asarray(xi), fs, cfg))
    pf = np.asarray(stft_psd_pallas(jnp.asarray(xi.astype(np.float32)),
                                    fs, cfg))
    assert pi.dtype == np.float32
    np.testing.assert_array_equal(pi, pf)
