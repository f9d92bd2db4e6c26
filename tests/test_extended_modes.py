"""Golden tests for the extended STFT surface: more windows, linear detrend,
zero-padded nfft, magnitude mode, spectrum scaling, amplitude-range budget."""

import numpy as np
import pytest
import scipy.signal
import jax.numpy as jnp

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.stft import power_spectrogram, spectrogram
from spectral_tpu.core.windows import get_window


@pytest.mark.parametrize("window,scipy_name", [
    ("blackmanharris", "blackmanharris"),
    ("nuttall", "nuttall"),
    ("flattop", "flattop"),
    (("kaiser", 14.0), ("kaiser", 14.0)),
    (("kaiser", 5.0), ("kaiser", 5.0)),
])
@pytest.mark.parametrize("M", [64, 257, 1024])
def test_extended_windows_match_scipy(window, scipy_name, M):
    ours = get_window(window, M, periodic=True)
    ref = scipy.signal.get_window(scipy_name, M, fftbins=True)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_kaiser_requires_beta():
    with pytest.raises(ValueError, match="beta"):
        get_window("kaiser", 64)
    with pytest.raises(ValueError, match="beta"):
        SpecConfig(window="kaiser")
    SpecConfig(window=("kaiser", 8.0))  # ok


@pytest.mark.parametrize("use_matmul", [False, True])
def test_linear_detrend_matches_scipy(use_matmul):
    fs = 1000.0
    rng = np.random.RandomState(0)
    # strong trend + offset: linear detrend must remove both
    t = np.arange(8192) / fs
    x = rng.randn(8192) + 5.0 * t + 3.0
    cfg = SpecConfig(nperseg=256, hop=128, window="hann", detrend="linear")
    f_ref, t_ref, ref = scipy.signal.spectrogram(
        x, fs=fs, window="hann", nperseg=256, noverlap=128,
        detrend="linear", scaling="density", mode="psd")
    _, _, sxx = spectrogram(jnp.asarray(x, jnp.float32), fs, cfg,
                            use_matmul=use_matmul)
    np.testing.assert_allclose(np.asarray(sxx), ref, rtol=1e-3,
                               atol=ref.max() * 2e-5)


def test_nfft_zero_padding_matches_scipy():
    fs = 1000.0
    x = np.random.RandomState(1).randn(8192)
    cfg = SpecConfig(nperseg=256, nfft=512, hop=128, window="hann",
                     detrend="none")
    f_ref, _, ref = scipy.signal.spectrogram(
        x, fs=fs, window="hann", nperseg=256, noverlap=128, nfft=512,
        detrend=False, scaling="density", mode="psd")
    f, _, sxx = spectrogram(jnp.asarray(x, jnp.float32), fs, cfg)
    assert sxx.shape[0] == 257 == f_ref.shape[0]
    np.testing.assert_allclose(f, f_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sxx), ref, rtol=1e-4,
                               atol=ref.max() * 2e-5)


def test_magnitude_mode_matches_scipy():
    fs = 1000.0
    x = np.random.RandomState(2).randn(8192)
    cfg = SpecConfig(nperseg=256, hop=128, window="hann", detrend="none",
                     mode="magnitude")
    _, _, ref = scipy.signal.spectrogram(
        x, fs=fs, window="hann", nperseg=256, noverlap=128,
        detrend=False, scaling="density", mode="magnitude")
    _, _, sxx = spectrogram(jnp.asarray(x, jnp.float32), fs, cfg)
    np.testing.assert_allclose(np.asarray(sxx), ref, rtol=1e-4,
                               atol=ref.max() * 2e-5)


def test_spectrum_scaling_matches_scipy():
    fs = 1000.0
    x = np.random.RandomState(3).randn(8192)
    cfg = SpecConfig(nperseg=256, hop=128, window="hann", detrend="none",
                     scaling="spectrum")
    _, _, ref = scipy.signal.spectrogram(
        x, fs=fs, window="hann", nperseg=256, noverlap=128,
        detrend=False, scaling="spectrum", mode="psd")
    _, _, sxx = spectrogram(jnp.asarray(x, jnp.float32), fs, cfg)
    np.testing.assert_allclose(np.asarray(sxx), ref, rtol=1e-4,
                               atol=ref.max() * 2e-5)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 1.0, 1e3, 1e6])
def test_db_error_budget_across_magnitudes(scale):
    """SURVEY.md §7 hard-part 1: the dB display error must hold across
    input magnitudes (f32 dynamic range, log tail, min-max rescale)."""
    fs = 16000.0
    rng = np.random.RandomState(4)
    x = (rng.randn(64000) * scale).astype(np.float32)
    cfg = SpecConfig.north_star(1024, 256, log_scale=True)
    _, _, ref64 = scipy.signal.spectrogram(
        np.asarray(x, np.float64), fs=fs, window="hann", nperseg=1024,
        noverlap=768, detrend=False, scaling="density", mode="psd")
    norm = np.clip(ref64 / (ref64.max() + 1e-20), 0, 1)
    db = 10 * np.log10(norm + 1e-12)
    rng_db = db.max() - db.min()

    from spectral_tpu.core.scale import normalize
    psd = power_spectrogram(jnp.asarray(x), fs, cfg)
    img = np.asarray(normalize(jnp.swapaxes(psd, -1, -2), log_scale=True))
    ref_img = (db - db.min()) / rng_db
    err_db = np.abs(img - ref_img).max() * rng_db
    # Budget: across +/-120 dB of input scaling the display error stays
    # within 5e-3 dB. The floor term is fp32 FFT physics (a bin L dB below
    # peak carries ~eps*10^(L/20) relative error) and the reference's
    # min-max rescale couples every pixel to the noisiest floor bin; the
    # <=1e-3 dB contract for unit-scale signals is pinned in
    # test_stft_golden.test_db_pipeline_error_budget.
    assert err_db <= 5e-3, (scale, err_db)


def test_fast_precision_tier_is_usable():
    # 'fast' = bf16 3-pass (X3): much looser than 'accurate' but must stay
    # within display-usable error (the old single-pass bf16 lost 17 dB)
    import dataclasses
    import scipy.signal
    fs = 16000.0
    x = np.random.RandomState(0).randn(40000).astype(np.float32)
    cfg = SpecConfig.north_star(1024, 256)
    _f, _t, sref = scipy.signal.spectrogram(
        np.asarray(x, np.float64), fs=fs, window="hann", nperseg=1024,
        noverlap=768, detrend=False, scaling="density", mode="psd")
    fast_cfg = dataclasses.replace(cfg, precision="fast")
    p = np.asarray(power_spectrogram(jnp.asarray(x), fs, fast_cfg,
                                     use_matmul=True)).T
    norm = np.clip(p / (p.max() + 1e-20), 0, 1)
    ref = np.clip(sref / (sref.max() + 1e-20), 0, 1)
    db = np.nan_to_num(10 * np.log10(norm + 1e-12))
    dbr = np.nan_to_num(10 * np.log10(ref + 1e-12))
    assert np.max(np.abs(db - dbr)) < 0.5   # usable; 'accurate' holds 1e-3
