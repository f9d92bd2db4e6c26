"""Cooley-Tukey two-stage matmul DFT (core/stft.py::_ct_dft).

Above CT_MIN_NFFT the matmul engine factorizes the transform as two
MXU-shaped stages (N = 128 * N2) instead of one dense window-folded
matrix. These tests pin the dispatch gating and prove the factorized
path bit-parity-class equal to both the dense path it replaces and the
scipy f64 oracle (reference contract: PlotEngine.py:113).
"""

import dataclasses

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from spectral_tpu.config import SpecConfig
from spectral_tpu.core import stft as stft_mod


def test_ct_factors_gating():
    # below the threshold: dense path (at 1024 the factorized path's
    # display error, 5.9e-3 dB on chip, exceeds the matmul-tier budget)
    assert stft_mod.ct_factors(SpecConfig.scipy_default(1024)) is None
    # at/above: (128, N//128)
    assert stft_mod.ct_factors(SpecConfig.scipy_default(2048)) == (128, 16)
    assert stft_mod.ct_factors(SpecConfig.scipy_default(4096)) == (128, 32)
    assert stft_mod.ct_factors(SpecConfig.scipy_default(8192)) == (128, 64)
    # nfft > nperseg (zero-padded transform): CT pads the windowed frames
    cfg = dataclasses.replace(SpecConfig.scipy_default(4096), nfft=8192)
    assert stft_mod.ct_factors(cfg) == (128, 64)
    # nfft not a multiple of 128 cannot tile stage 1
    odd = dataclasses.replace(SpecConfig.scipy_default(4096),
                              nperseg=4100, nfft=4100)
    assert stft_mod.ct_factors(odd) is None


@pytest.mark.parametrize("nperseg", [2048, 4096, 8192])
def test_ct_matches_dense(nperseg, monkeypatch):
    """The factorized DFT must reproduce the dense window-folded matmul
    to f32 roundoff — same inputs, same precision flag, only the
    factorization differs."""
    fs = 16000.0
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(nperseg * 4), jnp.float32)
    cfg = SpecConfig.scipy_default(nperseg=nperseg)
    assert stft_mod.ct_factors(cfg) is not None

    ct_re, ct_im = stft_mod._matmul_dft(x, cfg)
    monkeypatch.setattr(stft_mod, "ct_factors", lambda c: None)
    de_re, de_im = stft_mod._matmul_dft(x, cfg)

    scale = float(jnp.max(jnp.abs(de_re)))
    np.testing.assert_allclose(np.asarray(ct_re), np.asarray(de_re),
                               atol=2e-5 * scale, rtol=0)
    np.testing.assert_allclose(np.asarray(ct_im), np.asarray(de_im),
                               atol=2e-5 * scale, rtol=0)


@pytest.mark.parametrize("sig", ["noise", "offset"])
def test_ct_scipy_parity_4096(sig):
    """End-to-end PSD through the CT path vs the scipy f64 oracle, at the
    same relative budget the dense golden tests enforce."""
    fs = 1000.0
    n = 4096 * 6
    rng = np.random.RandomState(0)
    x = rng.randn(n) + (7.5 if sig == "offset" else 0.0)
    cfg = SpecConfig.scipy_default(nperseg=4096)

    _, _, ref = scipy.signal.spectrogram(
        x, fs=fs, nperseg=4096, scaling="density", mode="psd")
    _, _, ours = stft_mod.spectrogram(jnp.asarray(x, jnp.float32), fs, cfg,
                                      use_matmul=True)
    ours = np.asarray(ours)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) / ref.max() < 2e-5


def test_ct_batched_leading_dims():
    """The factorized path must keep the engine's (..., n) batch contract
    (parallel/sharding.py vmaps over leading axes)."""
    fs = 1000.0
    rng = np.random.RandomState(1)
    xb = jnp.asarray(rng.randn(3, 4096 * 3), jnp.float32)
    cfg = SpecConfig.scipy_default(nperseg=4096)
    _, _, batched = stft_mod.spectrogram(xb, fs, cfg, use_matmul=True)
    _, _, single = stft_mod.spectrogram(xb[1], fs, cfg, use_matmul=True)
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(single))


@pytest.mark.parametrize("mode", ["complex", "magnitude"])
def test_ct_nonpsd_modes_engine_parity(mode):
    """stft()/power_spectrogram route complex and magnitude modes through
    the same matmul engine; at CT sizes those must match the rFFT engine
    (previously only tested at nperseg=256, below the CT threshold)."""
    fs = 16000.0
    x = jnp.asarray(np.random.RandomState(9).randn(8192).astype(np.float32))
    cfg = dataclasses.replace(SpecConfig.scipy_default(2048), mode=mode)
    assert stft_mod.ct_factors(cfg) is not None
    if mode == "complex":
        a = np.asarray(stft_mod.stft(x, cfg, use_matmul=True))
        b = np.asarray(stft_mod.stft(x, cfg, use_matmul=False))
    else:
        a = np.asarray(stft_mod.power_spectrogram(x, fs, cfg,
                                                  use_matmul=True))
        b = np.asarray(stft_mod.power_spectrogram(x, fs, cfg,
                                                  use_matmul=False))
    scale = np.max(np.abs(b))
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-5 * scale)


@pytest.mark.parametrize("nperseg,nfft", [
    (1000, 1024),   # dense path, zero-padded
    (1024, 2048),   # CT path, zero-padded, nperseg below the CT floor
    (3000, 4096),   # CT path, non-128-multiple window length
])
def test_matmul_zero_padded_nfft_scipy_parity(nperseg, nfft):
    """scipy's nfft zero-padding through the matmul engine: the dense
    matrices are the first nperseg rows of the nfft transform and the CT
    form pads the windowed frames — both must match the scipy oracle
    (previously the engine refused nfft != nperseg outright, which
    crashed pipelines that default use_matmul=True)."""
    fs = 1000.0
    x = np.random.RandomState(4).randn(nfft * 5)
    cfg = SpecConfig(nperseg=nperseg, nfft=nfft, hop=None)

    _, _, ref = scipy.signal.spectrogram(
        x, fs=fs, nperseg=nperseg, nfft=nfft,
        scaling="density", mode="psd")
    _, _, ours = stft_mod.spectrogram(jnp.asarray(x, jnp.float32), fs, cfg,
                                      use_matmul=True)
    ours = np.asarray(ours)
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) / ref.max() < 2e-5


def test_ct_factors_cost_gating_small_nperseg():
    """A zero-padded transform with a SMALL nperseg must stay on the dense
    path: the dense window-folded matrices are (nperseg, n_freqs), so at
    e.g. nperseg=256/nfft=2048 they cost fewer MACs than the factorized
    stages (and 9x fewer at nperseg=32)."""
    for nperseg in (32, 64, 128, 256):
        cfg = dataclasses.replace(SpecConfig.scipy_default(nperseg),
                                  nfft=2048)
        assert stft_mod.ct_factors(cfg) is None, nperseg
    # from 512 up the factorization's FLOP cut wins again
    cfg = dataclasses.replace(SpecConfig.scipy_default(512), nfft=2048)
    assert stft_mod.ct_factors(cfg) == (128, 16)
