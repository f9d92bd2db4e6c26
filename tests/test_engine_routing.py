"""Backend-aware STFT engine auto-routing (core.stft.default_use_matmul).

use_matmul=None must resolve to the MXU matmul/CT engine on TPU (measured
faster at every size on v5e — BENCH_REPORT stft_* rows) and to the
O(N log N) FFT engine on every other backend, and the resolved path must
be bit-identical to the explicitly pinned engine.
"""

import jax
import numpy as np
import pytest

from spectral_tpu.config import SpecConfig
from spectral_tpu.core import stft as st


@pytest.fixture
def x():
    rng = np.random.RandomState(7)
    return rng.randn(4096).astype(np.float32)


def test_default_use_matmul_backend_aware(monkeypatch):
    # conftest pins the cpu platform
    assert st.default_use_matmul() is False
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    assert st.default_use_matmul() is True


def test_nfft_128_routes_to_fft_on_tpu(monkeypatch):
    """nfft=128 is the one measured size where the FFT engine beats every
    matmul variant on v5e (see default_use_matmul's docstring) — the auto
    route must pick FFT there, on exactly that size, including when 128 is
    reached via zero-padding."""
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    assert st.default_use_matmul(SpecConfig.scipy_default(128)) is False
    assert st.default_use_matmul(SpecConfig.north_star(128, 32)) is False
    assert st.default_use_matmul(
        SpecConfig(nperseg=100, nfft=128, hop=25)) is False
    for cfg in (SpecConfig.scipy_default(64), SpecConfig.scipy_default(256),
                SpecConfig.scipy_default(1024)):
        assert st.default_use_matmul(cfg) is True
    # the FFT route still computes the same answer
    rng = np.random.RandomState(3)
    x = rng.randn(4096).astype(np.float32)
    cfg = SpecConfig.north_star(128, 32)
    auto = np.asarray(st.power_spectrogram(x, 1000.0, cfg))
    fft = np.asarray(st.power_spectrogram(x, 1000.0, cfg, use_matmul=False))
    assert np.array_equal(auto, fft)


def test_auto_routes_to_fft_on_cpu(x):
    cfg = SpecConfig.north_star(256, 64)
    auto = np.asarray(st.power_spectrogram(x, 1000.0, cfg))
    fft = np.asarray(st.power_spectrogram(x, 1000.0, cfg, use_matmul=False))
    assert np.array_equal(auto, fft)


def test_auto_routes_to_matmul_under_tpu_backend(x, monkeypatch):
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    cfg = SpecConfig.north_star(256, 64)
    auto = np.asarray(st.power_spectrogram(x, 1000.0, cfg))
    mm = np.asarray(st.power_spectrogram(x, 1000.0, cfg, use_matmul=True))
    assert np.array_equal(auto, mm)
    # sanity: on this input the two engines differ in the low ulps, so
    # array_equal above genuinely distinguishes the routes
    fft = np.asarray(st.power_spectrogram(x, 1000.0, cfg, use_matmul=False))
    assert not np.array_equal(mm, fft)
    assert np.allclose(mm, fft, rtol=1e-4, atol=1e-9)


def test_stft_and_spectrogram_accept_auto(x):
    cfg = SpecConfig.scipy_default(512)
    z_auto = np.asarray(st.stft(x, cfg))
    z_fft = np.asarray(st.stft(x, cfg, use_matmul=False))
    assert np.array_equal(z_auto, z_fft)
    f, t, sxx = st.spectrogram(x, 1000.0, cfg)
    f2, t2, sxx2 = st.spectrogram(x, 1000.0, cfg, use_matmul=False)
    assert np.array_equal(np.asarray(sxx), np.asarray(sxx2))


def test_streaming_defaults_auto_route(x, monkeypatch):
    """The streaming drivers' use_matmul=None must follow the same routing
    (the CLI stream command relies on this default)."""
    from spectral_tpu.parallel.streaming import scan_spectrogram
    cfg = SpecConfig.north_star(256, 64)
    out_auto = np.asarray(scan_spectrogram(x, 1000.0, cfg, chunk_size=512))
    mono = np.asarray(st.power_spectrogram(x, 1000.0, cfg, use_matmul=False))
    np.testing.assert_allclose(out_auto, mono, rtol=1e-4, atol=1e-10)
    monkeypatch.setattr(st.jax, "default_backend", lambda: "tpu")
    out_tpu = np.asarray(scan_spectrogram(x, 1000.0, cfg, chunk_size=512))
    mono_mm = np.asarray(st.power_spectrogram(x, 1000.0, cfg,
                                              use_matmul=True))
    np.testing.assert_allclose(out_tpu, mono_mm, rtol=1e-4, atol=1e-10)


def test_center_true_fft_engine_matches_matmul_and_manual_pad(x):
    """The rFFT engine's centered framing (core.stft._prep_frames pad
    branch) ran only through the matmul route in the rest of the suite —
    cross-check all three derivations: FFT engine == matmul engine ==
    explicit reflect-pad + center=False, and the centered time axis is
    k*hop/fs."""
    import dataclasses
    fs = 1000.0
    cfg = SpecConfig(nperseg=256, hop=64, center=True)
    fft = np.asarray(st.power_spectrogram(x, fs, cfg, use_matmul=False))
    mm = np.asarray(st.power_spectrogram(x, fs, cfg, use_matmul=True))
    np.testing.assert_allclose(fft, mm, rtol=2e-4, atol=1e-9)

    p = cfg.nperseg // 2
    xp = np.pad(x, (p, p), mode="reflect")
    uncfg = dataclasses.replace(cfg, center=False)
    manual = np.asarray(st.power_spectrogram(xp, fs, uncfg,
                                             use_matmul=False))
    np.testing.assert_array_equal(fft, manual)

    t = st.time_axis(cfg, fs, len(x))
    assert t.shape == (fft.shape[0],)
    np.testing.assert_allclose(t, np.arange(len(t)) * cfg.hop_ / fs)
    # uncentered axis starts at the frame CENTER instead
    tu = st.time_axis(uncfg, fs, len(x))
    assert tu[0] == cfg.nperseg / 2.0 / fs
