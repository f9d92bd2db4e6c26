"""Metamorphic invariants of the compute core.

These pin down relations the reference satisfies *by construction of the
math* (scipy spectrogram, PlotEngine.py:113) rather than by any oracle
comparison: how the output must transform when the input is transformed.
They catch scaling-chain and framing bugs that pointwise golden tests can
miss — a wrong PSD normalization constant, for instance, cancels out of a
normalized-display golden test but fails Parseval here.

Exactness notes: several relations hold *bitwise* in f32, not just
approximately, because the transform commutes with every rounding step —
negation is exact, and multiplication by a power of two rescales every
intermediate (frame, mean, window product, DFT partial sum) exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from spectral_tpu.config import SpecConfig
from spectral_tpu.core import events as ev
from spectral_tpu.core.stft import (_window_f64, frame_signal, freq_axis,
                                    power_spectrogram, spectrogram)

FS = 1000.0


def _noise(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def _sxx(x, cfg, fs=FS):
    _, _, s = spectrogram(x, fs, cfg)
    return np.asarray(s)


def test_sign_flip_is_bitwise_invariant():
    """|X|^2 of -x equals |X|^2 of x bitwise: f32 negation is exact, so
    every intermediate is the exact negation and the square is identical."""
    x = _noise(4103)
    cfg = SpecConfig(nperseg=256)
    assert np.array_equal(_sxx(-x, cfg), _sxx(x, cfg))


def test_shift_by_whole_hops_shifts_frames_bitwise():
    """Dropping k*hop leading samples drops exactly the first k frames:
    frame extraction is pure slicing and the per-frame pipeline (detrend,
    window, DFT) is position-independent, so surviving columns are
    bitwise identical."""
    cfg = SpecConfig(nperseg=256)          # scipy default hop = 224
    hop = cfg.nperseg - cfg.nperseg // 8
    x = _noise(4103, seed=1)
    k = 3
    full = _sxx(x, cfg)
    shifted = _sxx(x[k * hop:], cfg)
    assert np.array_equal(shifted, full[:, k:k + shifted.shape[1]])


def test_power_of_two_amplitude_scaling_is_exact():
    """x -> 4x must give exactly 16x the PSD (density scaling is linear in
    power). Scaling by a power of two multiplies every f32 intermediate
    exactly, so this holds bitwise — a wrong normalization constant or a
    non-homogeneous term anywhere in the chain breaks it."""
    x = _noise(4103, seed=2)
    cfg = SpecConfig(nperseg=256)
    assert np.array_equal(_sxx(4.0 * x, cfg), 16.0 * _sxx(x, cfg))


def test_normalized_display_is_unit_invariant():
    """The normalized display image (global-max normalize, optional dB) is
    invariant to the recording's units — volts vs millivolts must render
    the same picture (PlotEngine.py:126-131 normalizes by the global max)."""
    from spectral_tpu.core.scale import normalize
    x = _noise(4103, seed=3)
    cfg = SpecConfig(nperseg=256)
    s = _sxx(x, cfg)
    s4 = _sxx(4.0 * x, cfg)
    for log_scale in (False, True):
        a = np.asarray(normalize(jnp.asarray(s), log_scale=log_scale))
        b = np.asarray(normalize(jnp.asarray(s4), log_scale=log_scale))
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_parseval_per_frame():
    """Column sums of the density PSD times df must equal the energy of
    the detrended, windowed frame over the window's energy:
      sum_f Sxx[f, j] * (fs / nfft) == sum_t (xw[j, t])^2 / sum_t w[t]^2.
    This checks the full scaling chain (psd_scale, one-sided doubling with
    DC/Nyquist exceptions) end to end against first principles."""
    x = _noise(4103, seed=4)
    cfg = SpecConfig(nperseg=256)
    hop = cfg.nperseg - cfg.nperseg // 8
    s = _sxx(x, cfg)

    w = _window_f64(cfg)
    fr = np.asarray(frame_signal(jnp.asarray(x), cfg.nperseg, hop),
                    dtype=np.float64)
    fr -= fr.mean(axis=-1, keepdims=True)
    xw = fr * w
    rhs = (xw ** 2).sum(axis=-1) / (w ** 2).sum()
    lhs = s.sum(axis=0, dtype=np.float64) * (FS / cfg.nperseg)
    np.testing.assert_allclose(lhs, rhs, rtol=2e-5)


def test_constant_signal_detrends_to_zero():
    """detrend='constant' removes a DC signal entirely. With a
    binary-exact constant the f32 mean is exact and the PSD is exactly
    zero; with an inexact constant only mean-rounding residue (squared)
    survives — orders of magnitude below any real signal."""
    cfg = SpecConfig(nperseg=256)
    exact = _sxx(np.full(2048, 4.0, np.float32), cfg)
    assert not exact.any()
    approx = _sxx(np.full(2048, 3.7, np.float32), cfg)
    assert approx.max() < 1e-10


def test_pure_tone_concentrates_in_its_bin():
    """A tone at exactly bin m (integer cycles per frame, boxcar window,
    no detrend, hop = nperseg) leaks nothing: every other row is at
    float-noise level relative to the tone row."""
    cfg = SpecConfig(nperseg=256, hop=256, window="boxcar", detrend="none")
    m = 16
    tone = np.sin(2 * np.pi * m * np.arange(2048) / 256).astype(np.float32)
    f, _, s = spectrogram(tone, FS, cfg)
    s = np.asarray(s)
    assert f[m] == pytest.approx(m * FS / 256)
    tone_row = s[m].min()
    leak = np.delete(s, m, axis=0).max()
    assert leak < 1e-12 * tone_row


def test_time_reversal_reverses_columns():
    """With a symmetric window (boxcar), no partial tail frame, and
    |DFT(reversed)| = |DFT|, reversing the signal reverses the frame
    order: Sxx(x[::-1]) == Sxx(x)[:, ::-1] up to reduction-order noise."""
    cfg = SpecConfig(nperseg=256, window="boxcar")
    hop = 224
    n = 256 + 7 * hop                      # last frame ends exactly at n
    x = _noise(n, seed=5)
    a = _sxx(x, cfg)
    b = _sxx(x[::-1].copy(), cfg)
    np.testing.assert_allclose(b[:, ::-1], a, rtol=0, atol=1e-5 * a.max())


def test_relative_band_powers_are_unit_invariant():
    """Relative band power is a ratio of sums of the same PSD; scaling the
    waveform by a power of two scales numerator and denominator by exactly
    16, so every ratio is bitwise identical (PlotEngine.py:708-710)."""
    x = _noise(8192, seed=6)
    cfg = SpecConfig(nperseg=256)
    f = freq_axis(cfg, FS)
    p1 = np.asarray(power_spectrogram(jnp.asarray(x), FS, cfg)).T
    p4 = np.asarray(power_spectrogram(jnp.asarray(4.0 * x), FS, cfg)).T
    assert ev.band_powers(f, p1) == ev.band_powers(f, p4)


def test_unsupervised_detection_is_unit_invariant():
    """The detector must not care whether the recording is in volts or
    quarter-volts: scaling power by 16 shifts log-power features by a
    constant, k-means init and EM are shift-equivariant, and the Viterbi
    path — hence the event list — is identical. (Power-of-two scaling
    makes the feature shift exact in f32, so this holds exactly.)"""
    from spectral_tpu.models.detector import BurstDetector

    rng = np.random.RandomState(7)
    fs, dur = 1000.0, 30.0
    n = int(fs * dur)
    t = np.arange(n) / fs
    x = 0.02 * rng.randn(n)
    for a, b in ((8.0, 12.0), (20.0, 24.0)):
        m = (t >= a) & (t < b)
        x[m] += 0.6 * np.hanning(m.sum()) * np.sin(2 * np.pi * 6.0 * t[m])
    x = x.astype(np.float32)

    cfg = SpecConfig(nperseg=256)
    def detect(sig):
        psd = power_spectrogram(jnp.asarray(sig), fs, cfg)
        f = freq_axis(cfg, fs)
        feat = np.asarray(ev.features_from_psd(f, psd, 2.0, 12.0))
        from spectral_tpu.core.stft import time_axis
        tt = time_axis(cfg, fs, len(sig))
        return BurstDetector().unsupervised_detect(tt, feat)

    assert detect(x) == detect(4.0 * x)


def test_merge_is_idempotent_and_order_invariant():
    """Merging already-merged events is a no-op, and the result does not
    depend on the input order (the reference sorts first,
    PlotEngine.py:669-684)."""
    events = [(0.0, 1.0), (0.5, 2.0), (3.0, 4.0), (4.0 + 5e-7, 5.0),
              (7.0, 8.0)]
    merged = ev.merge_overlapping_events(events)
    assert ev.merge_overlapping_events(merged) == merged
    rng = np.random.default_rng(8)
    for _ in range(5):
        perm = [events[i] for i in rng.permutation(len(events))]
        assert ev.merge_overlapping_events(perm) == merged
