"""Mel filterbank tests (north-star extension; no reference counterpart)."""

import numpy as np
import pytest
import jax.numpy as jnp

from spectral_tpu.core.mel import (hz_to_mel, mel_to_hz, mel_filterbank,
                                   mel_spectrogram)


def test_mel_hz_roundtrip():
    f = np.linspace(0, 8000, 100)
    for htk in (False, True):
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk), htk), f,
                                   rtol=1e-10, atol=1e-8)


def test_slaney_linear_below_1khz():
    # Slaney mel is linear (3f/200) below 1 kHz
    np.testing.assert_allclose(hz_to_mel(500.0), 7.5, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-12)


def test_filterbank_shape_and_triangles():
    fb = mel_filterbank(128, 513, 16000.0)
    assert fb.shape == (128, 513)
    assert np.all(fb >= 0)
    # every filter has some support; supports are sorted by center frequency
    assert np.all(fb.sum(axis=1) > 0)
    centers = [np.argmax(fb[m]) for m in range(128)]
    assert all(c2 >= c1 for c1, c2 in zip(centers, centers[1:]))


def test_unnormalized_filter_peak_is_one_htk():
    fb = mel_filterbank(40, 513, 16000.0, htk=True, norm=False)
    peaks = fb.max(axis=1)
    # triangular peaks approach 1 where bin spacing resolves the triangle
    assert np.all(peaks <= 1.0 + 1e-9) and np.median(peaks) > 0.8


def test_mel_spectrogram_energy_mapping():
    # a pure tone lands in the filter whose center is nearest the tone freq
    fs, n = 16000.0, 16384
    tone = 2000.0
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * tone * t).astype(np.float32)

    from spectral_tpu.config import SpecConfig
    from spectral_tpu.core.stft import power_spectrogram
    cfg = SpecConfig.north_star(1024, 256)
    psd = power_spectrogram(jnp.asarray(x), fs, cfg)  # (T, F)
    mel = np.asarray(mel_spectrogram(psd, fs, 64))
    assert mel.shape == (psd.shape[0], 64)

    # independent oracle: the mel center frequencies from the hz/mel grid
    # formulas, NOT from mel_filterbank (which mel_spectrogram itself uses —
    # a systematic filterbank error would cancel out of that comparison)
    pts = np.linspace(hz_to_mel(0.0), hz_to_mel(fs / 2.0), 64 + 2)
    centers_hz = mel_to_hz(pts[1:-1])
    expected_m = int(np.argmin(np.abs(centers_hz - tone)))
    assert abs(int(np.argmax(mel.mean(axis=0))) - expected_m) <= 1


def test_matches_reference_oracle_if_available():
    # a silent `return` would report PASSED forever in an image without
    # librosa; importorskip surfaces the truth as a SKIP
    librosa = pytest.importorskip("librosa")
    fb_ref = librosa.filters.mel(sr=16000, n_fft=1024, n_mels=64)
    fb = mel_filterbank(64, 513, 16000.0)
    np.testing.assert_allclose(fb, fb_ref, atol=1e-8)
