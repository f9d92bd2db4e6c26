"""The compute core is differentiable end to end — a trainable audio
front-end for free (cf. "Efficient Trainable Front-Ends for Neural Speech
Enhancement", PAPERS.md), which the reference's scipy pipeline cannot be.

These tests certify that jax.grad flows through framing, the DFT (both
compute paths), PSD scaling, mel projection, and the display normalization,
with values checked against central finite differences.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectral_tpu.config import SpecConfig
from spectral_tpu.core.mel import mel_filterbank
from spectral_tpu.core.scale import normalize
from spectral_tpu.core.stft import power_spectrogram


@pytest.mark.parametrize("use_matmul", [False, True])
def test_grad_through_psd_matches_finite_differences(use_matmul):
    fs = 1000.0
    cfg = SpecConfig.north_star(64, 16)
    x = jnp.asarray(np.random.RandomState(0).randn(400), jnp.float32)

    def loss(sig):
        p = power_spectrogram(sig, fs, cfg, use_matmul=use_matmul)
        return jnp.sum(p * p)

    g = np.asarray(jax.grad(loss)(x))
    assert np.isfinite(g).all() and np.abs(g).max() > 0

    # central finite differences on a few coordinates
    eps = 1e-3
    xn = np.asarray(x, np.float64)
    for i in (0, 57, 200, 399):
        e = np.zeros_like(xn)
        e[i] = eps
        num = (float(loss(jnp.asarray(xn + e, jnp.float32)))
               - float(loss(jnp.asarray(xn - e, jnp.float32)))) / (2 * eps)
        assert g[i] == pytest.approx(num, rel=2e-2, abs=1e-4), i


def test_grad_through_mel_and_display():
    fs = 8000.0
    cfg = SpecConfig.north_star(128, 32)
    x = jnp.asarray(np.random.RandomState(1).randn(1000), jnp.float32)
    fb = jnp.asarray(mel_filterbank(24, cfg.n_freqs, fs).T, jnp.float32)

    def loss(sig):
        p = power_spectrogram(sig, fs, cfg, use_matmul=True)
        mel = p @ fb
        img = normalize(mel.T, log_scale=True)
        return jnp.mean(img)

    g = np.asarray(jax.grad(loss)(x))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_grad_wrt_mel_filterbank_weights():
    # the mel projection is a plain matmul: its weights are trainable
    fs = 8000.0
    cfg = SpecConfig.north_star(128, 32)
    x = jnp.asarray(np.random.RandomState(2).randn(1000), jnp.float32)
    p = power_spectrogram(x, fs, cfg, use_matmul=True)
    fb0 = jnp.asarray(mel_filterbank(24, cfg.n_freqs, fs).T, jnp.float32)

    def loss(fb):
        return jnp.sum(jnp.log(p @ fb + 1e-6))

    g = np.asarray(jax.grad(loss)(fb0))
    assert g.shape == fb0.shape and np.isfinite(g).all()
    assert np.abs(g).max() > 0
