"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest
import jax.numpy as jnp
import scipy.signal

from spectral_tpu.config import SpecConfig, ViewSettings
from spectral_tpu.core.stft import (mask_band_rows, power_spectrogram,
                                    spectrogram, stft, psd_scale)
from spectral_tpu.core.windows import get_window, parse_window


def test_twosided_band_mask_not_contiguous():
    """fmin/fmax on a two-sided spectrum: fftfreq ordering makes the mask
    non-contiguous; rows must match the masked frequency axis exactly."""
    fs = 1000.0
    x = np.random.RandomState(0).randn(4096).astype(np.float32)
    cfg = SpecConfig(nperseg=256, onesided=False, fmin=-50.0, fmax=50.0,
                     mode="psd")
    f, t, sxx = spectrogram(jnp.asarray(x), fs, cfg)
    assert f.shape[0] == np.asarray(sxx).shape[0]
    assert np.all((f >= -50.0) & (f <= 50.0))
    # sanity: the masked row count equals the two-sided mask cardinality
    full_f = np.fft.fftfreq(256, 1 / fs)
    assert f.shape[0] == ((full_f >= -50) & (full_f <= 50)).sum()


def test_mask_band_rows_numpy_and_device_agree():
    f = np.fft.rfftfreq(256, 1 / 1000.0)
    sxx = np.random.RandomState(1).rand(129, 7).astype(np.float32)
    f1, out1 = mask_band_rows(f, sxx, 10.0, 100.0)
    f2, out2 = mask_band_rows(f, jnp.asarray(sxx), 10.0, 100.0)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(out1, np.asarray(out2))
    # empty band
    f3, out3 = mask_band_rows(f, sxx, 900.0, 950.0)
    assert f3.size == 0 and out3.shape == (0, 7)


def test_tukey_alpha_zero_is_boxcar():
    w = get_window(("tukey", 0.0), 128)
    np.testing.assert_array_equal(
        w, scipy.signal.get_window(("tukey", 0.0), 128, fftbins=True))
    assert np.all(w == 1.0)
    assert parse_window("tukey")[1] is None  # bare name -> default alpha
    # default (no param) stays the scipy spectrogram default 0.25
    np.testing.assert_allclose(
        get_window("tukey", 128),
        scipy.signal.get_window(("tukey", 0.25), 128, fftbins=True))


def test_complex_mode_routes_to_stft():
    fs = 1000.0
    x = np.random.RandomState(2).randn(2048)
    cfg = SpecConfig(nperseg=256, mode="complex", detrend="constant")
    with pytest.raises(ValueError, match="complex"):
        power_spectrogram(jnp.asarray(x, jnp.float32), fs, cfg)
    f, t, sxx = spectrogram(jnp.asarray(x, jnp.float32), fs, cfg)
    assert np.iscomplexobj(np.asarray(sxx))
    ref_f, ref_t, ref = scipy.signal.spectrogram(
        x, fs=fs, nperseg=256, scaling="density", mode="complex")
    np.testing.assert_allclose(np.asarray(sxx), ref, atol=np.abs(ref).max() * 1e-5)


def test_iter_stream_drops_padded_tail_frames():
    from spectral_tpu.parallel.streaming import iter_stream
    from spectral_tpu.core.stft import num_frames
    cfg = SpecConfig.north_star(256, 64)
    fs = 1000.0
    n = 2500  # final chunk is short -> padded internally
    x = np.random.RandomState(3).randn(n).astype(np.float32)
    chunks = [x[i:i + 1024] for i in range(0, n, 1024)]
    blocks = list(iter_stream(iter(chunks), fs, cfg, 1024))
    total = sum(b.shape[0] for b, _ in blocks)
    assert total == num_frames(n, 256, 64)  # no zero-padding garbage frames
    ref = np.asarray(power_spectrogram(jnp.asarray(x), fs, cfg))
    cat = np.concatenate([b for b, _ in blocks])
    np.testing.assert_allclose(cat, ref, rtol=1e-4, atol=1e-9)


def test_pipeline_propagates_producer_errors(tmp_path):
    from spectral_tpu.parallel.pipeline import export_spectrograms

    def bad_clips():
        yield "ok", np.zeros(1000, np.float32)
        raise RuntimeError("corrupt file")

    with pytest.raises(RuntimeError, match="corrupt file"):
        export_spectrograms(bad_clips(), 8000.0,
                            SpecConfig.north_star(256, 64), str(tmp_path),
                            clip_samples=1000, batch=4)


def test_session_render_applies_mel():
    from spectral_tpu.api.session import AnalysisSession
    from spectral_tpu.io.registry import SweepEntry
    fs = 16000.0
    t = np.arange(32000) / fs
    tone = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
    s = AnalysisSession()
    s.registry.register("x_sweep0", SweepEntry(
        filepath="x", sweep_idx=0, fs=fs, fs_raw=fs, raw=tone, processed=None))
    res = s.plot_sweeps(["x_sweep0"],
                        SpecConfig.north_star(1024, 256, n_mels=64),
                        ViewSettings())
    assert res.sxx.shape[0] == 64          # mel rows, not 513 linear bins
    assert s.last_f.shape == (64,)          # mel center frequencies
    peak_f = s.last_f[np.argmax(res.sxx.sum(axis=1))]
    assert 1500.0 < peak_f < 2600.0         # tone lands near 2 kHz


def test_config_precision_validated():
    """A typo'd precision must not silently select the bf16 display tier
    (stft.matmul_precision branches on == 'accurate')."""
    with pytest.raises(ValueError, match="precision"):
        SpecConfig(precision="highest")
    SpecConfig(precision="fast")  # the two legal tiers construct fine
    SpecConfig(precision="accurate")


def test_config_window_validation_single_source():
    """Config-time window validation goes through get_window itself: the
    friendly kaiser error fires for tuple specs with a None param too."""
    with pytest.raises(ValueError, match="beta"):
        SpecConfig(window=("kaiser", None))
    # separate blocks: `a and b` inside one raises-block short-circuits at
    # the first raise and never exercises the second path
    with pytest.raises(ValueError, match="beta"):
        get_window(("kaiser", None), 8)
    assert parse_window(("kaiser", None)) == ("kaiser", None)
    with pytest.raises(ValueError, match="unknown window"):
        SpecConfig(window="not_a_window")
    SpecConfig(window=("kaiser", 14.0))


def test_config_mel_range_validated():
    with pytest.raises(ValueError, match="mel_fmax"):
        SpecConfig(n_mels=8, mel_fmin=500.0, mel_fmax=500.0)
    with pytest.raises(ValueError, match="mel_fmin"):
        SpecConfig(n_mels=8, mel_fmin=-1.0)
    with pytest.raises(ValueError, match="n_mels"):
        SpecConfig(n_mels=0)


def test_mel_filterbank_range_validated():
    """Degenerate/out-of-range mel spans used to produce NaN (Slaney 2/0
    enorm) or silently all-zero top filters above Nyquist."""
    from spectral_tpu.core.mel import mel_filterbank
    with pytest.raises(ValueError, match="greater than"):
        mel_filterbank(8, 513, 16000.0, 500.0, 500.0)
    with pytest.raises(ValueError, match="Nyquist"):
        mel_filterbank(16, 513, 16000.0, 0.0, 20000.0)
    fb = mel_filterbank(16, 513, 16000.0)  # defaults stay fine
    assert np.isfinite(fb).all()
    # every filter overlaps at least one FFT bin
    assert (fb.sum(axis=1) > 0).all()


def test_wav_streamed_placeholder_and_truncated(tmp_path):
    """Streamed WAVs with a zero data-size placeholder read to EOF; a
    declared chunk size beyond EOF raises 'truncated' instead of silently
    shortening the signal (or a cryptic np.frombuffer error)."""
    from spectral_tpu.io.wav import read_wav, write_wav
    fs = 1000.0
    x = np.sin(np.arange(1000) * 0.1).astype(np.float32) * 0.5
    p = tmp_path / "s.wav"
    write_wav(str(p), x, fs)
    good = p.read_bytes()
    ref, _ = read_wav(str(p))

    # patch the data chunk size (offset 40 for our canonical writer) to 0:
    # streaming-writer placeholder -> payload is the rest of the file
    streamed = bytearray(good)
    assert streamed[36:40] == b"data"
    streamed[40:44] = (0).to_bytes(4, "little")
    ps = tmp_path / "streamed.wav"
    ps.write_bytes(bytes(streamed))
    xs, fss = read_wav(str(ps))
    assert fss == fs and np.array_equal(xs, ref)

    # declared data size larger than the remaining bytes -> clean error
    trunc = bytearray(good)
    trunc[40:44] = (len(good)).to_bytes(4, "little")
    pt = tmp_path / "trunc.wav"
    pt.write_bytes(bytes(trunc))
    with pytest.raises(ValueError, match="truncated"):
        read_wav(str(pt))


def test_sampling_rate_validated_at_api_boundary():
    """A nonpositive/non-finite fs must raise, not propagate inf/NaN.

    Every fs-consuming formula divides by the rate (1/fs bin spacing,
    1/(fs*sum w^2) density scale); before the guard, fs=0 through the
    public power_spectrogram silently produced inf PSDs (the IO layer
    validates at parse, but direct library calls did not).
    """
    from spectral_tpu.core.stft import freq_axis, time_axis

    cfg = SpecConfig(nperseg=64, hop=16)
    x = np.random.default_rng(0).standard_normal(256).astype(np.float32)
    for bad in (0.0, -1.0, float("nan"), float("inf"), None, "16k"):
        with pytest.raises(ValueError, match="sampling rate"):
            power_spectrogram(x, bad, cfg)
        with pytest.raises(ValueError, match="sampling rate"):
            freq_axis(cfg, bad)
        with pytest.raises(ValueError, match="sampling rate"):
            time_axis(cfg, bad, 256)
    # numpy scalar rates (np.float32 is NOT a float subclass) stay legal
    f = freq_axis(cfg, np.float32(1000.0))
    assert f[1] == pytest.approx(1000.0 / 64)


def test_window_degenerate_and_param_branches_match_scipy():
    """Coverage-lens gaps (tools/covlite.py): the M=1 guards in every window
    family, the tukey alpha<=0 / alpha>=1 degenerate branches, and the
    'name:param' string spec — each against scipy.signal.get_window."""
    import scipy.signal as ss

    names = ["boxcar", "hann", "hamming", "blackman", "bartlett",
             "blackmanharris", "nuttall", "flattop"]
    for nm in names:
        for M in (1, 2, 9):
            for periodic in (True, False):
                ours = get_window(nm, M, periodic=periodic)
                ref = ss.get_window(nm, M, fftbins=periodic)
                np.testing.assert_allclose(ours, ref, atol=1e-12), (nm, M)
    # tukey degenerate alphas: 0 -> boxcar, 1 -> hann; M=1 guard
    for alpha, M in [(0.0, 16), (1.0, 16), (0.25, 1), (0.6, 33)]:
        np.testing.assert_allclose(
            get_window(("tukey", alpha), M, periodic=True),
            ss.get_window(("tukey", alpha), M, fftbins=True), atol=1e-12)
    # kaiser with beta; and the string 'name:param' form parses to the same
    np.testing.assert_allclose(
        get_window("kaiser:8.6", 64), get_window(("kaiser", 8.6), 64))
    np.testing.assert_allclose(
        get_window(("kaiser", 8.6), 64),
        ss.get_window(("kaiser", 8.6), 64, fftbins=True), atol=1e-12)
    np.testing.assert_allclose(
        get_window("tukey:0.5", 64),
        ss.get_window(("tukey", 0.5), 64, fftbins=True), atol=1e-12)
    # M=1 periodic kaiser (the L = M branch)
    assert get_window(("kaiser", 5.0), 1).shape == (1,)
