"""Behavioral tests for event algebra, features, label track, band powers
against the reference's exact control flow (SURVEY.md §4.3)."""

import numpy as np
import jax.numpy as jnp
import scipy.signal

from spectral_tpu.config import SpecConfig
from spectral_tpu.core import events as ev
from spectral_tpu.core.stft import power_spectrogram, freq_axis


# ---- features (PlotEngine.py:229-242) -------------------------------------

def test_features_match_reference_formula():
    fs = 1000.0
    rng = np.random.RandomState(0)
    x = rng.randn(8192)
    cfg = SpecConfig.scipy_default(256)
    f_ref, t_ref, sxx_ref = scipy.signal.spectrogram(
        x, fs=fs, nperseg=256, scaling="density", mode="psd")
    fmin, fmax = 0.0, 30.0
    mask = (f_ref >= fmin) & (f_ref <= fmax)
    power = sxx_ref[mask, :].sum(axis=0)
    logp = np.log10(power + 1e-20)
    ref_feat = np.column_stack([logp, np.diff(logp, prepend=logp[0])])

    psd = power_spectrogram(jnp.asarray(x, jnp.float32), fs, cfg)  # (T, F)
    f = freq_axis(cfg, fs)
    feat = np.asarray(ev.features_from_psd(f, psd, fmin, fmax))
    assert feat.shape == ref_feat.shape
    np.testing.assert_allclose(feat, ref_feat, atol=2e-4)


# ---- scans (PlotEngine.py:313-321, :447-470) -------------------------------

def test_baseline_scan_boundary_timing():
    t = np.arange(10, dtype=float)  # 0..9
    b = 0
    states = np.array([0, 0, 1, 1, 1, 0, 0, 2, 2, 0])
    # event 1: leaves baseline at i=2 -> start t[1]=1; returns at i=5 -> end t[4]=4
    # event 2: leaves at i=7 -> start t[6]=6; returns at i=9 -> end t[8]=8
    assert ev.baseline_scan(states, t, b) == [(1.0, 4.0), (6.0, 8.0)]


def test_baseline_scan_open_event_closes_at_end():
    t = np.arange(5, dtype=float)
    states = np.array([0, 1, 1, 1, 1])
    assert ev.baseline_scan(states, t, 0) == [(0.0, 4.0)]


def test_baseline_scan_initial_nonbaseline_never_opens():
    # the reference's loop starts at i=1 and requires was_baseline_before
    t = np.arange(5, dtype=float)
    states = np.array([1, 1, 0, 0, 0])
    assert ev.baseline_scan(states, t, 0) == []


def test_baseline_scan_zero_width_event_dropped():
    t = np.array([0.0, 1.0, 1.0, 2.0])  # duplicate time -> end == start
    states = np.array([0, 0, 1, 0])
    # start = t[1] = 1.0, end = t[2] = 1.0 -> end > start fails -> dropped
    assert ev.baseline_scan(states, t, 0) == []


def test_label_scan_state3_does_not_close():
    t = np.arange(8, dtype=float)
    states = np.array([0, 1, 2, 3, 2, 0, 1, 0])
    # event 1: opens at t[1]=1 (state1), state3 at i=3 ignored, closes at t[5]=5
    # event 2: opens at t[6]=6, end of sequence -> closes at t[-1]=7
    assert ev.label_scan(states, t) == [(1.0, 5.0), (6.0, 7.0)]


def test_merge_overlapping_events_tolerance():
    events = [(3.0, 4.0), (0.0, 1.0), (1.0 + 5e-7, 2.0)]
    # second interval starts within 1e-6 of the first's end -> merged
    assert ev.merge_overlapping_events(events) == [(0.0, 2.0), (3.0, 4.0)]
    # outside tolerance -> kept separate
    events = [(0.0, 1.0), (1.0 + 1e-5, 2.0)]
    assert ev.merge_overlapping_events(events) == [(0.0, 1.0), (1.0 + 1e-5, 2.0)]


def test_merge_contained_interval_extends_end():
    # interval fully inside the previous one: merged keeps max end
    events = [(0.0, 10.0), (2.0, 3.0)]
    assert ev.merge_overlapping_events(events) == [(0.0, 10.0)]


# ---- label track (PlotEngine.py:301-308) -----------------------------------

def test_build_label_track():
    t = np.arange(10, dtype=float)
    labels = ev.build_label_track(t, [(2.0, 5.0)])
    expect = np.array([0, 0, 1, 2, 2, 3, 0, 0, 0, 0])
    np.testing.assert_array_equal(labels, expect)


def test_build_label_track_end_at_last_sample():
    t = np.arange(5, dtype=float)
    labels = ev.build_label_track(t, [(3.0, 4.0)])
    # end_idx = 4 == len-1 -> offset label written at last position
    np.testing.assert_array_equal(labels, np.array([0, 0, 0, 1, 3]))
    labels = ev.build_label_track(t, [(3.0, 7.0)])
    # end_idx = 5 == len -> no offset label (end_idx < len fails)
    np.testing.assert_array_equal(labels, np.array([0, 0, 0, 1, 2]))


def test_build_label_track_degenerate_skipped():
    t = np.arange(5, dtype=float)
    labels = ev.build_label_track(t, [(2.0, 2.0)])
    np.testing.assert_array_equal(labels, np.zeros(5, dtype=int))


# ---- band powers (PlotEngine.py:686-719) -----------------------------------

def test_band_powers_reference_semantics():
    f = np.arange(0, 251, 1.0)  # 0..250 Hz in 1 Hz bins
    rng = np.random.RandomState(1)
    sxx = rng.rand(len(f), 50)
    out = ev.band_powers(f, jnp.asarray(sxx, jnp.float32))
    total = sxx.sum()
    for name, (lo, hi) in ev.EEG_BANDS.items():
        mask = (f >= lo) & (f < hi)  # upper edge exclusive
        np.testing.assert_allclose(out[name], sxx[mask, :].sum() / total,
                                   rtol=1e-5)
    # bands partition [0, 250); the f=250 bin falls outside every band
    # (upper edge exclusive), so the relative powers sum to slightly < 1
    in_bands = sxx[(f >= 0) & (f < 250)].sum() / total
    assert abs(sum(out.values()) - in_bands) < 1e-5


def test_band_powers_zero_total_guard():
    f = np.arange(0, 100, 1.0)
    sxx = np.zeros((100, 10))
    out = ev.band_powers(f, jnp.asarray(sxx, jnp.float32))
    assert all(v == 0.0 for v in out.values())


def test_band_powers_clamps_negative():
    f = np.arange(0, 10, 1.0)
    sxx = -np.ones((10, 5))
    out = ev.band_powers(f, jnp.asarray(sxx, jnp.float32),
                         {"all": (0, 10)})
    assert out["all"] == 0.0


def test_band_powers_device_matches_host():
    f = np.arange(0, 251, 1.0)
    rng = np.random.RandomState(2)
    sxx = rng.rand(len(f), 50).astype(np.float32)
    host = ev.band_powers(f, jnp.asarray(sxx))
    edges = list(ev.EEG_BANDS.values())
    dev = np.asarray(ev.band_powers_device(f, jnp.asarray(sxx.T), edges))
    np.testing.assert_allclose(dev, np.array(list(host.values())), rtol=1e-5)


def test_absolute_power():
    sxx = np.arange(12, dtype=np.float32).reshape(3, 4)
    assert ev.absolute_power(jnp.asarray(sxx)) == sxx.sum()


# ---- ROI ops (PlotEngine.py:553-645) ---------------------------------------

def test_add_roi_min_width_and_ordering():
    out = ev.add_roi([], 5.0, 2.0, min_width=0.5)
    assert out == [(2.0, 5.0)]  # endpoints sorted
    out = ev.add_roi(out, 1.0, 1.1, min_width=0.5)
    assert out == [(2.0, 5.0)]  # too narrow -> dropped


def test_delete_roi():
    evs = [(1.0, 2.0), (3.0, 4.0)]
    assert ev.delete_roi(evs, (1.0, 2.0)) == [(3.0, 4.0)]
    assert ev.delete_roi(evs, (9.0, 10.0)) == evs  # absent -> unchanged


def test_merge_contained_rois():
    evs = [(0.0, 10.0), (1.0, 2.0), (4.0, 6.0), (11.0, 12.0)]
    out = ev.merge_contained_rois(evs, (0.0, 10.0))
    # union of contained = (1, 6); container and contained removed
    assert out == [(1.0, 6.0), (11.0, 12.0)]
    # nothing contained -> unchanged
    out = ev.merge_contained_rois([(0.0, 1.0), (5.0, 6.0)], (0.0, 1.0))
    assert out == [(0.0, 1.0), (5.0, 6.0)]
