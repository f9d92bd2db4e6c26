"""End-to-end detection-flow tests: BurstDetector vs the reference's
unsupervised_detect / learn_and_detect behavior on synthetic bursty signals."""

import numpy as np
import pytest
import jax.numpy as jnp

from spectral_tpu.config import SpecConfig
from spectral_tpu.core import events as ev
from spectral_tpu.core.stft import power_spectrogram, freq_axis, time_axis
from spectral_tpu.models.detector import BurstDetector


def _bursty_signal(fs=1000.0, dur=60.0, bursts=((10, 15), (30, 38)), seed=0):
    rng = np.random.RandomState(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    x = 0.02 * rng.randn(n)
    for a, b in bursts:
        m = (t >= a) & (t < b)
        # Hann envelope: bursts ramp in/out like real discharges. With
        # razor-sharp edges the 4-state EM isolates the offset frames as
        # their own state whose mean log-power undercuts the true baseline,
        # and the reference's argmin-baseline rule (PlotEngine.py:445) then
        # misidentifies baseline — a reference-faithful failure mode, not a
        # detection-path bug.
        env = np.hanning(m.sum())
        x[m] += 0.6 * env * np.sin(2 * np.pi * 6.0 * t[m])
    return x.astype(np.float32)


def _features(x, fs, cfg, fmin, fmax):
    psd = power_spectrogram(jnp.asarray(x), fs, cfg)
    f = freq_axis(cfg, fs)
    t = time_axis(cfg, fs, len(x))
    feat = np.asarray(ev.features_from_psd(f, psd, fmin, fmax))
    return t, feat


def _iou(a, b):
    inter = max(0.0, min(a[1], b[1]) - max(a[0], b[0]))
    union = max(a[1], b[1]) - min(a[0], b[0])
    return inter / union


def test_unsupervised_detect_finds_bursts():
    fs = 1000.0
    bursts = ((10, 15), (30, 38))
    x = _bursty_signal(fs=fs, bursts=bursts)
    cfg = SpecConfig.scipy_default(1024)
    t, feat = _features(x, fs, cfg, 0.0, 30.0)

    det = BurstDetector(seed=42)
    events = det.unsupervised_detect(t, feat)
    assert len(events) == 2, events
    for found, true in zip(events, bursts):
        assert _iou(found, true) > 0.7, (found, true)
    # the unsupervised flow does NOT set is_model_refined (mirroring the
    # reference, PlotEngine.py:418-420), so a second call refits from the
    # same seeded init — the observable contract is determinism
    events2 = det.unsupervised_detect(t, feat)
    assert events == events2


def test_unsupervised_raises_on_short_signal():
    det = BurstDetector()
    t = np.array([0.0, 1.0])
    feat = np.zeros((2, 2), dtype=np.float32)
    with pytest.raises(ValueError, match="Not enough data"):
        det.unsupervised_detect(t, feat)


def test_unsupervised_empty_time_returns_empty():
    det = BurstDetector()
    assert det.unsupervised_detect(np.array([]), np.zeros((0, 2))) == []


def test_learn_and_detect_flow():
    fs = 1000.0
    bursts = ((10, 15), (30, 38))
    x = _bursty_signal(fs=fs, bursts=bursts)
    cfg = SpecConfig.scipy_default(1024)
    t, feat = _features(x, fs, cfg, 0.0, 30.0)

    det = BurstDetector(seed=42)
    # user draws sloppy ROIs around the true bursts
    rois = [(8.0, 17.0), (28.0, 40.0)]
    events = det.learn_and_detect(t, feat, rois)
    assert det.is_model_refined
    assert len(events) >= 2
    # the two largest events line up with the true bursts
    events = sorted(events, key=lambda e: e[1] - e[0], reverse=True)[:2]
    events = sorted(events)
    for found, true in zip(events, bursts):
        assert _iou(found, true) > 0.6, (found, true)

    # refined model now drives unsupervised_detect without refitting
    ev2 = det.unsupervised_detect(t, feat)
    assert len(ev2) >= 2


def test_learn_and_detect_requires_rois():
    det = BurstDetector()
    with pytest.raises(ValueError, match="No manual regions"):
        det.learn_and_detect(np.arange(10.0), np.zeros((10, 2)), [])


def test_learn_and_detect_rejects_empty_rois():
    det = BurstDetector()
    t = np.arange(100.0)
    feat = np.random.RandomState(0).randn(100, 2).astype(np.float32)
    # ROI entirely outside the time grid -> no points -> no clear burst
    with pytest.raises(ValueError, match="Could not identify"):
        det.learn_and_detect(t, feat, [(1000.0, 1001.0)])


def test_roi_with_fewer_than_two_points_skipped():
    det = BurstDetector()
    t = np.arange(100.0)
    rng = np.random.RandomState(0)
    feat = rng.randn(100, 2).astype(np.float32)
    feat[40:50, 0] += 6.0  # clear burst for the valid ROI
    # first ROI covers one point only -> skipped; second is valid
    events = det.learn_and_detect(t, feat, [(5.0, 5.5), (35.0, 55.0)])
    assert det.is_model_refined
    assert any(35.0 <= s <= 55.0 for s, _ in events)


def test_roi_with_fewer_frames_than_main_n_states_skipped():
    """The reference's quirk guard compares the ROI's frame count against
    the MAIN model's n_components (4), not the temp 2-state model's
    (PlotEngine.py:391-393, reproduced in _find_burst_in_roi): a 3-frame
    ROI passes the >=2-points gate but is still skipped."""
    det = BurstDetector()
    t = np.arange(100.0)
    rng = np.random.RandomState(0)
    feat = rng.randn(100, 2).astype(np.float32)
    feat[40:50, 0] += 6.0
    # 3 frames: >= 2 points, < n_states=4 -> _find_burst_in_roi returns
    # None; with ONLY this ROI nothing learnable remains
    with pytest.raises(ValueError, match="Could not identify"):
        det.learn_and_detect(t, feat, [(10.0, 12.0)])
    assert not det.is_model_refined
    # alongside a valid ROI it is silently skipped, like the reference
    events = det.learn_and_detect(t, feat, [(10.0, 12.0), (35.0, 55.0)])
    assert det.is_model_refined
    assert any(35.0 <= s <= 55.0 for s, _ in events)


def test_reset_model():
    det = BurstDetector()
    det.is_model_refined = True
    det.params = "sentinel"
    det.reset()
    assert det.params is None and not det.is_model_refined


def test_warmup_precompiles_and_detect_matches():
    """warmup(T, D) is shape-only (no data), idempotent per shape, and a
    warmed detector produces identical events to a cold one."""
    import time
    rng = np.random.RandomState(3)
    T = 300
    t = np.arange(T) * 0.064
    feats = rng.randn(T, 2).astype(np.float32)
    feats[80:140] += 3.0

    cold = BurstDetector()
    ev_cold = cold.unsupervised_detect(t, feats)

    warm = BurstDetector()
    warm.warmup(T, 2, background=False)
    key = (T, 2, 4, 100, "auto", False)
    assert key in BurstDetector._warmed
    t0 = time.time()
    warm.warmup(T, 2, background=False)     # second call: cache no-op
    assert time.time() - t0 < 0.05
    ev_warm = warm.unsupervised_detect(t, feats)
    assert ev_warm == ev_cold

    # background form returns immediately and never raises
    BurstDetector().warmup(T + 8, 2, background=True)


def test_nonfinite_features_refused_like_hmmlearn():
    """Inf/NaN features raise a clear ValueError (hmmlearn's sklearn
    check_array contract at PlotEngine.py:432) instead of flowing NaN
    through KMeans/EM and silently reporting zero events — the failure
    mode of a ~1e18-amplitude waveform whose power overflows float32."""
    rng = np.random.RandomState(0)
    T = 64
    t = np.arange(T) / 10.0
    feats = rng.randn(T, 2).astype(np.float32)
    for bad in (np.inf, np.nan):
        f_bad = feats.copy()
        f_bad[10, 0] = bad
        with pytest.raises(ValueError, match="NaN/Inf"):
            BurstDetector().unsupervised_detect(t, f_bad)
        with pytest.raises(ValueError, match="NaN/Inf"):
            BurstDetector().learn_and_detect(t, f_bad, [(1.0, 4.0)])


def test_engine_pscan_matches_scan_detection():
    """engine='pscan' (parallel-prefix HMM) must reproduce the default
    sequential engine's detections; engine='auto' switches at
    PSCAN_THRESHOLD frames (models/hmm_pscan.py)."""
    rng = np.random.RandomState(3)
    T = 400
    t = np.arange(T) / 20.0
    feats = rng.randn(T, 2).astype(np.float32)
    feats[120:180, 0] += 6.0
    feats[260:300, 0] += 6.0
    ev_scan = BurstDetector(engine="scan").unsupervised_detect(t, feats)
    ev_ps = BurstDetector(engine="pscan").unsupervised_detect(t, feats)
    assert ev_ps == ev_scan and len(ev_scan) >= 2

    # PSCAN_THRESHOLD is a CORRECTNESS threshold — backend-independent
    # (the sequential f32 E-step is wrong from ~2k frames; detector.py)
    det = BurstDetector(engine="auto")
    assert not det._parallel(det.PSCAN_THRESHOLD - 1)
    assert det._parallel(det.PSCAN_THRESHOLD)
    assert BurstDetector(engine="pscan")._parallel(2)
    assert not BurstDetector(engine="scan")._parallel(10 ** 9)
    # device routing: parallel problems prefer the accelerator; small
    # sequential problems stay on host; explicit device always wins
    assert det._uses_cpu(600 * 2, parallel=False)
    assert not det._uses_cpu(4096 * 2, parallel=True)
    assert BurstDetector(device="cpu")._uses_cpu(1 << 30, parallel=True)
    assert not BurstDetector(device="default")._uses_cpu(4, parallel=False)
    with pytest.raises(ValueError, match="engine"):
        BurstDetector(engine="fancy")
