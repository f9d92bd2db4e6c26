"""Random-walk state-machine test over the session + figure stack.

The reference's interaction layer is a mutable state machine (plot state,
ROI patches, detected events, model refinement — PlotEngine.py:22-44);
sequence-dependent bugs (stale state after replots, divergence between the
ROI list and the event list, exports reading cleared context) only surface
under mixed action orders. This walks a seeded random sequence of user
actions and asserts the cross-cutting invariants after every step.
"""

import numpy as np
import pytest

from spectral_tpu.api.session import AnalysisSession
from spectral_tpu.config import SpecConfig, ViewSettings
from spectral_tpu.io.registry import SweepEntry

FS = 1000.0


def _make_session():
    s = AnalysisSession(warm_detection=False)
    rng = np.random.RandomState(0)
    n = int(FS * 20)
    t = np.arange(n) / FS
    for i in range(2):
        x = 0.05 * rng.randn(n).astype(np.float32)
        for a, b in ((4.0, 6.0), (12.0, 15.0)):
            m = (t >= a) & (t < b)
            x[m] += np.sin(2 * np.pi * 6.0 * t[m]).astype(np.float32)
        s.registry.register(f"r_sweep{i}", SweepEntry(
            filepath="r", sweep_idx=i, fs=FS, fs_raw=FS,
            raw=x, processed=x * 0.5 if i == 0 else None))
    return s


CONFIGS = [
    SpecConfig.scipy_default(256, fmin=0.0, fmax=30.0, log_scale=True),
    SpecConfig.scipy_default(512),
    SpecConfig.north_star(256, 64, log_scale=True),
    SpecConfig.north_star(512, 128, n_mels=24, fmax=80.0),
]


def _invariants(s, tmp_path):
    # plot state coherence
    if s.last_sxx is not None and s.last_sxx.size and s.last_t.size:
        assert s.last_sxx.shape == (len(s.last_f), len(s.last_t))
        if s.last_image is not None:
            assert s.last_image.shape == s.last_sxx.shape
            assert float(s.last_image.min()) >= 0.0
            assert float(s.last_image.max()) <= 1.0
    # ROI/event sanity
    for a, b in s.rois:
        assert a <= b
    for a, b in s.last_detected_events:
        assert a <= b
    # CSV export gate: success iff events exist AND a plot context exists
    msg = s.export_csv(str(tmp_path / "walk.csv"))
    if s.last_detected_events:
        assert msg.startswith("Successfully"), msg
    else:
        assert msg.startswith("Error"), msg
    # analytics never crash; None only without a plot
    power = s.calculate_absolute_power()
    bands = s.calculate_band_powers()
    assert (power is None) == (s.last_sxx is None)
    assert (bands is None) == (s.last_sxx is None or s.last_f is None)
    if bands is not None:
        for v in bands.values():
            assert v >= 0.0


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_session_random_walk(seed, tmp_path):
    rng = np.random.RandomState(seed)
    s = _make_session()
    plotted = False

    for step in range(60):
        action = rng.choice(
            ["plot", "plot_combine", "roi", "delete", "merge", "detect",
             "learn", "clear", "save_load", "png"],
            p=[0.22, 0.08, 0.17, 0.08, 0.05, 0.12,
               0.08, 0.05, 0.07, 0.08])
        try:
            if action == "plot":
                s.plot_sweeps([f"r_sweep{rng.randint(2)}"],
                              CONFIGS[rng.randint(len(CONFIGS))],
                              ViewSettings())
                plotted = True
            elif action == "plot_combine":
                s.plot_sweeps(["r_sweep0", "r_sweep1"],
                              CONFIGS[rng.randint(len(CONFIGS))],
                              ViewSettings(combine=True))
                plotted = True
            elif action == "roi" and plotted:
                a = float(rng.uniform(0, 18))
                s.add_roi(a, a + float(rng.uniform(0.5, 3.0)))
            elif action == "delete" and s.rois:
                s.delete_roi(s.rois[rng.randint(len(s.rois))])
            elif action == "merge" and s.rois:
                s.merge_rois(s.rois[rng.randint(len(s.rois))])
            elif action == "detect" and plotted:
                s.unsupervised_detect()
            elif action == "learn" and plotted and len(s.rois) >= 1:
                try:
                    s.learn_and_detect()
                except ValueError:
                    pass  # "no clear burst in ROI" is a legal outcome
            elif action == "clear":
                s.clear()
                plotted = False
            elif action == "save_load":
                p = str(tmp_path / f"st{step}.npz")
                s.save_state(p)
                s2 = AnalysisSession(warm_detection=False)
                s2.load_state(p)
                assert s2.last_detected_events == s.last_detected_events
            elif action == "png" and plotted and s.last_image is not None:
                s.export_png(str(tmp_path / f"w{step}.png"))
        except Exception as e:  # pragma: no cover - fail with context
            raise AssertionError(
                f"seed {seed} step {step} action {action!r}: {e}") from e
        _invariants(s, tmp_path)


def test_figure_view_random_walk(tmp_path):
    """Drive SessionFigureView through interleaved rebuilds and overlay
    reconciles — the mesh must survive overlay-only updates and overlay
    artists must track the controller lists exactly."""
    mpl = pytest.importorskip("matplotlib")
    from spectral_tpu.render.figure import SessionFigureView
    rng = np.random.RandomState(9)
    s = _make_session()
    s.plot_sweeps(["r_sweep0"], CONFIGS[0],
                  ViewSettings(mode_raw="Spectrogram"))
    view = SessionFigureView()
    view.rebuild(s, show_spectrogram=True)
    patches, colors = [], []
    for step in range(40):
        act = rng.choice(["add", "remove", "hover", "drag", "rebuild"])
        if act == "add":
            a = float(rng.uniform(0, 18))
            patches.append((a, a + 1.0))
            colors.append("blue")
        elif act == "remove" and patches:
            i = rng.randint(len(patches))
            patches.pop(i)
            colors.pop(i)
        elif act == "hover" and patches:
            colors = ["blue"] * len(colors)
            colors[rng.randint(len(colors))] = "red"
        drag = (3.0, float(rng.uniform(4, 9))) if act == "drag" else None
        mesh_before = view.mesh
        if act == "rebuild":
            view.rebuild(s, show_spectrogram=True)
        view.update_overlays(patches, colors, drag)
        assert len(view.span_artists()) == len(patches)
        assert (view.drag_artists() is not None) == (drag is not None)
        if act != "rebuild":
            assert view.mesh is mesh_before  # overlays never rebuild it
