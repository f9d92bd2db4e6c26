"""Decorated figure rendering (optional matplotlib layer).

The core render path produces raw pixels (device colormap -> PNG). For parity
with the reference's *figures* — the 2-row shared-x layout with a signal plot
over the spectrogram, axis labels, legend, colorbar and burst overlays
(PlotEngine._create_axes :63-66, plot_extra :78-108, _plot_spectrogram
:134-145, plot_detection_lines :655-667) — this module decorates an
AnalysisSession's state with matplotlib (Agg). matplotlib is an optional
dependency of exactly this module.

Reference styling reproduced: raw signal in blue / processed in black
(:83-86), legend upper-right (:90), jet colormap with vmin=0/vmax=1 and a
"Normalized Power" colorbar (:134-138), x-limit = max(signal, spectrogram)
duration (:139-143), y-limit [fmin, f_max] (:144), burst spans in blue at
alpha 0.5 on both axes (:658-659).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def render_session_figure(session, path: Optional[str] = None, dpi: int = 150,
                          transparent: bool = False):
    """Render the session's current plot state to a decorated figure.

    Returns the matplotlib Figure; writes PNG to `path` if given. With
    transparent=True and legends stripped this mirrors the reference's
    export_to_png_transparent (ExportManager.py:92-111) at a sane dpi.
    """
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib.figure import Figure

    fig = Figure(constrained_layout=True, dpi=dpi)
    gs = fig.add_gridspec(nrows=2, ncols=1, height_ratios=[1, 1])
    ax_signal = fig.add_subplot(gs[0, 0])
    ax_spec = fig.add_subplot(gs[1, 0], sharex=ax_signal)

    fs = session.last_fs
    sig_dur = 0.0
    if session.signal_raw is not None and fs:
        t = np.arange(len(session.signal_raw)) / fs
        ax_signal.plot(t, session.signal_raw, color="blue", label="Raw")
        sig_dur = max(sig_dur, t[-1] if len(t) else 0.0)
    if session.signal_proc is not None and fs:
        t = np.arange(len(session.signal_proc)) / fs
        ax_signal.plot(t, session.signal_proc, color="black", label="Processed")
        sig_dur = max(sig_dur, t[-1] if len(t) else 0.0)
    if ax_signal.has_data():
        ax_signal.set_ylabel("Amplitude")
        if not transparent:
            leg = ax_signal.legend(loc="upper right", frameon=True)
            leg.set_zorder(100)

    if session.last_image is not None and session.last_t.size:
        f, t_ax = session.last_f, session.last_t
        pcm = ax_spec.pcolormesh(t_ax, f, session.last_image, shading="auto",
                                 cmap="jet", vmin=0.0, vmax=1.0, zorder=0)
        ax_spec.set_ylabel("Frequency (Hz)")
        ax_spec.set_xlabel("Time (s)")
        if not transparent:
            fig.colorbar(pcm, ax=ax_spec, orientation="vertical",
                         label="Normalized Power")
        max_time = max(t_ax[-1], sig_dur) if sig_dur else t_ax[-1]
        ax_spec.set_xlim(0, max_time)
        fmin = session.config.fmin if session.config and session.config.fmin \
            else 0.0
        ax_spec.set_ylim(fmin, f[-1])

    # burst overlays on both axes (plot_detection_lines semantics)
    for tr, tf in session.last_detected_events:
        ax_signal.axvspan(tr, tf, color="blue", alpha=0.5, zorder=10)
        ax_spec.axvspan(tr, tf, color="blue", alpha=0.5, zorder=10)

    if path is not None:
        fig.savefig(path, format="png", dpi=dpi, transparent=transparent)
    return fig
