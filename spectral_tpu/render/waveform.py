"""Time-domain waveform rasterization on device.

Replaces the reference's batch signal PNG export, which re-renders each sweep
through matplotlib at dpi=3000 (ExportManager.export_batch_signals_to_png,
ExportManager.py:113-189; ~12 s per figure). Here a waveform image is computed
as a min/max envelope fill: each pixel column covers a fixed time bin, the
signal's min and max within the bin define the vertical span of lit pixels —
the standard audio-editor waveform rendering, expressed as reductions +
broadcasted comparisons that XLA fuses into one pass.

Reference semantics preserved as options: fixed x-limit window (the reference
hardcodes 0-300 s, :178), shared symmetric y-limits across a batch (global
max-amplitude pass, :126-144, :179), black line on transparent background
(:175, savefig(transparent=True) :184).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def waveform_image(x: Array, height: int = 800, width: int = 2400,
                   y_limit: Optional[float] = None,
                   n_samples_visible: Optional[int] = None) -> Array:
    """Render (..., n) signals to (..., height, width) boolean line masks.

    y_limit: symmetric vertical scale (default: per-signal max |x|; pass the
    batch-global max to reproduce the reference's shared y-scale).
    n_samples_visible: how many samples span the x-axis (default: all n;
    pass int(300 * fs) to reproduce the reference's fixed 0-300 s window —
    signals shorter than the window leave the remaining columns empty).
    """
    n = x.shape[-1]
    vis = n_samples_visible if n_samples_visible is not None else n
    spc = max(1, -(-vis // width))          # samples per column (ceil)
    total = spc * width
    # truncate at the REQUESTED window before padding: total rounds vis up
    # to a column multiple, and slicing x[..., :total] would render up to
    # spc-1 samples past the window edge into the final columns (the
    # reference's xlim is a hard cut)
    cut = min(vis, n)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, total - cut)]
    # pad with NaN so out-of-range columns produce empty spans
    xp = jnp.pad(x[..., :cut].astype(jnp.float32), pad,
                 constant_values=np.nan)
    cols = xp.reshape(x.shape[:-1] + (width, spc))
    cmin = jnp.nanmin(cols, axis=-1)                   # (..., W)
    cmax = jnp.nanmax(cols, axis=-1)

    if y_limit is None:
        # per-signal max |x| over the FULL signal (as documented and as the
        # reference's amplitude pass does, ExportManager.py:126-144) — NOT
        # over the visible window, which would rescale truncated renders
        ylim = jnp.nanmax(jnp.abs(x.astype(jnp.float32)), axis=-1,
                          keepdims=True)                        # (..., 1)
    else:
        ylim = jnp.asarray(y_limit, jnp.float32)
    ylim = jnp.maximum(ylim, 1e-30)

    # pixel row y (0 = top) covers amplitude a(y) = ylim * (1 - 2*(y+.5)/H)
    ys = (1.0 - 2.0 * (jnp.arange(height, dtype=jnp.float32) + 0.5) / height)
    amp = ys[:, None] * jnp.reshape(ylim, jnp.shape(ylim) + (1,))  # (...,H,1)
    # column span grown by half a pixel so the line is always >= 1 px thick
    half_px = jnp.reshape(ylim, jnp.shape(ylim) + (1,)) / height
    lo = cmin[..., None, :] - half_px
    hi = cmax[..., None, :] + half_px
    mask = (amp >= lo) & (amp <= hi)
    return mask


def waveform_rgba(x: Array, height: int = 800, width: int = 2400,
                  y_limit: Optional[float] = None,
                  n_samples_visible: Optional[int] = None,
                  color: Tuple[int, int, int] = (0, 0, 0),
                  transparent: bool = True) -> Array:
    """Render signals to uint8 RGBA images (..., H, W, 4): colored line on a
    transparent (or white) background, mirroring the reference's black-line
    transparent export."""
    mask = waveform_image(x, height, width, y_limit, n_samples_visible)
    c = jnp.asarray(color, jnp.uint8)
    bg = jnp.asarray([255, 255, 255], jnp.uint8)
    rgb = jnp.where(mask[..., None], c, bg)
    alpha = jnp.where(mask, 255, 0 if transparent else 255
                      ).astype(jnp.uint8)[..., None]
    return jnp.concatenate([rgb, alpha], axis=-1)
