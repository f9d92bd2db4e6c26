"""On-device colormap application.

Replaces the reference's matplotlib rasterization hot loop
(``pcolormesh(..., cmap='jet')`` at PlotEngine.py:134, measured ~360 ms per
513x178 image on CPU) with a LUT gather that XLA fuses with the normalization
arithmetic: normalized [0,1] image -> uint8 RGB(A) array on device, DMA'd to
host only for PNG encoding.

Index mapping matches matplotlib's Colormap.__call__: idx = clip(floor(x * N),
0, N-1), so pixels equal the reference's rendering of the same data.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.render.lut import get_lut

Array = jax.Array


def apply_colormap(img: Array, lut: Optional[np.ndarray] = None,
                   name: str = "jet", flip_rows: bool = False) -> Array:
    """Map a normalized image (..., H, W) in [0, 1] to uint8 RGB (..., H, W, 3).

    flip_rows=True flips the frequency axis so row 0 is the highest frequency
    (image convention: origin at top-left; the reference's pcolormesh puts low
    frequencies at the bottom).
    """
    if lut is None:
        lut = get_lut(name)
    n = lut.shape[0]
    lut_dev = jnp.asarray(lut)
    idx = jnp.clip((img * n).astype(jnp.int32), 0, n - 1)
    rgb = lut_dev[idx]
    if flip_rows:
        rgb = jnp.flip(rgb, axis=-3)
    return rgb


def apply_colormap_packed(img: Array, name: str = "jet",
                          flip_rows: bool = False,
                          opaque: bool = True) -> Array:
    """Colormap to packed little-endian RGBA words: (..., H, W) -> uint32.

    Some device->host paths move sub-word dtypes far slower than 32-bit
    words (measured: >500x on a tunneled TPU). Packing R|G<<8|B<<16|A<<24 on
    device keeps the transfer on the fast path; :func:`unpack_rgba` restores
    (H, W, 4) uint8 on host as a zero-copy view.
    """
    lut8 = get_lut(name).astype(np.uint32)
    a = np.uint32(255 << 24) if opaque else np.uint32(0)
    packed_lut = (lut8[:, 0] | (lut8[:, 1] << 8) | (lut8[:, 2] << 16) | a)
    n = packed_lut.shape[0]
    idx = jnp.clip((img * n).astype(jnp.int32), 0, n - 1)
    out = jnp.asarray(packed_lut)[idx]
    if flip_rows:
        out = jnp.flip(out, axis=-2)
    return out


def unpack_rgba(packed: np.ndarray) -> np.ndarray:
    """uint32 (..., H, W) -> uint8 (..., H, W, 4) (little-endian view)."""
    arr = np.ascontiguousarray(np.asarray(packed, dtype="<u4"))
    return arr.view(np.uint8).reshape(arr.shape + (4,))


def apply_colormap_rgba(img: Array, alpha: Optional[Array] = None,
                        name: str = "jet", flip_rows: bool = False) -> Array:
    """Same as apply_colormap but with an alpha channel (default opaque).

    Passing an alpha mask reproduces the reference's transparent-PNG export
    (ExportManager.py:108: savefig(transparent=True) makes the figure
    background transparent; the data area stays opaque)."""
    rgb = apply_colormap(img, name=name, flip_rows=flip_rows)
    if alpha is None:
        a = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    else:
        a = jnp.clip(alpha * 255.0, 0, 255).astype(jnp.uint8)
        if flip_rows:
            a = jnp.flip(a, axis=-3)
        if a.shape[-1] != 1:
            a = a[..., None]
    return jnp.concatenate([rgb, a], axis=-1)
