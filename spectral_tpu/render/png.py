"""PNG encoding.

The reference's export path is matplotlib ``savefig(dpi=3000,
transparent=True)`` (ExportManager.py:108,184), measured at ~12 s and ~2 MB
per figure — the dominant cost of its export workloads (SURVEY.md §6). Here
pixels come straight from the device (colormap gather) and only need PNG
encoding on host. Three backends, fastest available wins:

  1. native C++ encoder (zlib), built from spectral_tpu/native — see
     :mod:`spectral_tpu.native.build`;
  2. PIL (if installed);
  3. pure-Python stdlib-zlib fallback (always available).
"""

from __future__ import annotations

import itertools
import os
import struct
import zlib
from typing import Optional

import numpy as np


_tmp_counter = itertools.count()


def _write_atomic(path: str, data: bytes, fsync: bool = False) -> None:
    """Same-directory temp + os.replace: a process killed mid-export never
    leaves a truncated file that looks like a finished PNG (the 10k-clip
    pipeline writes thousands of these; its per-clip fault isolation can
    only catch raised errors, not a SIGKILL mid-write). The temp name is
    unique per (process, call): encode POOL THREADS handed duplicate clip
    stems would otherwise share one temp file — interleaved writes, then
    FileNotFoundError on the second replace (last-writer-wins, cleanly,
    is the contract for duplicate output paths).

    Durability boundary: without fsync this is atomic against PROCESS
    death only. After a power loss / kernel crash, ext4's delayed
    allocation can commit the rename before the data blocks, leaving an
    empty or partial file under the final name — which a later
    resume/skip-existing run would trust as complete. fsync=True (the
    exporters' durable=True) closes that at ~1.6 ms/file (measured
    ext4), kept opt-in because the export encode budget is ~14-19
    ms/PNG and most interrupted exports are kills, not power cuts."""
    tmp = f"{path}.tmp.{os.getpid()}.{next(_tmp_counter)}"
    try:
        with open(tmp, "wb") as fh:
            fh.write(data)
            if fsync:
                fh.flush()
                os.fsync(fh.fileno())
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise

def clean_stale_tmp(dir_path: str) -> int:
    """Remove ``*.tmp.<pid>.<n>`` residue left by a DEAD process.

    SIGKILL can always land between the temp-file open and the
    ``os.replace`` in :func:`_write_atomic`, so atomicity alone cannot
    promise a residue-free directory — it only promises no truncated
    file ever carries a FINAL name. Export runs call this on their
    output directory so a restart (``resume=True``) also cleans the
    previous run's corpses. Temps whose embedded pid is still alive are
    left alone (a concurrent export into the same directory owns them).
    Liveness is judged with ``os.kill(pid, 0)`` on THIS host, so the
    ownership guarantee is same-host only: on a shared filesystem a
    writer on another host looks dead, and local pid reuse can shield a
    genuinely stale temp. Single-host operation is the supported mode.
    Returns the number of files removed."""
    removed = 0
    try:
        entries = os.listdir(dir_path)
    except OSError:
        return 0
    for name in entries:
        parts = name.rsplit(".tmp.", 1)
        if len(parts) != 2:
            continue
        pid_s = parts[1].split(".", 1)[0]
        # isdigit() alone admits non-ASCII digit codepoints that int()
        # rejects; a hostile filename must be skipped, not crash export.
        # (ASCII + isdigit == only 0-9, so int() below cannot fail.)
        if not (pid_s.isascii() and pid_s.isdigit()):
            continue
        pid = int(pid_s)
        alive = True
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            alive = False
        except PermissionError:
            alive = True    # exists, owned by someone else
        except OSError:
            continue
        if alive and pid != os.getpid():
            continue
        if alive and pid == os.getpid():
            continue        # our own in-flight writes
        try:
            os.unlink(os.path.join(dir_path, name))
            removed += 1
        except OSError:
            pass
    return removed


_native = None
_native_checked = False


def _get_native():
    global _native, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from spectral_tpu.native import png_native
            _native = png_native if png_native.available() else None
        except Exception:
            _native = None
    return _native


def _normalize_array(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr)
    if arr.dtype != np.uint8:
        raise TypeError(f"expected uint8 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError(f"expected (H, W, {{1,3,4}}) image, got {arr.shape}")
    return arr


def _chunk(tag: bytes, payload: bytes) -> bytes:
    """PNG chunk framing: length + tag + payload + CRC32(tag+payload)."""
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png_pure(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Stdlib-only PNG encoder (filter 0 scanlines + one zlib stream)."""
    arr = _normalize_array(arr)
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    chunk = _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8),
                          arr.reshape(h, w * c)], axis=1).tobytes()
    idat = zlib.compress(raw, compress_level)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def encode_png(arr, path: Optional[str] = None, compress_level: int = 6,
               fsync: bool = False) -> Optional[bytes]:
    """Encode uint8 (H, W[, C]) pixels to PNG. Writes to ``path`` if given,
    else returns the bytes. Uses the fastest available backend."""
    arr = _normalize_array(np.asarray(arr))

    native = _get_native()
    if native is not None:
        data = native.encode(arr, compress_level)
    else:
        try:
            import io
            from PIL import Image
            mode = {1: "L", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
            # arr[..., 0], NOT squeeze(): squeeze also collapses an H==1
            # or W==1 axis, breaking single-row/column grayscale images
            img = Image.fromarray(arr[..., 0] if mode == "L" else arr, mode)
            buf = io.BytesIO()
            img.save(buf, format="PNG", compress_level=compress_level)
            data = buf.getvalue()
        except ImportError:
            data = encode_png_pure(arr, compress_level)

    if path is not None:
        _write_atomic(path, data, fsync)
        return None
    return data


def encode_png_palette(indices: np.ndarray, palette: np.ndarray,
                       path: Optional[str] = None,
                       compress_level: int = 6,
                       fsync: bool = False) -> Optional[bytes]:
    """Encode a uint8 (H, W) index image + (N<=256, 3) RGB palette to an
    indexed-color (PLTE) PNG — ~1/3 the deflate input of RGB at identical
    colors; the export fast path for colormapped spectrograms."""
    indices = np.ascontiguousarray(np.asarray(indices), dtype=np.uint8)
    palette = np.ascontiguousarray(np.asarray(palette), dtype=np.uint8)
    if indices.ndim != 2 or palette.ndim != 2 or palette.shape[1] != 3:
        raise ValueError("expected (H, W) indices and (N, 3) palette")
    if palette.shape[0] > 256:
        # 8-bit PLTE caps at 256 entries (768 bytes): the pure-python
        # fallback would silently write an invalid PNG and the native
        # encoder only a bare "code -1"
        raise ValueError(
            f"palette has {palette.shape[0]} entries; PNG PLTE max is 256")

    native = _get_native()
    if native is not None and hasattr(native, "encode_palette"):
        data = native.encode_palette(indices, palette, compress_level)
    else:
        try:
            import io
            from PIL import Image
            img = Image.fromarray(indices, "P")
            img.putpalette(palette.reshape(-1).tolist())
            buf = io.BytesIO()
            img.save(buf, format="PNG", compress_level=compress_level)
            data = buf.getvalue()
        except ImportError:
            data = _encode_png_palette_pure(indices, palette, compress_level)

    if path is not None:
        _write_atomic(path, data, fsync)
        return None
    return data


def _encode_png_palette_pure(indices: np.ndarray, palette: np.ndarray,
                             compress_level: int = 6) -> bytes:
    """Stdlib-only indexed-color PNG (IHDR color type 3 + PLTE + IDAT)."""
    h, w = indices.shape
    chunk = _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    raw = np.concatenate([np.zeros((h, 1), np.uint8), indices],
                         axis=1).tobytes()
    # Z_RLE: measured both ~2.4x faster and smaller than the default
    # strategy on colormap-index scanlines (native/png_encoder.cpp header)
    co = zlib.compressobj(compress_level, zlib.DEFLATED, 15, 8, zlib.Z_RLE)
    idat = co.compress(raw) + co.flush()
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"PLTE", palette.tobytes())
            + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def decode_png(path_or_bytes) -> np.ndarray:
    """Decode a PNG back to a uint8 array (test/round-trip helper)."""
    try:
        import io
        from PIL import Image
        if isinstance(path_or_bytes, (bytes, bytearray)):
            img = Image.open(io.BytesIO(path_or_bytes))
        else:
            img = Image.open(path_or_bytes)
        if img.mode == "P":   # indexed-color: return true pixels
            img = img.convert("RGB")
        return np.asarray(img)
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PNG decoding requires PIL") from e
