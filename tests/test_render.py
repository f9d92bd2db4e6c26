"""Render-layer tests: LUT pixel parity vs matplotlib, colormap gather,
PNG round trips (all three encoders), waveform rasterizer."""

import numpy as np
import pytest
import jax.numpy as jnp

from spectral_tpu.render.lut import get_lut, get_lut_f32, available_colormaps
from spectral_tpu.render import png as png_mod
from spectral_tpu.render.waveform import waveform_image, waveform_rgba
from spectral_tpu.ops.colormap import apply_colormap, apply_colormap_rgba


# ---- LUT parity (SURVEY.md §7 hard-part 5) ---------------------------------

def test_jet_lut_matches_matplotlib_bytes():
    matplotlib = pytest.importorskip("matplotlib")
    ref = matplotlib.colormaps["jet"](np.linspace(0, 1, 256), bytes=True)
    lut = get_lut("jet")
    np.testing.assert_array_equal(lut, ref[:, :3])


def test_gray_and_hot_luts_match_matplotlib():
    matplotlib = pytest.importorskip("matplotlib")
    for name in ("gray", "hot"):
        ref = matplotlib.colormaps[name](np.linspace(0, 1, 256), bytes=True)
        np.testing.assert_array_equal(get_lut(name), ref[:, :3])


def test_unknown_colormap_raises():
    with pytest.raises(ValueError, match="unknown colormap"):
        get_lut("plasma9000")
    assert "jet" in available_colormaps()


def test_lut_f32_range():
    lut = get_lut_f32("jet")
    assert lut.dtype == np.float32
    assert lut.min() >= 0.0 and lut.max() <= 1.0


# ---- colormap gather -------------------------------------------------------

def test_apply_colormap_index_mapping_matches_matplotlib():
    matplotlib = pytest.importorskip("matplotlib")
    jet = matplotlib.colormaps["jet"]
    img = np.linspace(0, 1, 101).reshape(1, 101).astype(np.float32)
    ref = jet(img, bytes=True)[..., :3]
    ours = np.asarray(apply_colormap(jnp.asarray(img)))
    np.testing.assert_array_equal(ours, ref)


def test_apply_colormap_shapes_and_flip():
    img = jnp.asarray(np.random.RandomState(0).rand(8, 5).astype(np.float32))
    rgb = np.asarray(apply_colormap(img))
    assert rgb.shape == (8, 5, 3) and rgb.dtype == np.uint8
    flipped = np.asarray(apply_colormap(img, flip_rows=True))
    np.testing.assert_array_equal(flipped, rgb[::-1])
    # batched
    b = jnp.stack([img, img])
    rgbb = np.asarray(apply_colormap(b))
    assert rgbb.shape == (2, 8, 5, 3)


def test_apply_colormap_rgba_alpha():
    img = jnp.zeros((4, 4), jnp.float32)
    rgba = np.asarray(apply_colormap_rgba(img))
    assert rgba.shape == (4, 4, 4)
    np.testing.assert_array_equal(rgba[..., 3], 255)
    alpha = jnp.zeros((4, 4), jnp.float32)
    rgba = np.asarray(apply_colormap_rgba(img, alpha=alpha))
    np.testing.assert_array_equal(rgba[..., 3], 0)


# ---- PNG encoders ----------------------------------------------------------

def _rand_img(h, w, c, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_pure_png_roundtrip(c):
    img = _rand_img(33, 47, c)
    data = png_mod.encode_png_pure(img)
    out = png_mod.decode_png(data)
    np.testing.assert_array_equal(out.reshape(img.shape), img)


def test_default_encoder_roundtrip_and_file(tmp_path):
    img = _rand_img(20, 30, 3, seed=1)
    p = str(tmp_path / "x.png")
    assert png_mod.encode_png(img, path=p) is None
    np.testing.assert_array_equal(png_mod.decode_png(p), img)
    data = png_mod.encode_png(img)
    np.testing.assert_array_equal(png_mod.decode_png(data), img)


def test_native_encoder_if_buildable():
    from spectral_tpu.native import png_native
    if not png_native.available():
        pytest.skip("no C++ toolchain available")
    for c in (1, 3, 4):
        img = _rand_img(25, 31, c, seed=c)
        for level in (1, 6, 9):
            data = png_native.encode(img, level)
            out = png_mod.decode_png(data)
            np.testing.assert_array_equal(out.reshape(img.shape), img)


def test_encode_rejects_bad_input():
    with pytest.raises(TypeError):
        png_mod.encode_png(np.zeros((4, 4), np.float32))
    with pytest.raises(ValueError):
        png_mod.encode_png(np.zeros((4, 4, 2), np.uint8))


# ---- waveform rasterizer ---------------------------------------------------

def test_waveform_line_positions():
    # constant zero -> horizontal line through the vertical center
    x = jnp.zeros(1000, jnp.float32)
    mask = np.asarray(waveform_image(x, height=100, width=50, y_limit=1.0))
    assert mask.shape == (100, 50)
    rows = np.where(mask.any(axis=1))[0]
    assert set(rows) <= {49, 50}
    assert mask[rows[0]].all()  # line spans every column


def test_waveform_amplitude_scaling():
    # full-scale square wave with the shared y-limit reaches top/bottom rows
    x = jnp.asarray(np.tile([1.0, -1.0], 500).astype(np.float32))
    mask = np.asarray(waveform_image(x, height=100, width=50, y_limit=1.0))
    assert mask[0].any() and mask[-1].any()
    # halving the amplitude under the same limit halves the extent
    mask2 = np.asarray(waveform_image(x * 0.5, height=100, width=50, y_limit=1.0))
    rows2 = np.where(mask2.any(axis=1))[0]
    assert rows2.min() >= 24 and rows2.max() <= 75


def test_waveform_fixed_window_leaves_tail_empty():
    # reference hardcodes a 0-300 s x-window; short signals leave blank cols
    x = jnp.ones(100, jnp.float32)
    mask = np.asarray(waveform_image(x, height=10, width=50, y_limit=1.0,
                                     n_samples_visible=200))
    assert mask[:, :25].any()
    assert not mask[:, 26:].any()


def test_waveform_rgba_transparency():
    x = jnp.zeros(100, jnp.float32)
    img = np.asarray(waveform_rgba(x, height=20, width=20, y_limit=1.0))
    assert img.shape == (20, 20, 4)
    line = img[..., 3] == 255
    assert line.any()
    np.testing.assert_array_equal(img[line][:, :3], 0)  # black line
    assert (img[~line][:, 3] == 0).all()                # transparent bg


def test_waveform_batched():
    xs = jnp.asarray(np.random.RandomState(0).randn(3, 500).astype(np.float32))
    masks = np.asarray(waveform_image(xs, height=40, width=30))
    assert masks.shape == (3, 40, 30)


def test_packed_colormap_matches_rgba():
    from spectral_tpu.ops.colormap import apply_colormap_packed, unpack_rgba
    img = jnp.asarray(np.random.RandomState(3).rand(16, 9).astype(np.float32))
    rgba_ref = np.asarray(apply_colormap_rgba(img))
    packed = np.asarray(apply_colormap_packed(img))
    assert packed.dtype == np.uint32
    out = unpack_rgba(packed)
    np.testing.assert_array_equal(out, rgba_ref)
    # flip parity too
    packed_f = np.asarray(apply_colormap_packed(img, flip_rows=True))
    np.testing.assert_array_equal(unpack_rgba(packed_f),
                                  np.asarray(apply_colormap_rgba(img, flip_rows=True)))


def test_arith_colormap_byte_exact_all_indices():
    from spectral_tpu.ops.colormap import apply_colormap_packed, _hinge_coeffs
    # one pixel per possible LUT index
    img = jnp.asarray((np.arange(256) / 256.0 + 1 / 512.0)
                      .astype(np.float32).reshape(16, 16))
    for name in ("jet", "gray", "hot"):
        assert _hinge_coeffs(name) is not None, name
        pa = np.asarray(apply_colormap_packed(img, name, method="arith"))
        pg = np.asarray(apply_colormap_packed(img, name, method="gather"))
        np.testing.assert_array_equal(pa, pg)
    # boundary values
    for v in (0.0, 1.0, 0.999999, 1e-9):
        x = jnp.full((4, 4), v, jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(apply_colormap_packed(x, "jet", method="arith")),
            np.asarray(apply_colormap_packed(x, "jet", method="gather")))


def test_arith_colormap_rejects_unknown_method():
    from spectral_tpu.ops.colormap import apply_colormap_packed
    img = jnp.zeros((2, 2), jnp.float32)
    # method='arith' on a verified map works; auto is default elsewhere
    apply_colormap_packed(img, "jet", method="arith")
    # a typo'd method must raise, not silently fall through to 'gather'
    with pytest.raises(ValueError, match="unknown colormap method"):
        apply_colormap_packed(img, "jet", method="airth")


# ---- indexed-color (palette) export path -----------------------------------

def test_index_packed_roundtrip_and_palette_equals_rgb():
    from spectral_tpu.ops.colormap import (apply_colormap_packed,
                                           colormap_index_packed,
                                           unpack_indices, unpack_rgba)
    from spectral_tpu.render.lut import get_lut
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(33, 53).astype(np.float32))  # W % 4 != 0
    packed_idx = colormap_index_packed(img, flip_rows=True)
    assert packed_idx.shape == (33, 14) and packed_idx.dtype == jnp.uint32
    idx = unpack_indices(np.asarray(packed_idx), width=53)
    assert idx.shape == (33, 53) and idx.dtype == np.uint8
    # palette lookup == the RGB pixels the arithmetic colormap produces
    rgb_ref = unpack_rgba(np.asarray(
        apply_colormap_packed(img, "jet", flip_rows=True)))[..., :3]
    np.testing.assert_array_equal(get_lut("jet")[idx], rgb_ref)


def test_encode_png_palette_roundtrip():
    from spectral_tpu.render.lut import get_lut
    from spectral_tpu.render.png import (decode_png, encode_png_palette,
                                         _encode_png_palette_pure)
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 256, size=(40, 30), dtype=np.uint8)
    pal = get_lut("jet")
    data = encode_png_palette(idx, pal, compress_level=4)
    rgb = decode_png(data)                     # 'P' auto-converts to RGB
    np.testing.assert_array_equal(rgb, pal[idx])
    # stdlib fallback produces an equally decodable file
    rgb2 = decode_png(_encode_png_palette_pure(idx, pal))
    np.testing.assert_array_equal(rgb2, pal[idx])


def test_native_palette_encoder_if_buildable():
    from spectral_tpu.native import png_native
    if not png_native.available():
        import pytest
        pytest.skip("native encoder not buildable here")
    from spectral_tpu.render.lut import get_lut
    from spectral_tpu.render.png import decode_png
    idx = np.random.RandomState(2).randint(0, 256, (25, 31), np.uint8)
    pal = get_lut("hot")
    data = png_native.encode_palette(idx, pal, compress_level=1)
    np.testing.assert_array_equal(decode_png(data), pal[idx])


def test_colormap_rgba_2d_alpha_with_flip():
    """A 2-D (H, W) alpha mask must work with flip_rows=True (regression:
    the flip ran before the channel axis existed and raised on axis -3)."""
    from spectral_tpu.ops.colormap import apply_colormap_rgba
    img = jnp.asarray(np.random.RandomState(0).rand(6, 5).astype(np.float32))
    alpha = jnp.asarray((np.arange(6)[:, None] >= 3).astype(np.float32)
                        * np.ones((6, 5), np.float32))
    out_f = np.asarray(apply_colormap_rgba(img, alpha=alpha, flip_rows=True))
    out_n = np.asarray(apply_colormap_rgba(img, alpha=alpha, flip_rows=False))
    assert out_f.shape == out_n.shape == (6, 5, 4)
    # the alpha plane flips with the rows
    np.testing.assert_array_equal(out_f[..., 3], out_n[::-1, :, 3])
    np.testing.assert_array_equal(out_f[..., :3], out_n[::-1, :, :3])


def test_encode_png_single_row_grayscale(tmp_path):
    """H==1 / W==1 grayscale images encode on every backend (regression:
    the PIL fallback's squeeze() collapsed the spatial axis too)."""
    from spectral_tpu.render.png import decode_png, encode_png
    for shape in ((1, 7, 1), (7, 1, 1)):
        arr = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape)
        data = encode_png(arr)
        back = np.asarray(decode_png(data))   # grayscale decodes as (H, W)
        np.testing.assert_array_equal(back.reshape(shape), arr)


def test_lut_cache_is_immutable_and_f32_validates():
    from spectral_tpu.render.lut import get_lut, get_lut_f32
    lut = get_lut("jet")
    assert not lut.flags.writeable        # shared cache must be frozen
    with pytest.raises(ValueError):
        lut[0, 0] = 7
    with pytest.raises(ValueError, match="unknown colormap"):
        get_lut_f32("plasma9000")
    assert not get_lut_f32("jet").flags.writeable


def test_waveform_window_is_hard_cut():
    """Samples past n_samples_visible must not leak into the final columns
    when width does not divide the window (the reference's xlim is hard)."""
    import numpy as np
    import jax.numpy as jnp
    from spectral_tpu.render.waveform import waveform_image
    x = np.zeros(2000, np.float32)
    x[1005] = 1.0                      # just past the 1000-sample window
    m = np.asarray(waveform_image(jnp.asarray(x), height=100, width=300,
                                  y_limit=1.0, n_samples_visible=1000))
    # the spike would light pixels near the top; a zero signal lights only
    # the center line
    assert not m[:40, :].any()


def test_encoder_fallback_tiers_pixel_identical(monkeypatch, tmp_path):
    """Coverage-lens gap (tools/covlite.py): the PIL and pure-python
    fallback tiers of encode_png / encode_png_palette never run where the
    native encoder exists. Force each tier and require decoded pixels
    identical to the native encoding on every layout."""
    import importlib
    import sys

    from spectral_tpu.render import png as png_mod

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (5, 7), np.uint8)
    rgb = rng.integers(0, 256, (5, 7, 3), np.uint8)
    rgba = rng.integers(0, 256, (5, 7, 4), np.uint8)
    idx = rng.integers(0, 256, (6, 9), np.uint8)
    pal = rng.integers(0, 256, (256, 3), np.uint8)

    def all_encoded():
        out = [png_mod.encode_png(arr) for arr in (gray, rgb, rgba)]
        out.append(png_mod.encode_png_palette(idx, pal))
        return out

    assert png_mod._get_native() is not None  # the env has the C++ encoder
    native_bytes = all_encoded()

    # tier 2: no native encoder -> PIL
    monkeypatch.setattr(png_mod, "_get_native", lambda: None)
    pil_bytes = all_encoded()
    # tier 3: no PIL either -> pure-python zlib (encode only; decoding
    # legitimately requires PIL, so decode after restoring imports)
    real_import = __import__

    def no_pil(name, *a, **k):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError("forced for fallback test")
        return real_import(name, *a, **k)
    monkeypatch.setattr("builtins.__import__", no_pil)
    pure_bytes = all_encoded()
    monkeypatch.setattr("builtins.__import__", real_import)

    for nat, pil, pure in zip(native_bytes, pil_bytes, pure_bytes):
        np.testing.assert_array_equal(png_mod.decode_png(nat),
                                      png_mod.decode_png(pil))
        np.testing.assert_array_equal(png_mod.decode_png(nat),
                                      png_mod.decode_png(pure))

    # the path= form writes the same bytes it would return
    p = tmp_path / "x.png"
    assert png_mod.encode_png(rgb, str(p)) is None
    np.testing.assert_array_equal(png_mod.decode_png(str(p)),
                                  png_mod.decode_png(png_mod.encode_png(rgb)))


def test_png_writes_are_atomic(tmp_path, monkeypatch):
    """File writes go through same-dir temp + os.replace: no .tmp residue
    on success, and a failure mid-write leaves NO file at the target path
    (a killed 10k-clip export must not leave truncated 'finished' PNGs)."""
    import os
    from spectral_tpu.render import png as png_mod
    arr = np.zeros((4, 5, 3), np.uint8)
    p = tmp_path / "ok.png"
    png_mod.encode_png(arr, str(p))
    assert p.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]

    idx = np.zeros((4, 5), np.uint8)
    pal = np.zeros((2, 3), np.uint8)
    p2 = tmp_path / "pal.png"
    png_mod.encode_png_palette(idx, pal, str(p2))
    assert p2.exists()
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]

    # failure injection: replace raises -> target absent, temp cleaned up
    def boom(src, dst):
        raise OSError("disk full")
    monkeypatch.setattr(png_mod.os, "replace", boom)
    p3 = tmp_path / "fail.png"
    with pytest.raises(OSError, match="disk full"):
        png_mod.encode_png(arr, str(p3))
    assert not p3.exists()
    assert not [f for f in os.listdir(tmp_path) if ".tmp." in f]


def test_clean_stale_tmp_sweeps_dead_pids_only(tmp_path):
    """clean_stale_tmp removes .tmp.<pid>.<n> residue whose pid is dead
    (SIGKILL corpses), leaves live-pid temps (a concurrent export owns
    them), our own pid's temps (in-flight writes), non-temp files, and
    malformed names alone."""
    import os
    import subprocess
    import sys as _sys
    from spectral_tpu.render import png as png_mod
    # a genuinely dead pid: spawn-and-wait a trivial child
    proc = subprocess.Popen([_sys.executable, "-c", "pass"])
    proc.wait()
    dead_pid = proc.pid
    (tmp_path / f"a.png.tmp.{dead_pid}.3").write_bytes(b"x")
    (tmp_path / f"b.png.tmp.{os.getpid()}.1").write_bytes(b"x")   # ours
    (tmp_path / "c.png").write_bytes(b"x")                        # final
    (tmp_path / "d.png.tmp.notanum.2").write_bytes(b"x")          # malformed
    # non-ASCII digit codepoints: str.isdigit() True but int() raises —
    # must be skipped, not crash the sweep (advisor finding r3)
    (tmp_path / "e.png.tmp.².1").write_bytes(b"x")           # superscript 2
    (tmp_path / "f.png.tmp.١٢.1").write_bytes(b"x")     # Arabic-Indic 12
    removed = png_mod.clean_stale_tmp(str(tmp_path))
    assert removed == 1
    left = sorted(os.listdir(tmp_path))
    assert f"a.png.tmp.{dead_pid}.3" not in left
    assert f"b.png.tmp.{os.getpid()}.1" in left
    assert "c.png" in left and "d.png.tmp.notanum.2" in left
    assert "e.png.tmp.².1" in left and "f.png.tmp.١٢.1" in left
    # missing directory: a no-op, not an error
    assert png_mod.clean_stale_tmp(str(tmp_path / "nope")) == 0


def test_export_pipeline_sweeps_stale_tmp(tmp_path):
    """export_spectrograms sweeps dead-pid temp residue from a previous
    killed run before writing (stats.tmp_cleaned), so resume directories
    end clean."""
    import subprocess
    import sys as _sys
    from spectral_tpu.parallel.pipeline import export_spectrograms
    from spectral_tpu.config import SpecConfig
    out = tmp_path / "specs"
    out.mkdir()
    proc = subprocess.Popen([_sys.executable, "-c", "pass"])
    proc.wait()
    (out / f"x.png.tmp.{proc.pid}.0").write_bytes(b"junk")
    fs = 4000.0
    clips = [("x", np.random.default_rng(0)
              .standard_normal(int(fs)).astype(np.float32))]
    cfg = SpecConfig(nperseg=256, hop=64)
    stats = export_spectrograms(iter(clips), fs, cfg, str(out),
                                clip_samples=int(fs), batch=1)
    assert stats.tmp_cleaned == 1
    files = sorted(f.name for f in out.iterdir())
    assert files == ["x.png"]


def test_concurrent_writes_to_same_path_are_safe():
    """Duplicate clip stems make encode-pool threads race on ONE output
    path; each write must use a unique temp so the survivor is a VALID
    PNG (itertools.count suffix) and no thread raises."""
    import concurrent.futures as cf
    import os
    import tempfile
    from spectral_tpu.render import png as png_mod
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/same.png"
        arrs = [np.full((16, 16, 3), v, np.uint8) for v in range(32)]
        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(lambda a: png_mod.encode_png(a, path), arrs))
        data = open(path, "rb").read()
        assert data[:8] == b"\x89PNG\r\n\x1a\n" and data[-8:-4] == b"IEND"
        assert not [f for f in os.listdir(d) if ".tmp." in f]


def test_fsync_write_is_identical_and_decodable(tmp_path):
    """durable/fsync changes WHEN bytes are durable, never WHAT is
    written: byte-identical output, and the flag plumbs through both
    encode entry points and the export pipeline's --durable knob."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    a, b = tmp_path / "plain.png", tmp_path / "sync.png"
    png_mod.encode_png_palette(img, pal, str(a))
    png_mod.encode_png_palette(img, pal, str(b), fsync=True)
    assert a.read_bytes() == b.read_bytes()
    rgb = np.stack([img] * 3, axis=-1)
    c, d = tmp_path / "plain_rgb.png", tmp_path / "sync_rgb.png"
    png_mod.encode_png(rgb, str(c))
    png_mod.encode_png(rgb, str(d), fsync=True)
    assert c.read_bytes() == d.read_bytes()
