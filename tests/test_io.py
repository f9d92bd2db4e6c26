"""IO-layer tests: registry semantics, WAV/NIX/ABF/NPZ loaders."""

import numpy as np
import pytest

from spectral_tpu.io.registry import SweepRegistry, SweepEntry, split_display_name
from spectral_tpu.io import wav as wav_mod
from spectral_tpu.io import nix as nix_mod
from spectral_tpu.io import abf as abf_mod


# ---- registry / get_signal fallback rules (SweepManager.py:151-185) --------

def _entry(**kw):
    base = dict(filepath="f", sweep_idx=0, fs=1000.0, fs_raw=500.0,
                raw=np.arange(5.0), processed=np.arange(3.0))
    base.update(kw)
    return SweepEntry(**base)


def test_get_signal_processed_standard():
    r = SweepRegistry()
    r.register("a_sweep0", _entry())
    sig, fs = r.get_signal("a_sweep0", processed=True)
    assert fs == 1000.0 and len(sig) == 3


def test_get_signal_processed_fallback_to_raw_uses_fs_raw():
    r = SweepRegistry()
    r.register("a_sweep0", _entry(processed=None))
    sig, fs = r.get_signal("a_sweep0", processed=True)
    assert fs == 500.0 and len(sig) == 5


def test_get_signal_raw_uses_fs_raw_with_no_fs_fallback():
    """Raw requests serve fs_raw and NEVER substitute the processed fs: the
    reference's dict-get fallback (SweepManager.py:165,:181) only fires when
    the key is absent, which its loaders never produce — proven by executing
    the reference (test_reference_differential.py::
    test_get_signal_semantics_fuzz_matches_reference)."""
    r = SweepRegistry()
    r.register("a_sweep0", _entry())
    _, fs = r.get_signal("a_sweep0", processed=False)
    assert fs == 500.0
    r.register("b_sweep0", _entry(fs_raw=None))
    with pytest.raises(KeyError, match="No sampling rate for raw"):
        r.get_signal("b_sweep0", processed=False)


def test_get_signal_missing_raises():
    r = SweepRegistry()
    with pytest.raises(KeyError, match="not found"):
        r.get_signal("nope")
    r.register("x", _entry(raw=None, processed=None))
    with pytest.raises(KeyError, match="No 'processed' or 'raw'"):
        r.get_signal("x", processed=True)
    with pytest.raises(KeyError, match="No 'raw'"):
        r.get_signal("x", processed=False)


def test_register_combined():
    r = SweepRegistry()
    r.register("a_sweep0", _entry(raw=np.ones(4), processed=np.ones(4) * 2,
                                  fs=100.0, fs_raw=100.0))
    r.register("a_sweep1", _entry(raw=np.ones(6), processed=np.ones(6) * 2,
                                  fs=100.0, fs_raw=100.0))
    name = r.register_combined(["a_sweep0", "a_sweep1"])
    assert name == "combine0"
    # BOTH streams are combined (GUI.py:248-266): raw holds the raw
    # concatenation, processed the processed one
    sig, fs = r.get_signal(name, processed=True)
    assert len(sig) == 10 and fs == 100.0 and (sig == 2).all()
    sig_raw, fs_raw = r.get_signal(name, processed=False)
    assert len(sig_raw) == 10 and fs_raw == 100.0 and (sig_raw == 1).all()
    assert r.data[name].sweep_idx == -1  # GUI.py:262
    # mixed rates rejected (GUI.py:416-418 semantics)
    r.register("b_sweep0", _entry(fs=200.0, fs_raw=200.0))
    with pytest.raises(ValueError, match="Mixed sampling rates"):
        r.register_combined(["a_sweep0", "b_sweep0"])


def test_split_display_name():
    assert split_display_name("rec_sweep12") == ("rec", "12")
    assert split_display_name("plain") == ("plain", None)


def test_unsupported_extension():
    with pytest.raises(ValueError, match="Unsupported file type"):
        SweepRegistry().load_file("x.xyz")


# ---- WAV -------------------------------------------------------------------

def test_wav_roundtrip_mono(tmp_path):
    fs = 16000.0
    x = (np.sin(2 * np.pi * 440 * np.arange(1600) / fs) * 0.5).astype(np.float32)
    p = str(tmp_path / "t.wav")
    wav_mod.write_wav(p, x, fs)
    y, fs2 = wav_mod.read_wav(p)
    assert fs2 == fs and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_wav_stereo_registers_two_sweeps(tmp_path):
    fs = 8000.0
    x = np.stack([np.ones(100) * 0.25, -np.ones(100) * 0.25], axis=1)
    p = str(tmp_path / "st.wav")
    wav_mod.write_wav(p, x, fs)
    r = SweepRegistry()
    names = r.load_file(p)
    assert names == ["st_sweep0", "st_sweep1"]
    s0, f0 = r.get_signal("st_sweep0")
    s1, _ = r.get_signal("st_sweep1")
    assert f0 == fs
    np.testing.assert_allclose(s0, 0.25, atol=1e-3)
    np.testing.assert_allclose(s1, -0.25, atol=1e-3)


def test_wav_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.wav")
    with open(p, "wb") as fh:
        fh.write(b"not a wav file at all")
    with pytest.raises(ValueError, match="not a RIFF"):
        wav_mod.read_wav(p)


# ---- NIX HDF5 --------------------------------------------------------------

def test_nix_roundtrip_name_matching(tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "rec.h5")
    segs = [
        {"raw_ch0": np.arange(10.0), "proc_ch0": np.arange(10.0) * 2},
        {"only_raw": np.ones(5)},          # 'raw' in name -> raw, cross-fill
        {"mystery": np.ones(7) * 3},        # no raw/proc -> first as processed
    ]
    nix_mod.write_nix_fixture(p, segs, fs=250.0)
    r = SweepRegistry()
    names = r.load_file(p)
    assert names == ["rec_sweep0", "rec_sweep1", "rec_sweep2"]

    sig, fs = r.get_signal("rec_sweep0", processed=True)
    assert fs == 250.0
    np.testing.assert_array_equal(sig, np.arange(10.0) * 2)
    sig, _ = r.get_signal("rec_sweep0", processed=False)
    np.testing.assert_array_equal(sig, np.arange(10.0))

    # sweep1: raw-only -> processed cross-filled from raw
    sig, _ = r.get_signal("rec_sweep1", processed=True)
    np.testing.assert_array_equal(sig, np.ones(5))

    # sweep2: fallback signal registered as processed AND raw
    sig, _ = r.get_signal("rec_sweep2", processed=False)
    np.testing.assert_array_equal(sig, np.ones(7) * 3)


def test_generic_h5_fallback(tmp_path):
    h5py = pytest.importorskip("h5py")
    p = str(tmp_path / "plain.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("session1")
        d = g.create_dataset("raw_lfp", data=np.arange(20.0))
        d.attrs["fs"] = 2000.0
    r = SweepRegistry()
    names = r.load_file(p)
    assert len(names) == 1
    sig, fs = r.get_signal(names[0])
    assert fs == 2000.0 and len(sig) == 20


# ---- ABF -------------------------------------------------------------------

def test_abf2_fixture_roundtrip(tmp_path):
    fs = 10000.0
    rng = np.random.RandomState(0)
    sweeps = rng.randn(3, 1000) * 2.0
    p = str(tmp_path / "rec.abf")
    abf_mod.write_abf2_fixture(p, sweeps, fs)

    info = abf_mod.AbfInfo(p)
    assert info.n_sweeps == 3 and info.n_channels == 1
    np.testing.assert_allclose(info.data_rate, fs, rtol=1e-6)
    for i in range(3):
        np.testing.assert_allclose(info.sweep(i, 0), sweeps[i], atol=1e-3)


def test_abf_loader_channel_heuristic(tmp_path):
    # channel 0 all zero, channel 1 carries signal -> loader picks channel 1
    fs = 5000.0
    n = 500
    sig = np.sin(np.linspace(0, 10, n))
    inter = np.zeros((1, 2 * n))
    inter[0, 1::2] = sig  # interleaved: ch0 zero, ch1 = sig
    p = str(tmp_path / "two.abf")
    abf_mod.write_abf2_fixture(p, inter, fs, n_channels=2)

    r = SweepRegistry()
    names = r.load_file(p)
    assert names == ["two_sweep0"]
    out, fs2 = r.get_signal("two_sweep0")
    np.testing.assert_allclose(fs2, fs, rtol=1e-6)
    np.testing.assert_allclose(out, sig, atol=1e-3)


def test_abf_rejects_non_abf(tmp_path):
    p = str(tmp_path / "no.abf")
    with open(p, "wb") as fh:
        fh.write(b"JUNKJUNKJUNK" * 100)
    with pytest.raises(ValueError, match="not an ABF"):
        abf_mod.AbfInfo(p)


# ---- NPZ -------------------------------------------------------------------

def test_npz_loader(tmp_path):
    p = str(tmp_path / "d.npz")
    np.savez(p, raw=np.ones((2, 50)), processed=np.zeros((2, 50)), fs=123.0)
    r = SweepRegistry()
    names = r.load_file(p)
    assert names == ["d_sweep0", "d_sweep1"]
    sig, fs = r.get_signal("d_sweep1", processed=True)
    assert fs == 123.0 and (sig == 0).all()


def test_npz_requires_fs(tmp_path):
    p = str(tmp_path / "nofs.npz")
    np.savez(p, raw=np.ones(10))
    with pytest.raises(ValueError, match="'fs'"):
        SweepRegistry().load_file(p)


def test_nix_segments_natural_order(tmp_path):
    """h5py iterates lexicographically, so seg10 used to load as sweep2:
    with >= 10 segments every sweep past index 1 was silently registered
    under the wrong display name."""
    from spectral_tpu.io.nix import write_nix_fixture, load_nix_h5
    from spectral_tpu.io.registry import SweepRegistry
    p = str(tmp_path / "many.h5")
    # segment i's signal is constant i
    write_nix_fixture(p, [{"raw": np.full(100, float(i), np.float32)}
                          for i in range(12)])
    reg = SweepRegistry()
    names = load_nix_h5(p, reg)
    assert len(names) == 12
    for i in range(12):
        assert float(reg.data[f"many_sweep{i}"].raw[0]) == float(i)


def test_nix_empty_segments_fall_through_to_generic(tmp_path):
    """A NIX-shaped tree whose members are plain datasets yields empty
    segment lists; the generic collector must still run."""
    import h5py
    from spectral_tpu.io.nix import load_nix_h5
    from spectral_tpu.io.registry import SweepRegistry
    p = str(tmp_path / "odd.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("data/b0/groups/s0/data_arrays")
        g.create_dataset("sig", data=np.arange(64, dtype=np.float32))
        g["sig"].attrs["fs"] = 500.0
    reg = SweepRegistry()
    names = load_nix_h5(p, reg)
    assert len(names) == 1
    e = reg.data[names[0]]
    assert e.fs == 500.0 and len(e.processed) == 64


def test_npz_rejects_3d_arrays(tmp_path):
    from spectral_tpu.io.registry import SweepRegistry
    p = str(tmp_path / "bad.npz")
    np.savez(p, raw=np.zeros((2, 3, 100), np.float32), fs=1000.0)
    reg = SweepRegistry()
    with pytest.raises(ValueError, match="1-D or"):
        reg.load_file(p)
    assert not reg.data  # nothing partially registered


def test_png_palette_caps_at_256(tmp_path):
    from spectral_tpu.render.png import encode_png_palette
    idx = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="256"):
        encode_png_palette(idx, np.zeros((300, 3), np.uint8),
                           str(tmp_path / "x.png"))


def test_wav_empty_data_chunk_with_trailing_metadata(tmp_path):
    """A legitimately empty data chunk (sz=0) followed by metadata chunks
    must yield an EMPTY signal, not the metadata decoded as PCM; a sz=0
    placeholder followed by raw audio still reads to EOF."""
    import struct
    from spectral_tpu.io.wav import read_wav
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 2000, 2, 16)
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOhello "
    payload = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", 0)
               + lst)
    p = tmp_path / "empty_data.wav"
    p.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WAVE"
                  + payload)
    x, fs = read_wav(str(p))
    assert fs == 1000.0 and x.size == 0


def test_wav_odd_sized_chunk_word_alignment(tmp_path):
    """RIFF chunks are word-aligned: an odd-sized chunk is followed by a
    pad byte that is NOT part of the next chunk header. A WAV with an
    odd-length LIST chunk before fmt/data must parse identically in both
    the full reader and the header-only wav_info (losing the pad skip
    shifts the walk by one byte and fabricates garbage chunk tags)."""
    import struct
    fs = 8000.0
    x = (np.sin(0.05 * np.arange(1000)) * 0.5).astype(np.float64)
    pcm = (np.clip(x, -1, 1) * 32767.0).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, int(fs), int(fs) * 2, 2, 16)
    junk = b"junkbyte5"                      # 9 bytes -> odd, pad follows
    body = (struct.pack("<4sI", b"LIST", len(junk)) + junk + b"\x00"
            + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
            + struct.pack("<4sI", b"data", len(pcm)) + pcm)
    p = str(tmp_path / "odd.wav")
    with open(p, "wb") as fh:
        fh.write(struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE")
                 + body)
    afmt, n_ch, got_fs, bits = wav_mod.wav_info(p)
    assert (afmt, n_ch, got_fs, bits) == (1, 1, fs, 16)
    y, fs2 = wav_mod.read_wav(p)
    assert fs2 == fs and y.shape == (1000,)
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_abf2_event_fixture_roundtrip(tmp_path):
    """nOperationMode=1 (event-driven variable-length): the SynchArray
    section segments the data section into per-event sweeps — the r3
    scope gap (SweepManager.py:21-58 loads these via pyabf)."""
    import spectral_tpu.io.abf as abf_mod
    fs = 20000.0
    rng = np.random.RandomState(7)
    events = [rng.randn(n).astype(np.float64) for n in (300, 1200, 64)]
    p = str(tmp_path / "events.abf")
    abf_mod.write_abf2_event_fixture(p, events, fs)

    abf = abf_mod.AbfInfo(p)
    assert abf.operation_mode == 1
    assert abf.n_sweeps == 3
    assert abf.data_rate == pytest.approx(fs, rel=1e-6)
    for i, e in enumerate(events):
        got = abf.sweep(i, 0)
        assert got.shape == e.shape, i
        np.testing.assert_allclose(got, e, atol=2e-3 * np.abs(e).max())
    # start times: fSynchTimeUnit=0 -> lStart is in multiplexed samples
    assert abf.sweep_start_seconds(0) == pytest.approx(0.0)
    assert abf.sweep_start_seconds(1) == pytest.approx((300 + 100) / fs)
    # uniform-mode files report no event start times
    p2 = str(tmp_path / "epi.abf")
    abf_mod.write_abf2_fixture(p2, rng.randn(2, 50), fs)
    assert abf_mod.AbfInfo(p2).sweep_start_seconds(0) is None


def test_abf2_event_fixture_registers_variable_sweeps(tmp_path):
    import spectral_tpu.io.abf as abf_mod
    from spectral_tpu.io.registry import SweepRegistry
    events = [np.sin(np.linspace(0, 5, n)) for n in (500, 200)]
    p = str(tmp_path / "ev.abf")
    abf_mod.write_abf2_event_fixture(p, events, 10000.0)
    reg = SweepRegistry()
    names = abf_mod.load_abf(p, reg)
    assert names == ["ev_sweep0", "ev_sweep1"]
    for name, e in zip(names, events):
        sig, fs = reg.get_signal(name, processed=False)
        assert fs == pytest.approx(10000.0)
        assert sig.shape == e.shape
    # the absolute event start times ride into the registry (pyabf users
    # get them as sweep offsets; uniform modes stay None)
    assert reg.data["ev_sweep0"].start_seconds == pytest.approx(0.0)
    assert reg.data["ev_sweep1"].start_seconds == pytest.approx(
        (500 + 100) / 10000.0)
    p2 = str(tmp_path / "epi.abf")
    abf_mod.write_abf2_fixture(p2, np.random.RandomState(0).randn(2, 50),
                               10000.0)
    reg2 = SweepRegistry()
    for n2 in abf_mod.load_abf(p2, reg2):
        assert reg2.data[n2].start_seconds is None
