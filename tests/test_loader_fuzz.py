"""Loader robustness fuzz: corrupted/truncated files must either load
validly or raise ValueError — never crash with a foreign exception type
(IndexError/struct.error/OverflowError...) or silently return garbage.

The loaders are the framework's untrusted-input boundary (the reference
delegates to pyabf/neo, which harden this for it; our pure-Python
parsers must enforce it themselves)."""

import os
import struct

# soak knobs (same contract as test_reference_differential): scale trial
# counts and shift every RNG for out-of-suite robustness soaks.
FUZZ_SCALE = int(os.environ.get("SPECTRAL_TPU_FUZZ_TRIALS", "0")) or 1
FUZZ_SEED = int(os.environ.get("SPECTRAL_TPU_FUZZ_SEED", "0"))

import numpy as np
import pytest

from spectral_tpu.io.registry import SweepRegistry
from spectral_tpu.io.wav import read_wav, write_wav, wav_info


def _fuzz_load(loader, path, n_ok):
    try:
        loader(path)
        n_ok[0] += 1
    except ValueError:
        pass  # the contract: clean rejection


def test_wav_truncation_ladder(tmp_path):
    """Every truncation length of a valid WAV either loads or raises
    ValueError."""
    p = tmp_path / "w.wav"
    write_wav(str(p), np.sin(np.arange(400) * 0.1).astype(np.float32), 1000.0)
    good = p.read_bytes()
    n_ok = [0]
    for cut in range(0, len(good), 7):
        q = tmp_path / "cut.wav"
        q.write_bytes(good[:cut])
        _fuzz_load(read_wav, str(q), n_ok)
        _fuzz_load(wav_info, str(q), n_ok)


def test_wav_random_byte_corruption(tmp_path):
    p = tmp_path / "w.wav"
    write_wav(str(p), np.sin(np.arange(400) * 0.1).astype(np.float32), 1000.0)
    good = bytearray(p.read_bytes())
    rng = np.random.RandomState(0 + FUZZ_SEED)
    n_ok = [0]
    for trial in range(300 * FUZZ_SCALE):
        buf = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        q = tmp_path / "fz.wav"
        q.write_bytes(bytes(buf))
        _fuzz_load(read_wav, str(q), n_ok)
    assert n_ok[0] > 0  # plenty of corruptions leave the file readable


def test_abf_truncation_and_corruption(tmp_path):
    from spectral_tpu.io import abf as abf_mod
    # build a minimal valid ABF1 fixture via the test helper if present,
    # else via the byte-level layout used in test_io_bytelevel
    import tests.test_io_bytelevel as bl
    maker = getattr(bl, "_abf1_bytes", None)
    if maker is None:
        pytest.skip("no ABF fixture builder exposed")
    sig = (np.sin(np.arange(500) * 0.05) * 1000).astype(np.int16)
    good = bytearray(maker(sig))
    rng = np.random.RandomState(1 + FUZZ_SEED)
    n_ok = [0]
    reg_loader = lambda path: abf_mod.load_abf(path, SweepRegistry())  # noqa
    for cut in range(0, len(good), max(1, len(good) // 97)):
        q = tmp_path / "cut.abf"
        q.write_bytes(bytes(good[:cut]))
        _fuzz_load(reg_loader, str(q), n_ok)
    for trial in range(200 * FUZZ_SCALE):
        buf = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        q = tmp_path / "fz.abf"
        q.write_bytes(bytes(buf))
        _fuzz_load(reg_loader, str(q), n_ok)
    assert n_ok[0] > 0


@pytest.mark.parametrize("op_mode", [1, 2])
def test_abf_event_driven_truncation_and_corruption(tmp_path, op_mode):
    """Both event-driven modes (variable-length 1, fixed-length 2) ride
    the SynchArray segmentation path — byte-flips and truncations there
    must reject cleanly like every other loader path (the synch fields
    are the newest untrusted surface)."""
    import tests.test_io_bytelevel as bl
    from spectral_tpu.io import abf as abf_mod
    rng = np.random.RandomState(4 + op_mode + FUZZ_SEED)
    n = 64
    events = [rng.randint(-3000, 3000, size=n).astype("<i2")
              for _ in range(3)]
    if op_mode == 1:
        events[1] = events[1][: n // 2]          # variable lengths
        good = bytearray(bl._abf2_event_bytes(events, op_mode=1))
    else:
        good = bytearray(bl._abf2_event_bytes(
            events, op_mode=2, samples_per_episode=n,
            synch_pairs=[(0, n), (200, n), (900, n)]))
    reg_loader = lambda path: abf_mod.load_abf(path, SweepRegistry())  # noqa
    n_ok = [0]
    for cut in range(0, len(good), max(1, len(good) // 97)):
        q = tmp_path / "cut.abf"
        q.write_bytes(bytes(good[:cut]))
        _fuzz_load(reg_loader, str(q), n_ok)
    for trial in range(200 * FUZZ_SCALE):
        buf = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        q = tmp_path / "fz.abf"
        q.write_bytes(bytes(buf))
        _fuzz_load(reg_loader, str(q), n_ok)
    assert n_ok[0] > 0


def test_npz_corruption(tmp_path):
    p = tmp_path / "g.npz"
    np.savez(str(p), raw=np.zeros(100, np.float32), fs=1000.0)
    good = bytearray(p.read_bytes())
    rng = np.random.RandomState(2 + FUZZ_SEED)
    for trial in range(100):
        buf = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        q = tmp_path / "fz.npz"
        q.write_bytes(bytes(buf))
        reg = SweepRegistry()
        try:
            reg.load_file(str(q))
        except ValueError:
            pass


def test_h5_corruption(tmp_path):
    """h5py surfaces corruption as RuntimeError/KeyError internals; the
    registry boundary must turn them into ValueError."""
    from spectral_tpu.io.nix import write_nix_fixture
    p = tmp_path / "g.h5"
    write_nix_fixture(str(p), [{"raw": np.zeros(100, np.float32)}])
    good = bytearray(p.read_bytes())
    rng = np.random.RandomState(3 + FUZZ_SEED)
    n_ok = [0]
    for trial in range(150 * FUZZ_SCALE):
        buf = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(len(buf))] = rng.randint(256)
        q = tmp_path / "fz.h5"
        q.write_bytes(bytes(buf))
        _fuzz_load(lambda path: SweepRegistry().load_file(path), str(q), n_ok)
    assert n_ok[0] > 0


def test_h5_non_utf8_link_name_loads(tmp_path):
    """h5py's visititems delivers a link name that fails UTF-8 decode as
    raw BYTES; '"/" in name' on bytes is a TypeError. Found by the 25x
    fuzz soak (a byte flip landed inside a stored link name); pinned
    deterministically with a low-level-API-crafted file. The generic
    collector must normalize the name and load the sweep."""
    import h5py
    p = str(tmp_path / "badname.h5")
    with h5py.File(p, "w") as f:
        space = h5py.h5s.create_simple((16,))
        dt = h5py.h5t.py_create(np.float32)
        ds = h5py.h5d.create(f.id, b"raw\xff\xfe", dt, space)
        ds.write(h5py.h5s.ALL, h5py.h5s.ALL,
                 np.arange(16, dtype=np.float32))
    with h5py.File(p, "a") as f:
        key = list(f.keys())[0]          # comes back as bytes
        assert isinstance(key, bytes)
        f[key].attrs["fs"] = 1000.0
    reg = SweepRegistry()
    names = reg.load_file(p)
    assert names == ["badname_sweep0"]
    sig, fs = reg.get_signal(names[0], processed=False)
    assert fs == 1000.0 and sig.shape == (16,)


def test_missing_file_raises_filenotfound_not_corruption(tmp_path):
    """A typo'd path is not corruption: every loader raises
    FileNotFoundError for a missing file, never the 'not readable'
    ValueError (review finding: the OSError catch around np.load/h5py
    used to swallow it)."""
    reg = SweepRegistry()
    for name in ("missing.npz", "missing.h5", "missing.nix",
                 "missing.wav", "missing.abf"):
        with pytest.raises(FileNotFoundError):
            reg.load_file(str(tmp_path / name))


def test_abf_nonfinite_sample_interval_rejected(tmp_path):
    """NaN is truthy and Inf divides to 0 Hz: a corrupted interval field
    must fail with a clean ValueError at load, not leak fs=NaN."""
    import struct
    import tests.test_io_bytelevel as bl
    from spectral_tpu.io import abf as abf_mod
    maker = getattr(bl, "_abf1_bytes", None)
    if maker is None:
        pytest.skip("no ABF fixture builder exposed")
    sig = (np.sin(np.arange(500) * 0.05) * 1000).astype(np.int16)
    good = bytearray(maker(sig))
    # ABF1 sample interval lives at byte offset 122 (f4, per-channel us)
    for bad in (float("nan"), float("inf"), -1.0):
        buf = bytearray(good)
        buf[122:126] = struct.pack("<f", bad)
        q = tmp_path / "bad_si.abf"
        q.write_bytes(bytes(buf))
        with pytest.raises(ValueError):
            abf_mod.load_abf(str(q), SweepRegistry())
