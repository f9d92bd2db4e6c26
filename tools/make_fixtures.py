#!/usr/bin/env python
"""Generate demo/test recordings in every supported container format.

Usage: python tools/make_fixtures.py [out_dir]

Produces, in out_dir (default ./fixtures):
  eeg_bursts.wav   60 s @ 1 kHz, two Hann-enveloped 6 Hz bursts (10-15 s,
                   30-38 s) in pink-ish noise — the canonical detection demo
                   (the unsupervised flow should find ~those intervals).
  chirp.wav        10 s @ 16 kHz linear chirp — the render demo.
  sweeps.h5        NIX-layout HDF5 with 3 segments (raw+processed pairs).
  sweeps.abf       ABF2 with 3 sweeps of the same signals.
  sweeps.npz       the npz convenience container.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spectral_tpu.io import abf, nix, wav  # noqa: E402


def bursty_eeg(fs=1000.0, dur=60.0, bursts=((10, 15), (30, 38)), seed=0):
    rng = np.random.RandomState(seed)
    n = int(fs * dur)
    t = np.arange(n) / fs
    x = 0.02 * rng.randn(n)
    for a, b in bursts:
        m = (t >= a) & (t < b)
        x[m] += 0.6 * np.hanning(m.sum()) * np.sin(2 * np.pi * 6.0 * t[m])
    return x.astype(np.float32)


def main(out_dir: str = "fixtures") -> int:
    os.makedirs(out_dir, exist_ok=True)
    fs_eeg = 1000.0

    x = bursty_eeg()
    wav.write_wav(os.path.join(out_dir, "eeg_bursts.wav"), x * 0.5, fs_eeg)

    fs_a = 16000.0
    t = np.arange(int(10 * fs_a)) / fs_a
    chirp = (0.8 * np.sin(2 * np.pi * (100 + 300 * t) * t)).astype(np.float32)
    wav.write_wav(os.path.join(out_dir, "chirp.wav"), chirp, fs_a)

    sweeps = np.stack([bursty_eeg(seed=s, bursts=((8 + s, 14 + s),))
                       for s in range(3)])
    nix.write_nix_fixture(
        os.path.join(out_dir, "sweeps.h5"),
        [{"raw_ch0": s, "proc_ch0": s * 0.5} for s in sweeps], fs=fs_eeg)
    abf.write_abf2_fixture(os.path.join(out_dir, "sweeps.abf"), sweeps, fs_eeg)
    np.savez(os.path.join(out_dir, "sweeps.npz"), raw=sweeps,
             processed=sweeps * 0.5, fs=fs_eeg)

    for name in sorted(os.listdir(out_dir)):
        print(f"{name}: {os.path.getsize(os.path.join(out_dir, name))} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "fixtures"))
