"""Minimal pure-Python ABF (Axon Binary Format) reader.

The reference depends on ``pyabf`` (SweepManager.py:21-58: per-sweep channel-0
data with a fall-back-to-channel-1 heuristic when channel 0 is all zeros, fs
from ``abf.dataRate``). pyabf is not part of this framework's environment, so
this module parses the two ABF container generations directly:

  * ABF2 ('ABF2' signature): block-mapped sections at offset 76; we read the
    Protocol section (sampling interval, ADC range/resolution), ADC section
    (per-channel scaling), and Data section (int16 or float32, interleaved by
    channel). Field layouts follow the publicly documented ABF2 structures.
  * ABF1 ('ABF ' signature): fixed header offsets.

Scaling for int16 data: value = raw * scale + offset with
scale = fADCRange / lADCResolution / fInstrumentScaleFactor / fSignalGain /
fADCProgrammableGain (/ fTelegraphAdditGain when telegraph is enabled) and
offset = fInstrumentOffset - fSignalOffset.

Scope: episodic/gap-free int16 and float32 data without compression
(enforced: compressed ABF2 and event-driven variable-length files raise
ValueError). ABF1 channel order follows nADCSamplingSeq (the interleaved
data is in sampling-sequence order; scaling arrays are indexed by physical
channel), data starts nNumPointsIgnored samples into the data section, and
telegraph gain applies from header version 1.6 on.
"""

from __future__ import annotations

import os
import struct
from typing import List, Tuple

import numpy as np

BLOCK = 512

# ---------------------------------------------------------------------------
# struct layouts (field name, struct code) — prefixes of the full ABF2 structs
# ---------------------------------------------------------------------------

_PROTOCOL_FIELDS = [
    ("nOperationMode", "h"), ("fADCSequenceInterval", "f"),
    ("bEnableFileCompression", "b"), ("sUnused1", "3s"),
    ("uFileCompressionRatio", "I"), ("fSynchTimeUnit", "f"),
    ("fSecondsPerRun", "f"), ("lNumSamplesPerEpisode", "i"),
    ("lPreTriggerSamples", "i"), ("lEpisodesPerRun", "i"),
    ("lRunsPerTrial", "i"), ("lNumberOfTrials", "i"),
    ("nAveragingMode", "h"), ("nUndoRunCount", "h"),
    ("nFirstEpisodeInRun", "h"), ("fTriggerThreshold", "f"),
    ("nTriggerSource", "h"), ("nTriggerAction", "h"),
    ("nTriggerPolarity", "h"), ("fScopeOutputInterval", "f"),
    ("fEpisodeStartToStart", "f"), ("fRunStartToStart", "f"),
    ("lAverageCount", "i"), ("fTrialStartToStart", "f"),
    ("nAutoTriggerStrategy", "h"), ("fFirstRunDelayS", "f"),
    ("nChannelStatsStrategy", "h"), ("lSamplesPerTrace", "i"),
    ("lStartDisplayNum", "i"), ("lFinishDisplayNum", "i"),
    ("nShowPNRawData", "h"), ("fStatisticsPeriod", "f"),
    ("lStatisticsMeasurements", "i"), ("nStatisticsSaveStrategy", "h"),
    ("fADCRange", "f"), ("fDACRange", "f"),
    ("lADCResolution", "i"), ("lDACResolution", "i"),
]

_ADC_FIELDS = [
    ("nADCNum", "h"), ("nTelegraphEnable", "h"),
    ("nTelegraphInstrument", "h"), ("fTelegraphAdditGain", "f"),
    ("fTelegraphFilter", "f"), ("fTelegraphMembraneCap", "f"),
    ("nTelegraphMode", "h"), ("fTelegraphAccessResistance", "f"),
    ("nADCPtoLChannelMap", "h"), ("nADCSamplingSeq", "h"),
    ("fADCProgrammableGain", "f"), ("fADCDisplayAmplification", "f"),
    ("fADCDisplayOffset", "f"), ("fInstrumentScaleFactor", "f"),
    ("fInstrumentOffset", "f"), ("fSignalGain", "f"),
    ("fSignalOffset", "f"), ("fSignalLowpassFilter", "f"),
    ("fSignalHighpassFilter", "f"),
]


def _read_struct(buf: bytes, offset: int, fields) -> dict:
    fmt = "<" + "".join(code for _, code in fields)
    vals = struct.unpack_from(fmt, buf, offset)
    return dict(zip((n for n, _ in fields), vals))


class AbfInfo:
    """Parsed ABF metadata + raw data access."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self._buf = fh.read()
        sig = self._buf[:4]
        try:
            if sig == b"ABF2":
                self._parse_abf2()
            elif sig == b"ABF ":
                self._parse_abf1()
            else:
                raise ValueError(
                    f"{path}: not an ABF file (signature {sig!r})")
        except (struct.error, IndexError, OverflowError,
                MemoryError) as e:
            # a truncated/corrupted file must reject cleanly at the
            # untrusted-input boundary, not leak parser internals
            raise ValueError(f"{path}: malformed ABF file: {e}")

    # -- ABF2 ---------------------------------------------------------------

    def _section(self, index: int) -> Tuple[int, int, int]:
        """(block_start, entry_size, entry_count) for section `index`."""
        off = 76 + 16 * index
        block, size = struct.unpack_from("<II", self._buf, off)
        count = struct.unpack_from("<q", self._buf, off + 8)[0]
        return block, size, count

    def _parse_abf2(self):
        buf = self._buf
        self.version = 2
        self.n_sweeps = max(1, struct.unpack_from("<I", buf, 12)[0])
        self.data_format = struct.unpack_from("<H", buf, 30)[0]  # 0=i16 1=f32

        proto_block, _, _ = self._section(0)
        proto = _read_struct(buf, proto_block * BLOCK, _PROTOCOL_FIELDS)
        if proto["bEnableFileCompression"]:
            raise ValueError(
                "compressed ABF2 files are out of scope — the data section "
                "is not raw samples")
        if proto["nOperationMode"] == 1:
            raise ValueError(
                "ABF2 event-driven variable-length files (nOperationMode=1) "
                "are out of scope — sweeps are not uniform")
        self.sample_interval_us = proto["fADCSequenceInterval"]
        self.samples_per_episode = proto["lNumSamplesPerEpisode"]
        self.adc_range = proto["fADCRange"]
        self.adc_resolution = proto["lADCResolution"]

        adc_block, adc_size, adc_count = self._section(1)
        # the section count is untrusted int64: a corrupt value with
        # adc_size=0 would spin the per-channel loop ~2^62 times without
        # ever reading out of bounds (hang, not a clean error). Real ABF
        # hardware tops out at 16 ADC channels; 256 is generous.
        if not 0 <= adc_count <= 256:
            raise ValueError(
                f"implausible ABF2 ADC channel count {adc_count}")
        self.n_channels = max(1, int(adc_count))
        self.channel_scale = []
        self.channel_offset = []
        for i in range(self.n_channels):
            a = _read_struct(buf, adc_block * BLOCK + i * adc_size, _ADC_FIELDS)
            scale = 1.0
            for g in (a["fInstrumentScaleFactor"], a["fSignalGain"],
                      a["fADCProgrammableGain"]):
                if g:
                    scale /= g
            if a["nTelegraphEnable"] and a["fTelegraphAdditGain"]:
                scale /= a["fTelegraphAdditGain"]
            if self.adc_resolution:
                scale *= self.adc_range / self.adc_resolution
            self.channel_scale.append(scale)
            self.channel_offset.append(a["fInstrumentOffset"] - a["fSignalOffset"])

        data_block, data_size, data_count = self._section(10)
        if data_size not in (2, 4):
            raise ValueError(f"unsupported ABF2 data entry size {data_size}")
        dtype = "<i2" if data_size == 2 else "<f4"
        start = data_block * BLOCK
        if data_count < 0:
            # np.frombuffer treats -1 as "read everything": a corrupt
            # negative count must reject, not silently read past the
            # declared section
            raise ValueError(f"negative ABF2 data count {data_count}")
        self._data = np.frombuffer(buf, dtype, count=int(data_count),
                                   offset=start)
        # int16 files always declare format 0; trust the section entry size
        self.data_is_int = data_size == 2
        self._check_sweep_count()

    # -- ABF1 ---------------------------------------------------------------

    def _parse_abf1(self):
        buf = self._buf
        self.version = 1
        u = lambda fmt, off: struct.unpack_from("<" + fmt, buf, off)[0]
        file_version = u("f", 4)                       # fFileVersionNumber
        op_mode = u("h", 8)                            # nOperationMode
        if op_mode == 1:
            raise ValueError(
                "ABF1 event-driven variable-length files (nOperationMode=1) "
                "are out of scope — sweeps are not uniform")
        self.n_sweeps = max(1, u("i", 16))            # lActualEpisodes
        acq_len = u("i", 10)                           # lActualAcqLength
        points_ignored = u("h", 14)                    # nNumPointsIgnored
        self.n_channels = max(1, u("h", 120))          # nADCNumChannels
        self.sample_interval_us = u("f", 122) * self.n_channels
        self.samples_per_episode = u("i", 138)         # lNumSamplesPerEpisode
        data_ptr = u("i", 40)                          # lDataSectionPtr
        self.data_format = u("h", 100)                 # nDataFormat
        self.adc_range = u("f", 244)
        self.adc_resolution = u("i", 252)
        # telegraph arrays exist from header version 1.65 on (pyabf/neo
        # apply them whenever present); guard older, shorter headers
        has_telegraph = file_version >= 1.6 and len(buf) >= 4576 + 64
        self.channel_scale, self.channel_offset = [], []
        for ch in range(self.n_channels):
            # the interleaved data's channel order is the SAMPLING
            # SEQUENCE (nADCSamplingSeq, int16[16] at 410); the scaling
            # arrays below are indexed by PHYSICAL channel number
            phys = u("h", 410 + 2 * ch)
            inst_scale = u("f", 922 + 4 * phys)
            inst_off = u("f", 986 + 4 * phys)
            sig_gain = u("f", 1050 + 4 * phys)
            sig_off = u("f", 1114 + 4 * phys)
            prog_gain = u("f", 730 + 4 * phys)
            scale = 1.0
            for g in (inst_scale, sig_gain, prog_gain):
                if g:
                    scale /= g
            if has_telegraph and u("h", 4512 + 2 * phys):  # nTelegraphEnable
                tele_gain = u("f", 4576 + 4 * phys)  # fTelegraphAdditGain
                if tele_gain:
                    scale /= tele_gain
            if self.adc_resolution:
                scale *= self.adc_range / self.adc_resolution
            self.channel_scale.append(scale)
            self.channel_offset.append(inst_off - sig_off)
        dtype = "<i2" if self.data_format == 0 else "<f4"
        itemsize = 2 if self.data_format == 0 else 4
        if acq_len < 0:
            # np.frombuffer(count=-1) reads to the end of the buffer — a
            # corrupt negative length must reject, not read past the header
            raise ValueError(f"negative ABF1 acquisition length {acq_len}")
        self._data = np.frombuffer(
            buf, dtype, count=acq_len,
            offset=data_ptr * BLOCK + points_ignored * itemsize)
        self.data_is_int = self.data_format == 0
        self._check_sweep_count()

    def _check_sweep_count(self) -> None:
        """Reject a declared episode count no real file can have: a sweep
        is at least one sample, so more sweeps than data samples means a
        corrupt header — and load_abf registers one entry PER declared
        sweep, so an unchecked 32-bit count (up to ~4.3e9) turns one
        corrupt file into an effective hang/OOM at the untrusted-input
        boundary."""
        if self.n_sweeps > max(1, len(self._data)):
            raise ValueError(
                f"declared sweep count {self.n_sweeps} exceeds the "
                f"{len(self._data)}-sample data section")

    # -- public -------------------------------------------------------------

    @property
    def data_rate(self) -> float:
        """Per-channel sampling rate in Hz (pyabf.dataRate semantics)."""
        si = self.sample_interval_us
        # NaN is truthy and Inf divides to 0 Hz — corrupted float bytes in
        # the interval field must fail here, not as NaN spectrograms later
        if not si or not np.isfinite(si) or si < 0:
            raise ValueError(
                f"ABF file has invalid sampling interval: {si!r}")
        return 1e6 / si

    def sweep(self, sweep_idx: int, channel: int = 0) -> np.ndarray:
        """Scaled float32 data for one sweep/channel."""
        nch = self.n_channels
        per_sweep_total = (len(self._data) // self.n_sweeps // nch) * nch
        start = sweep_idx * per_sweep_total
        chunk = self._data[start:start + per_sweep_total]
        ch_data = chunk[channel::nch].astype(np.float32)
        if self.data_is_int:
            ch_data = (ch_data * self.channel_scale[channel]
                       + self.channel_offset[channel])
        return ch_data


def load_abf(filepath: str, registry) -> List[str]:
    """Register ABF sweeps, reproducing the reference's channel heuristic
    (SweepManager.py:29-56): take channel 0 unless it is all-zero, then
    channel 1, else channel 0 anyway (or a single zero sample if no data)."""
    from spectral_tpu.io.registry import SweepEntry
    abf = AbfInfo(filepath)
    base = os.path.splitext(os.path.basename(filepath))[0]
    names: List[str] = []
    fs = abf.data_rate
    for i in range(abf.n_sweeps):
        ch0 = abf.sweep(i, 0)
        if ch0.size and np.any(np.abs(ch0) > 0):
            raw = ch0
        else:
            # channel 1 is extracted LAZILY: the common case (non-zero
            # channel 0) would otherwise pay a full strided copy + scale
            # of the discarded channel for every sweep
            ch1 = abf.sweep(i, 1) if abf.n_channels > 1 else None
            if ch1 is not None and ch1.size and np.any(np.abs(ch1) > 0):
                raw = ch1
            else:
                # SweepManager.py:52-56: an empty/no-data sweep registers a
                # single zero sample (ch0.size can be 0 when the data
                # section is empty — "is not None" could never take this)
                raw = ch0 if ch0.size else np.zeros(1, np.float32)
        name = f"{base}_sweep{i}"
        registry.register(name, SweepEntry(
            filepath=filepath, sweep_idx=i, fs=fs, fs_raw=fs,
            raw=raw, processed=None))
        names.append(name)
    return names


# ---------------------------------------------------------------------------
# Fixture writer (tests / interchange): minimal valid ABF2 episodic file
# ---------------------------------------------------------------------------

def write_abf2_fixture(filepath: str, sweeps: np.ndarray, fs: float,
                       n_channels: int = 1) -> None:
    """Write (n_sweeps, n_samples) float data as an int16 ABF2 file readable
    by this module (scale chosen so values round-trip to ~1e-4)."""
    sweeps = np.atleast_2d(np.asarray(sweeps, np.float64))
    n_sweeps, n_samp = sweeps.shape
    adc_range, adc_res = 10.0, 2 ** 15
    peak = np.abs(sweeps).max() or 1.0
    inst_scale = adc_range / (peak * 1.2)
    # value = raw * adc_range/adc_res / inst_scale  =>  raw = value*inst_scale*adc_res/adc_range
    raw = np.round(sweeps * inst_scale * adc_res / adc_range)
    raw = np.clip(raw, -32768, 32767).astype("<i2")

    proto_fmt = "<" + "".join(c for _, c in _PROTOCOL_FIELDS)
    proto_vals = {n: 0 for n, _ in _PROTOCOL_FIELDS}
    proto_vals.update(dict(
        nOperationMode=5, fADCSequenceInterval=1e6 / fs, sUnused1=b"\0" * 3,
        lNumSamplesPerEpisode=n_samp * n_channels, lEpisodesPerRun=n_sweeps,
        fADCRange=adc_range, lADCResolution=adc_res))
    proto = struct.pack(proto_fmt, *[proto_vals[n] for n, _ in _PROTOCOL_FIELDS])

    adc_fmt = "<" + "".join(c for _, c in _ADC_FIELDS)
    adc_entries = b""
    for ch in range(n_channels):
        vals = {n: 0 for n, _ in _ADC_FIELDS}
        vals.update(dict(nADCNum=ch, fADCProgrammableGain=1.0,
                         fInstrumentScaleFactor=inst_scale, fSignalGain=1.0))
        adc_entries += struct.pack(adc_fmt, *[vals[n] for n, _ in _ADC_FIELDS])

    def pad_block(b: bytes) -> bytes:
        return b + b"\0" * (-len(b) % BLOCK)

    # layout: header(1 block) | protocol | adc | data
    header = bytearray(BLOCK)
    header[0:4] = b"ABF2"
    struct.pack_into("<I", header, 12, n_sweeps)      # lActualEpisodes
    struct.pack_into("<H", header, 30, 0)             # nDataFormat = int16

    proto_b = pad_block(proto)
    adc_b = pad_block(adc_entries)
    data_b = raw.tobytes()

    proto_block = 1
    adc_block = proto_block + len(proto_b) // BLOCK
    data_block = adc_block + len(adc_b) // BLOCK

    def sec(idx, block, size, count):
        struct.pack_into("<IIq", header, 76 + 16 * idx, block, size, count)

    sec(0, proto_block, len(proto), 1)
    sec(1, adc_block, len(adc_entries) // max(n_channels, 1), n_channels)
    sec(10, data_block, 2, raw.size)

    with open(filepath, "wb") as fh:
        fh.write(bytes(header))
        fh.write(proto_b)
        fh.write(adc_b)
        fh.write(data_b)
