"""Property-based tests (hypothesis) for the pure-host contract functions.

Targets code whose correctness is a mathematical property rather than a
single golden value: event algebra (merge semantics vs a brute-force
oracle), label-track scans, WAV round-trips, display-name parsing, and
normalize's range/scaling invariants. Shapes are FIXED inside each
property (only values vary) so jitted paths never recompile per example;
settings are derandomized + bounded so CI time is deterministic.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from spectral_tpu.core.events import (build_label_track, label_scan,
                                      merge_overlapping_events)
from spectral_tpu.io.registry import split_display_name

COMMON = dict(max_examples=60, deadline=None, derandomize=True)

finite_f = st.floats(min_value=-1e6, max_value=1e6,
                     allow_nan=False, allow_infinity=False)


def intervals(max_n=12):
    return st.lists(
        st.tuples(finite_f, finite_f).map(lambda p: (min(p), max(p))),
        min_size=0, max_size=max_n)


# ---------------------------------------------------------------------------
# merge_overlapping_events (PlotEngine.py:669-684 semantics)
# ---------------------------------------------------------------------------

def _covered(x, events, tol):
    return any(s - tol <= x <= e + tol for s, e in events)


@settings(**COMMON)
@given(intervals())
def test_merge_is_sorted_disjoint_and_covering(evs):
    tol = 1e-6
    out = merge_overlapping_events(evs, tolerance=tol)
    # sorted, well-formed, pairwise separated by more than tol
    assert all(s <= e for s, e in out)
    assert all(out[i][0] <= out[i + 1][0] for i in range(len(out) - 1))
    assert all(out[i + 1][0] - out[i][1] > tol
               for i in range(len(out) - 1))
    # same point-coverage as the input (endpoints + midpoints as probes)
    for s, e in evs:
        for x in (s, e, (s + e) / 2):
            assert _covered(x, out, tol) == _covered(x, evs, tol) \
                or _covered(x, out, tol)   # merging may only ADD coverage
    # every output endpoint comes from some input endpoint
    ins = {v for ev in evs for v in ev}
    assert all(s in ins and e in ins for s, e in out)


@settings(**COMMON)
@given(intervals())
def test_merge_is_idempotent_and_order_invariant(evs):
    once = merge_overlapping_events(evs)
    assert merge_overlapping_events(once) == once
    assert merge_overlapping_events(list(reversed(evs))) == once


# ---------------------------------------------------------------------------
# label track <-> scan round trip (PlotEngine.py:301-321)
# ---------------------------------------------------------------------------

@settings(**COMMON)
@given(st.lists(st.tuples(st.integers(0, 97), st.integers(1, 98))
                .map(lambda p: (min(p), max(p) if max(p) > min(p)
                                else min(p) + 1)),
                min_size=1, max_size=4))
def test_label_track_scan_recovers_bursts(idx_pairs):
    # strictly wider than one sample: a single-point burst collapses its
    # onset/offset labels onto one index and the scan drops it — the
    # reference's behavior for degenerate ROIs, pinned by goldens
    t = np.arange(100.0) * 0.1
    bursts = sorted((t[a], t[b]) for a, b in idx_pairs)
    merged = merge_overlapping_events(bursts)
    labels = build_label_track(t, merged)
    assert set(np.unique(labels)) <= {0, 1, 2, 3}
    got = label_scan(labels, t)
    # scanning the labels recovers exactly the merged bursts: states
    # {1,2} open, 0 closes (the offset sample 3 closes at ITS time)
    for (gs, ge), (ms, me) in zip(got, merged):
        assert abs(gs - ms) < 1e-9 and ge >= ms
    assert len(got) == len(merged)


# ---------------------------------------------------------------------------
# WAV round trip
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.lists(st.floats(min_value=-1.0, max_value=1.0,
                          allow_nan=False, width=32),
                min_size=1, max_size=512))
def test_wav_pcm16_roundtrip(tmp_path_factory, samples):
    from spectral_tpu.io.wav import read_wav, write_wav
    p = str(tmp_path_factory.mktemp("wavprop") / "x.wav")
    x = np.asarray(samples, np.float32)
    write_wav(p, x, 8000.0)
    y, fs = read_wav(p)
    assert fs == 8000.0 and y.shape == x.shape
    # write scales by 32767, read by the standard 1/32768: round-trip
    # error bound is |x|*(1/32767 - 1/32768-ish) + 0.5/32768 < 4.7e-5
    np.testing.assert_allclose(y, np.clip(x, -1, 1), atol=4.7e-5)


# ---------------------------------------------------------------------------
# display-name parsing (ExportManager.py:61-63 regex semantics)
# ---------------------------------------------------------------------------

@settings(**COMMON)
@given(st.text(alphabet=st.characters(blacklist_characters="/\\\x00",
                                      blacklist_categories=("Cs",)),
               min_size=1, max_size=20),
       st.integers(0, 10 ** 6))
def test_split_display_name_roundtrip(base, i):
    got_base, got_idx = split_display_name(f"{base}_sweep{i}")
    # the regex strips ONE trailing _sweep<digits>; a base that itself
    # ends in _sweep<digits> loses that suffix too (reference regex
    # semantics, re.sub with $ anchor applies once to the final match)
    assert got_idx == str(i)
    assert got_base == split_display_name(base + f"_sweep{i}")[0]
    # names with no suffix parse as (name, None)
    if split_display_name(base)[1] is None:
        assert split_display_name(base)[0] == base


# ---------------------------------------------------------------------------
# normalize invariants (fixed shape: values vary, no recompiles)
# ---------------------------------------------------------------------------

@settings(max_examples=30, deadline=None, derandomize=True)
@given(st.integers(0, 2 ** 31 - 1), st.booleans())
def test_normalize_range_and_power_of_two_invariance(seed, log_scale):
    import jax.numpy as jnp
    from spectral_tpu.core.scale import normalize
    rng = np.random.RandomState(seed % (2 ** 31))
    sxx = (rng.rand(12, 7).astype(np.float32)) * rng.choice(
        [1e-6, 1.0, 1e6]).astype(np.float32)
    out = np.asarray(normalize(jnp.asarray(sxx), log_scale))
    assert out.min() >= 0.0 and out.max() <= 1.0
    if sxx.max() > 0:
        assert out.max() == 1.0
    # power-of-two scaling is bitwise lossless through the display map
    out2 = np.asarray(normalize(jnp.asarray(sxx * 4.0), log_scale))
    np.testing.assert_array_equal(out, out2)


# ---------------------------------------------------------------------------
# untrusted-input boundary: structured-chunk WAV fuzz
# ---------------------------------------------------------------------------

_tags = st.sampled_from([b"fmt ", b"data", b"LIST", b"junk", b"\x00\x00\x00\x00"])
_chunk = st.tuples(_tags, st.binary(max_size=24),
                   st.one_of(st.none(),            # honest size
                             st.integers(0, 0xFFFFFFFF)))  # lying size


@settings(max_examples=120, deadline=None, derandomize=True)
@given(st.lists(_chunk, max_size=5), st.binary(max_size=8))
def test_wav_readers_reject_or_parse_never_crash(tmp_path_factory, chunks,
                                                 trailer):
    """Crash-freedom at the untrusted boundary: for ANY chunk structure
    (including lying size fields, the 0xFFFFFFFF streamed-data
    placeholder, truncations and trailing garbage) both WAV readers
    either parse or raise ValueError — never struct.error/IndexError/
    MemoryError, never a hang."""
    import struct
    from spectral_tpu.io.wav import read_wav, wav_info
    body = b""
    for tag, payload, lie in chunks:
        size = len(payload) if lie is None else lie
        body += struct.pack("<4sI", tag, size) + payload
    body += trailer
    p = str(tmp_path_factory.mktemp("wavfuzz") / "f.wav")
    with open(p, "wb") as fh:
        fh.write(struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE")
                 + body)
    for fn in (read_wav, wav_info):
        try:
            fn(p)
        except ValueError:
            pass
