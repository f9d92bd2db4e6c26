"""SpecConfig serialization + derived properties (config.py).

The JSON round-trip replaces the reference's QSettings persistence for
headless use (GUI.py:190-224); session save/load rides it
(api/session.py save_state/load_state), so a lossy field here silently
corrupts restored sessions.
"""

import dataclasses

import pytest

from spectral_tpu.config import SpecConfig


@pytest.mark.parametrize("cfg", [
    SpecConfig.scipy_default(1024, fmin=0.0, fmax=30.0, log_scale=True),
    SpecConfig.north_star(512, 128),
    SpecConfig(nperseg=256, hop=64, window=("tukey", 0.25)),      # tuple window
    SpecConfig(nperseg=2048, window=("kaiser", 8.6), nfft=4096,
               detrend="linear", mode="magnitude", center=True),
    SpecConfig(nperseg=128, hop=32, n_mels=32, mel_htk=True,
               mel_fmin=20.0, mel_fmax=4000.0),
])
def test_json_roundtrip_lossless(cfg):
    back = SpecConfig.from_json(cfg.to_json())
    assert back == cfg
    # frozen dataclass equality covers every declared field; assert that
    # explicitly so a future non-compared field cannot hide
    for f in dataclasses.fields(SpecConfig):
        assert getattr(back, f.name) == getattr(cfg, f.name), f.name


def test_derived_properties_follow_scipy_defaults():
    cfg = SpecConfig.scipy_default(1024)
    # scipy.signal.spectrogram: noverlap = nperseg // 8 by default
    assert cfg.hop_ == 1024 - 1024 // 8 == 896
    assert cfg.noverlap_ == 1024 - 896 == 128
    assert cfg.nfft_ == 1024
    explicit = SpecConfig(nperseg=256, hop=64, nfft=512)
    assert explicit.hop_ == 64
    assert explicit.noverlap_ == 192
    assert explicit.nfft_ == 512
