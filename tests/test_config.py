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


def test_invalid_enum_values_rejected():
    """Constructor validation: bad detrend/scaling/mode raise at config
    build time, not deep inside a traced program."""
    import pytest
    for kw in ({"detrend": "quadratic"}, {"scaling": "power"},
               {"mode": "phase"}):
        with pytest.raises(ValueError, match="unsupported"):
            SpecConfig(nperseg=256, hop=64, **kw)


def test_pipeline_rejects_unknown_enums(tmp_path):
    import pytest
    from spectral_tpu.parallel.pipeline import export_spectrograms
    cfg = SpecConfig(nperseg=256, hop=64)
    for kw in ({"pixel_format": "bmp"}, {"on_error": "retry"},
               {"encode_executor": "fiber"}):
        with pytest.raises(ValueError, match="unknown"):
            export_spectrograms([], 1000.0, cfg, str(tmp_path),
                                clip_samples=1000, **kw)
