"""Driver-entry helpers (__graft_entry__.py).

The dryrun's tolerant pixel comparison decodes OUR palette PNGs with a
dependency-free parser; its output must agree with the PIL decoder the
rest of the suite trusts (render/png.decode_png).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from __graft_entry__ import _png_palette_indices  # noqa: E402
from spectral_tpu.render.png import encode_png_palette  # noqa: E402


def test_palette_index_parser_matches_pil(tmp_path):
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 256, size=(37, 61)).astype(np.uint8)
    pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    encode_png_palette(idx, pal, path=p)

    got = _png_palette_indices(p)
    np.testing.assert_array_equal(got, idx)

    # cross-check against the PIL decoder: palette lookup of the parsed
    # indices reproduces the RGB pixels PIL reports
    from spectral_tpu.render.png import decode_png
    rgb = decode_png(p)
    np.testing.assert_array_equal(rgb, pal[got])
