"""docs/API.md freshness: the committed index must match a regeneration
(rerun `python tools/gen_api_docs.py` after adding/renaming public API)."""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_md_is_fresh():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    try:
        import gen_api_docs
    finally:
        sys.path.pop(0)
    want = gen_api_docs.generate()
    got = open(os.path.join(ROOT, "docs", "API.md"),
               encoding="utf-8").read()
    assert got == want, ("docs/API.md is stale: rerun "
                         "`python tools/gen_api_docs.py`")
