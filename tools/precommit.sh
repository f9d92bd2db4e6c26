#!/bin/sh
# Pre-commit gate: derived docs can never go stale at a commit.
#
# docs/API.md is GENERATED from the package's public surface by
# tools/gen_api_docs.py, and tests/test_docs.py::test_api_md_is_fresh
# fails whenever the committed file differs from a regeneration. The
# round-3 and round-4 snapshots both ended RED on exactly that test
# because new public API landed without a regen. This hook makes the
# failure structurally impossible: every commit regenerates the index
# and stages the result, so the committed tree always matches.
#
# Install (done automatically by `python -m tools.install_hooks`, which
# pip install -e . runs via tools/install_hooks.py; or by hand):
#   ln -sf ../../tools/precommit.sh .git/hooks/pre-commit
#
# Keep this POSIX-sh and fast (<2 s): it runs on every commit.

set -e

ROOT=$(git rev-parse --show-toplevel)
cd "$ROOT"

python tools/gen_api_docs.py >/dev/null
if ! git diff --quiet -- docs/API.md; then
    git add docs/API.md
    echo "pre-commit: docs/API.md regenerated and staged" >&2
fi

# The freshness test itself (cheap: pure-AST, no jax import) as a belt
# over the braces — if the generator and the test ever disagree, block.
python - <<'EOF'
import sys, os
sys.path.insert(0, os.path.join(os.getcwd(), "tools"))
import gen_api_docs
want = gen_api_docs.generate()
got = open(os.path.join("docs", "API.md"), encoding="utf-8").read()
if got != want:
    sys.stderr.write("pre-commit: docs/API.md still stale after regen\n")
    sys.exit(1)
EOF
