"""Install the repo's git hooks (idempotent).

`python -m tools.install_hooks` (or `python tools/install_hooks.py`)
links `.git/hooks/pre-commit` to `tools/precommit.sh`, which
regenerates docs/API.md and stages it before every commit so
`tests/test_docs.py::test_api_md_is_fresh` can never fail at HEAD.
Run once per clone; safe to rerun. No-op outside a git checkout
(e.g. an sdist install).
"""

from __future__ import annotations

import os
import stat
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def install() -> bool:
    hooks_dir = os.path.join(ROOT, ".git", "hooks")
    script = os.path.join(ROOT, "tools", "precommit.sh")
    if not os.path.isdir(hooks_dir) or not os.path.exists(script):
        return False
    os.chmod(script, os.stat(script).st_mode | stat.S_IXUSR
             | stat.S_IXGRP | stat.S_IXOTH)
    target = os.path.join(hooks_dir, "pre-commit")
    rel = os.path.join("..", "..", "tools", "precommit.sh")
    if os.path.islink(target) or os.path.exists(target):
        os.remove(target)
    os.symlink(rel, target)
    return True


if __name__ == "__main__":
    ok = install()
    print("pre-commit hook installed" if ok
          else "not a git checkout; nothing to do")
    sys.exit(0)
