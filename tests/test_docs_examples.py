"""Docs stay executable: README / docs command lines and code blocks.

Two hundred commits of drift can silently break documented flags and
snippets. These tests extract the ACTUAL documented text and run it:
CLI lines parse against the real argparse parser (flag renames fail
here), and the README's Python blocks execute verbatim against small
fixtures (free variables the illustrative blocks assume — ``clips``,
``hour_long`` — are provided by the test, everything else is the
documented code itself).
"""

import re
import shlex

import h5py
import numpy as np
import pytest

REPO = __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__)))


def _read(relpath):
    with open(f"{REPO}/{relpath}", encoding="utf-8") as fh:
        return fh.read()


def _fenced_blocks(text, lang):
    return re.findall(rf"```{lang}\n(.*?)```", text, re.S)


def _cli_lines():
    """Every documented `spectral-tpu ...` invocation, from fenced bash
    blocks (README, OPERATIONS) and inline backticks (MIGRATION tables)."""
    lines = []
    for doc in ("README.md", "docs/OPERATIONS.md"):
        for block in _fenced_blocks(_read(doc), "bash"):
            for raw in block.splitlines():
                if "spectral-tpu" not in raw:
                    continue
                cmd = raw.split("|")[-1] if "|" in raw else raw
                toks = shlex.split(cmd, comments=True)
                if toks and toks[0] == "spectral-tpu":
                    lines.append((doc, raw.strip(), toks[1:]))
    for doc in ("docs/MIGRATION.md",):
        for cmd in re.findall(r"`(spectral-tpu [^`]+)`", _read(doc)):
            toks = shlex.split(cmd)
            lines.append((doc, cmd, toks[1:]))
    assert len(lines) >= 15, "doc extraction regressed"
    return lines


def test_documented_cli_lines_parse():
    from spectral_tpu.cli import build_parser
    ap = build_parser()
    for doc, raw, argv in _cli_lines():
        try:
            ap.parse_args(argv)
        except SystemExit:
            if len(argv) == 1:
                # bare "spectral-tpu stream"-style NAME mentions in prose
                # legitimately omit required positionals; still assert the
                # subcommand itself exists
                assert argv[0] in ap.format_help(), (doc, raw)
                continue
            pytest.fail(f"documented command no longer parses ({doc}): {raw}")


@pytest.fixture()
def doc_fixtures(tmp_path, monkeypatch):
    """The files the README quickstart names, small enough for CI."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(0)
    fs = 512.0
    n = int(fs * 40)
    sig = 0.2 * rng.standard_normal(n)
    tt = np.arange(n) / fs
    for s0 in (9.0, 25.0):  # bursts so detect/learn find events
        i0 = int(s0 * fs)
        k = int(5 * fs)
        sig[i0:i0 + k] += 1.2 * np.sin(2 * np.pi * 20 * tt[:k])
    with h5py.File(tmp_path / "recording.h5", "w") as f:
        d = f.create_dataset("sweep0", data=sig)
        d.attrs["fs"] = fs
    return tmp_path


def _python_blocks():
    return _fenced_blocks(_read("README.md"), "python")


def test_readme_quickstart_block_executes(doc_fixtures):
    block = next(b for b in _python_blocks() if "AnalysisSession()" in b)
    ns = {}
    exec(compile(block, "README.md<quickstart>", "exec"), ns)  # noqa: S102
    s = ns["s"]
    assert (doc_fixtures / "bursts.csv").exists()
    assert (doc_fixtures / "figure.png").read_bytes()[:8] == \
        b"\x89PNG\r\n\x1a\n"
    assert (doc_fixtures / "session.npz").exists()
    assert s.last_sxx is not None


def test_readme_parallel_block_executes(doc_fixtures):
    block = next(b for b in _python_blocks() if "shard_pipeline" in b)
    rng = np.random.default_rng(1)
    import jax.numpy as jnp
    ns = {
        # free variables the illustrative block assumes
        "clips": jnp.asarray(rng.standard_normal((8, 32000)), jnp.float32),
        "clip": jnp.asarray(rng.standard_normal(32000), jnp.float32),
        "hour_long": jnp.asarray(rng.standard_normal(48000 * 8), jnp.float32),
        "SpecConfig": __import__("spectral_tpu").SpecConfig,
    }
    exec(compile(block, "README.md<parallel>", "exec"), ns)  # noqa: S102
    assert ns["out"]["psd"].shape[0] == 8
    assert ns["psd"].ndim == 2
    assert float(ns["tot"]) > 0
