"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform virtual devices (SURVEY.md §4.4). Must run before jax
is imported anywhere.
"""

import os
import sys

# Force CPU regardless of the ambient platform (the dev image pre-sets
# JAX_PLATFORMS=axon; running the test matrix over the tunneled TPU would be
# both slow and contended). The env var alone is not honored once the axon
# plugin is installed, so also set the config flag right after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
