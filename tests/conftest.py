"""Test configuration: force a fake 8-device CPU mesh (SURVEY.md §4.2).

Must run before jax is imported anywhere. Set LANESLAM_TEST_TPU=1 to run the
suite against the real attached TPU instead (kernel tests do this in CI on
TPU machines).
"""

import os
import sys

_USE_TPU = os.environ.get("LANESLAM_TEST_TPU", "0") == "1"
if not _USE_TPU:
    # The image presets JAX_PLATFORMS=axon (TPU tunnel) and its
    # sitecustomize re-registers the axon backend, so both the env var and
    # the jax config must be forced to cpu.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
