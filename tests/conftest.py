"""Test configuration: CPU backend with 8 virtual devices + float64.

Mirrors the reference's testing posture (fp64 LAPACK tolerances, serial
runs) while going beyond it: the reference never tests multi-process
(/root/reference/.github/workflows/ci.yml runs single-process only); we
simulate an 8-device mesh on CPU so the sharded code paths are exercised
in every test run.

Note: the ambient environment may register a remote-TPU PJRT plugin
(JAX_PLATFORMS=axon) that ignores the env var override, so we force the
platform through jax.config, which the plugin respects.
"""

import os

# XLA flags must be in the environment before the CPU client initializes.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "tests expect 8 simulated devices"


@pytest.fixture
def rng():
    return np.random.default_rng(4634)  # the reference's MATLAB seed
