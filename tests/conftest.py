"""Test configuration: force the CPU platform with 8 virtual devices.

The axon sitecustomize registers the TPU backend in every process and pins
``jax_platforms=axon,cpu``; tests run on a fake 8-device CPU mesh instead —
the TPU-native answer to "test multi-device without a cluster"
(SURVEY.md §4). Must run before any jax computation.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from dct_tpu.utils.general import set_debug  # noqa: E402

set_debug(True)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
