"""Test environment: host-local multi-device CPU simulation.

The reference tests are one self-verifying binary (`radix_tests.cpp:209-227`).
Here: property tests against jnp oracles on CPU, with an 8-device virtual mesh
(`xla_force_host_platform_device_count`) so the multi-chip shuffle is tested
without a pod — the idiomatic TPU equivalent (SURVEY §4).

Env vars must be set before jax initializes, hence this conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = os.environ.get("RST_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.Generator(np.random.PCG64(0xC0FFEE))


# the axon TPU tunnel cannot consume concrete sub-byte (int4/uint4) device
# arrays at all (RecursionError in device_put's layout reshard — see
# radix_sorting_tpu/utils/backend_quirks.py); tests that CREATE one must
# skip there BEFORE creating it (even creation risks wedging the client)
skip_subbyte_on_axon = pytest.mark.skipif(
    os.environ.get("RST_TEST_PLATFORM", "") == "axon",
    reason="axon runtime cannot consume concrete int4/uint4 device arrays "
           "(backend_quirks.py; the API raises a typed error there)")
