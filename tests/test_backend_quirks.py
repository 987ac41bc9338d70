"""utils.backend_quirks: runtime detection + the sub-byte dispatch guard.

The axon tunnel cannot consume concrete int4/uint4 device arrays (see
radix_sorting_tpu/utils/backend_quirks.py for the measured failure mode);
`api._as_words` raises a typed error there instead of wedging the client.
These tests pin the DETECTION logic, which must respect a JAX_PLATFORMS
override — the CPU suite itself runs with the axon site dir importable.
"""

import os
import sys
from unittest import mock

from radix_sorting_tpu.utils import backend_quirks


def _detect(platforms, path_has_site):
    env = dict(os.environ)
    if platforms is None:
        env.pop("JAX_PLATFORMS", None)
    else:
        env["JAX_PLATFORMS"] = platforms
    path = list(sys.path) + (["/root/.axon_site"] if path_has_site else [])
    with mock.patch.dict(os.environ, env, clear=True), \
            mock.patch.object(sys, "path", path):
        return backend_quirks.is_axon_runtime()


def test_platform_override_wins():
    # the test suite's own configuration: site dir importable, cpu forced
    assert _detect("cpu", path_has_site=True) is False
    assert _detect("cpu,cuda", path_has_site=True) is False


def test_axon_detection():
    assert _detect("axon", path_has_site=True) is True
    assert _detect("tpu", path_has_site=True) is True
    # unset platform + site dir on path = the default tunnel environment
    assert _detect(None, path_has_site=True) is True


def test_no_site_dir_means_not_axon():
    without_site = [p for p in sys.path if ".axon_site" not in p]
    with mock.patch.object(sys, "path", without_site):
        assert backend_quirks.is_axon_runtime() is False


def test_error_message_actionable():
    msg = backend_quirks.SUBBYTE_AXON_ERROR
    assert "int4" in msg and "int8" in msg  # names the fix, not just the bug


def test_numpy_int4_guard_fires_before_device_put():
    # a HOST numpy int4 array must raise the typed error BEFORE
    # jnp.asarray: the device_put itself is what crashes on axon, so a
    # post-conversion guard would never be reached
    import ml_dtypes
    import numpy as np
    import pytest

    import radix_sorting_tpu as rst

    x = np.arange(16, dtype=np.int8).astype(ml_dtypes.int4)
    env = dict(os.environ, JAX_PLATFORMS="axon")
    path = list(sys.path) + ["/root/.axon_site"]
    with mock.patch.dict(os.environ, env, clear=True), \
            mock.patch.object(sys, "path", path):
        with pytest.raises(TypeError, match="axon"):
            rst.sort(x)
