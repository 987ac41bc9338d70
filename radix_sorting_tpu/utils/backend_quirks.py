"""Known runtime quirks that change dispatch or error behavior.

The axon TPU tunnel (the shared-slice development runtime this framework is
validated on) has measured, reproducible limitations that a library cannot
work around — it can only fail clearly instead of cryptically:

* **complex dtypes**: allocating one poisons the process — every later
  device-to-host copy fails UNIMPLEMENTED (docs/NOTES.md backend facts).
  `extras.sort_complex` therefore never touches the device.
* **sub-byte dtypes (int4/uint4)**: a device array CAN be created (as a jit
  output), but consuming it in ANY way — as a jit argument, closed over, or
  read back to host — fails (measured 2026-08-19: `RecursionError:
  Recursively calling jit` inside `device_put`'s layout reshard, or
  JaxRuntimeError after it; all sizes, both dtypes). Sub-byte keys still
  work end-to-end when the values are produced AND consumed inside one
  jitted program; only concrete S4/U4 arrays crossing the dispatch boundary
  break. Real (non-tunnel) TPU runtimes are unaffected.
"""

from __future__ import annotations

import os
import sys

__all__ = ["is_axon_runtime", "SUBBYTE_AXON_ERROR"]

SUBBYTE_AXON_ERROR = (
    "int4/uint4 device arrays cannot cross the dispatch boundary on the "
    "axon TPU runtime (plugin layout-reshard bug: RecursionError in "
    "device_put, measured 2026-08-19 — see utils/backend_quirks.py). "
    "Pass int8/uint8 keys, or keep the sub-byte values inside one jitted "
    "program (jit the whole pipeline so the S4 array is never a concrete "
    "argument)."
)


def is_axon_runtime() -> bool:
    """True when this process runs through the axon TPU tunnel.

    Checked via the tunnel's site dir on sys.path (the same heuristic as
    `utils.compile_cache`) so calling this never initializes the JAX
    runtime. A `JAX_PLATFORMS` override that excludes the tunnel (the test
    suite forces `cpu` in conftest) means the quirks do NOT apply even when
    the site dir is importable, so that is checked first.
    """
    platforms = os.environ.get("JAX_PLATFORMS", "")
    if platforms and not any(
            p.strip() in ("axon", "tpu") for p in platforms.lower().split(",")):
        return False
    return any(".axon_site" in p for p in sys.path)
