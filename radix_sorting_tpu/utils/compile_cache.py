"""Persistent compilation cache — the PGO analog.

The reference ships a profile-generate/profile-use build cycle
(`/root/reference/Makefile:69-77`, `:22-30`): pay a profiling run once, reuse
the optimized binary forever after. The JAX counterpart is the persistent
compilation cache: the first process invocation pays trace+compile for each
(program, shape) and serializes the executable; later invocations deserialize
instead of recompiling, collapsing the CLI/bench `first_call_ms` to
H2D + dispatch.

Enabled by the process entry points (CLI, bench, drive) — never by library
import, so embedding applications keep control of their own cache policy.
Set ``RST_COMPILE_CACHE`` to relocate the cache directory, or
``RST_COMPILE_CACHE=0`` to disable.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache",
                        "radix_sorting_tpu", "xla-cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the cache dir.

    Idempotent; honors ``RST_COMPILE_CACHE`` (path override, ``0``/empty
    disables). Thresholds are zeroed so even small sort programs cache —
    the workload is a handful of executables, not a training sweep, so disk
    growth is bounded and every hit saves seconds of Mosaic/XLA compile.
    Backends that cannot serialize executables simply miss (JAX logs and
    falls through to a normal compile) — behavior is unchanged, just slower.
    """
    env = os.environ.get("RST_COMPILE_CACHE")
    if env is not None and env in ("", "0", "off"):
        return None
    if env:
        # explicit path = explicit intent: bypass every heuristic below
        pass
    else:
        # TPU-backed processes only (JAX_PLATFORMS unset or naming tpu):
        # the wins are the multi-second Mosaic/XLA:TPU compiles, while
        # XLA:CPU AOT artifacts are machine-feature brittle on reload
        # (observed "+prefer-no-scatter not supported on the host machine
        # ... could lead to SIGILL" when a CPU process reloads another's
        # cache). Checked via env, not jax.default_backend(), so calling
        # this never initializes the runtime (workers call it before
        # jax.distributed.initialize).
        plat = os.environ.get("JAX_PLATFORMS", "")
        if plat and "tpu" not in plat:
            return None
        # The axon TPU tunnel cannot persist executables usefully: measured
        # (round 3) a cache-writing cold CLI first call of 452 s and a
        # cache-reading warm run that exceeded 15 minutes — strictly worse
        # than no cache. Default off under the tunnel (its site dir marks
        # the environment); real TPU runtimes keep the PGO analog.
        import sys
        if any(".axon_site" in p for p in sys.path):
            return None
    path = env or path or _DEFAULT
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
