"""End-to-end bit-exact parity vs the COMPILED reference implementation.

Runs `scripts/parity_check.py` (see its docstring) at a small n as part of
the regular suite, so BASELINE.md target #1 — byte-identical output vs the
actual reference `radix_sort` — is continuously demonstrated, not a one-time
claim. Skips cleanly when the reference checkout or a C++ toolchain is
absent (e.g. bare CI runners); the full-size run is `make parity-check`.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
REF = Path(os.environ.get("REF", "/root/reference"))
DRIVER_SRC = REPO / "parity" / "ref_driver.cpp"
DRIVER = REPO / "parity" / "ref_driver"


def _ensure_driver():
    # The driver compiles (and the tests then execute) code from the
    # third-party reference checkout. That is the entire point of the parity
    # harness, but dev machines that don't want pytest silently building
    # foreign code can opt out with RST_PARITY=0 (round-2 advisor note).
    if os.environ.get("RST_PARITY") == "0":
        pytest.skip("parity harness disabled (RST_PARITY=0)")
    # staleness must account for the REFERENCE sources the driver textually
    # #includes, not just the driver .cpp — a changed reference checkout
    # would otherwise byte-compare against a binary of the OLD reference
    dep_mtimes = [DRIVER_SRC.stat().st_mtime]
    dep_mtimes += [p.stat().st_mtime
                   for pat in ("*.hpp", "*.h", "*.c")
                   for p in REF.glob(pat)]
    if DRIVER.exists() and DRIVER.stat().st_mtime >= max(dep_mtimes):
        return
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ toolchain")
    if not (REF / "radix_sort.hpp").exists():
        pytest.skip(f"reference checkout not found at {REF}")
    subprocess.run(
        [gxx, "-O2", "-std=gnu++17", "-fpermissive", f"-I{REF}",
         str(DRIVER_SRC), "-o", str(DRIVER)],
        check=True)


def test_parity_quick():
    _ensure_driver()
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "parity_check.py"),
         "--n", "60000"],
        capture_output=True, text=True, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["bit_exact"] is True
    assert rec["failures"] == 0
    # the reference C++ rank kernel's multi-byte bug must still reproduce
    # (otherwise the oracle choice in parity_check.py needs revisiting)
    assert rec["ref_cpp_rank_kernel_bug_reproduced"] is True
