"""Bit-exact parity check against the ACTUAL compiled reference implementation.

Builds nothing itself — expects `parity/ref_driver` (see `make parity-driver`),
a thin dump harness around the reference's own `radix_sort` /
`radix_sort_rank` templates (`radix_sort.hpp:98-115`,
`radix_sort_rank.hpp:97-112`, included from the reference checkout at build
time). For every case the SAME raw bytes of the 40M key file are sorted by
both sides and compared byte-for-byte:

  * value sorts: all 8 reference CLI types (u8 u16 u32 u64 i32 i64 f32 f64,
    `radix_experiment.cpp:264-279`) x {no mask, 0xF0F00000} x {fwd, rev}
  * rank sorts: stable argsort permutations, all 8 types x {fwd, rev} —
    u32 fwd byte-exact vs the compiled C LISTING (`radix_sort_u32_ranks.c`),
    every case vs the unique-stable-permutation characterization (keys[perm]
    == reference value sort AND ascending indices within equal-key runs).
    The generic C++ rank kernel is NOT used as an oracle: it is broken for
    multi-byte keys (found by this harness; see PARITY.md), which this
    script re-confirms mechanically each run.

Any mismatch exits nonzero (this is BASELINE.md target #1, demonstrated
rather than claimed via proxy oracles).

Usage:
  python scripts/parity_check.py [--n N] [--quick] [--types u32,f64,...]
  make parity-check            # full run
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
DRIVER = REPO / "parity" / "ref_driver"
MASK = 0xF0F00000

TYPES = {
    "u8": np.uint8, "u16": np.uint16, "u32": np.uint32, "u64": np.uint64,
    "i32": np.int32, "i64": np.int64, "f32": np.float32, "f64": np.float64,
}


def _load(keyfile: Path, tname: str, n: int, mask) -> np.ndarray:
    dt = np.dtype(TYPES[tname])
    raw = np.fromfile(keyfile, dtype=np.uint8, count=n * dt.itemsize)
    if raw.size < n * dt.itemsize:
        raise SystemExit(f"keyfile too small for {n} x {tname}")
    x = raw.view(dt)
    if mask is not None:
        # the reference's 64-bit memcpy mangle (`radix_experiment.cpp:188-198`)
        u = x.view(np.dtype(f"u{dt.itemsize}"))
        m = mask & ((1 << (8 * dt.itemsize)) - 1)  # the u64 mangle truncates
        x = (u & np.dtype(f"u{dt.itemsize}").type(m)).view(dt)
    return x


def _ref_run(keyfile: Path, out: Path, n: int, tname: str, mask, rev: bool,
             rank) -> np.ndarray:
    mode = rank if isinstance(rank, str) else ("rank" if rank else "sort")
    cmd = [str(DRIVER), str(keyfile), str(out), str(n), tname,
           f"{mask:X}" if mask is not None else "-",
           "rev" if rev else "fwd", mode]
    subprocess.run(cmd, check=True)
    dt = TYPES[tname] if mode == "sort" else np.uint32
    return np.fromfile(out, dtype=dt, count=n)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None,
                    help="elements per case (default: fill the key file, "
                         "40M for 32-bit types)")
    ap.add_argument("--quick", action="store_true", help="n=200_000 smoke run")
    ap.add_argument("--types", default=",".join(TYPES),
                    help="comma-separated subset of types")
    ap.add_argument("--rank-n", type=int, default=None,
                    help="elements per rank case (default: same as --n)")
    args = ap.parse_args()

    if not DRIVER.exists():
        raise SystemExit(
            f"{DRIVER} not built. Run `make parity-driver` "
            "(requires the reference checkout for its headers)")

    import jax.numpy as jnp
    import radix_sorting_tpu as rst
    from radix_sorting_tpu.utils import keyfile as kf

    keyfile = kf.default_keyfile()
    if not keyfile.exists():
        kf.write_keyfile(keyfile, kf.generate_keys())
    file_bytes = keyfile.stat().st_size

    tnames = [t for t in args.types.split(",") if t]
    for t in tnames:
        if t not in TYPES:
            raise SystemExit(f"unknown type {t!r}")

    failures = []
    cases = 0
    t_start = time.time()
    with tempfile.TemporaryDirectory() as td:
        out = Path(td) / "ref.bin"
        for tname in tnames:
            itemsize = np.dtype(TYPES[tname]).itemsize
            n = args.n or (200_000 if args.quick else file_bytes // itemsize)
            n = min(n, file_bytes // itemsize, 40_000_000)
            rank_n = min(args.rank_n or n, n)

            for mask in (None, MASK):
                x = _load(keyfile, tname, n, mask)
                # the framework takes the mask at the key's width (for u8 the
                # truncated mask is 0 — a legitimate all-equal degenerate case)
                vm = None if mask is None else mask & ((1 << (8 * itemsize)) - 1)
                for rev in (False, True):
                    cases += 1
                    ref = _ref_run(keyfile, out, n, tname, mask, rev, rank=False)
                    cfg = rst.SortConfig(descending=rev)
                    mine = np.asarray(rst.sort(
                        x if itemsize == 8 else jnp.asarray(x),
                        config=cfg, value_mask=vm))
                    tag = f"sort {tname} n={n} mask={mask and hex(mask)} rev={rev}"
                    if not np.array_equal(mine.view(np.uint8), ref.view(np.uint8)):
                        bad = int(np.flatnonzero(
                            mine.view(f"u{itemsize}") != ref.view(f"u{itemsize}"))[0])
                        failures.append(f"{tag}: first mismatch at [{bad}]: "
                                        f"mine={mine[bad]!r} ref={ref[bad]!r}")
                        print(f"FAIL {tag}", flush=True)
                    else:
                        print(f"ok   {tag}", flush=True)

            # Rank parity. The reference's generic C++ rank kernel
            # (`radix_sort_rank.hpp:80-89`) is BROKEN for multi-byte keys —
            # every pass reads `src[j]` in ORIGINAL order while permuting the
            # index buffer, so stability chaining collapses and the output
            # permutation does not even sort the data (its only test,
            # `radix_tests.cpp:71-105`, uses u8 keys = exactly one pass; the
            # header itself says "DO NOT USE IN PRODUCTION"). The CORRECT
            # reference rank semantics live in the C listing
            # (`radix_sort_u32_ranks.c:38-110`, keys read through the
            # indirection). So rank parity is checked two ways:
            #   1. u32 fwd: byte-exact vs the compiled C listing (`rankc`).
            #   2. every type/order: the unique-stable-permutation
            #      characterization — keys[perm] must equal the reference's
            #      value-sort dump byte-for-byte AND indices must ascend
            #      within every bitwise-equal key run. Those two properties
            #      determine the stable permutation uniquely.
            x = _load(keyfile, tname, rank_n, None)
            xu = x.view(np.dtype(f"u{itemsize}"))
            for rev in (False, True):
                cases += 1
                cfg = rst.SortConfig(descending=rev)
                mine = np.asarray(rst.argsort(
                    x if itemsize == 8 else jnp.asarray(x),
                    config=cfg)).astype(np.uint32)
                tag = f"rank {tname} n={rank_n} rev={rev}"
                probs = []
                if tname == "u32" and not rev:
                    ref = _ref_run(keyfile, out, rank_n, tname, None, rev,
                                   rank="rankc")
                    if not np.array_equal(mine, ref):
                        probs.append("differs from the C listing rank sort")
                ref_vals = _ref_run(keyfile, out, rank_n, tname, None, rev,
                                    rank=False)
                applied = xu[mine]
                if not np.array_equal(applied, ref_vals.view(f"u{itemsize}")):
                    probs.append("keys[perm] != reference value sort")
                runs = applied[1:] == applied[:-1]
                if not bool(np.all(mine[1:][runs] > mine[:-1][runs])):
                    probs.append("indices not ascending within equal-key runs")
                if probs:
                    failures.append(f"{tag}: " + "; ".join(probs))
                    print(f"FAIL {tag}", flush=True)
                else:
                    print(f"ok   {tag}", flush=True)

        # Re-confirm the reference C++ rank-kernel bug mechanically (so the
        # claim in PARITY.md stays tied to a reproducible check): its u32
        # permutation must NOT sort the keys (if a fixed reference ever makes
        # it sort, this harness flags it so the oracle choice is revisited).
        nbug = min(200_000, file_bytes // 4)
        kbug = _load(keyfile, "u32", nbug, None)
        pbug = _ref_run(keyfile, out, nbug, "u32", None, False, rank="rank")
        applied = kbug[pbug]
        cpp_rank_bug = not bool(np.all(applied[:-1] <= applied[1:]))
        if not cpp_rank_bug:
            failures.append(
                "reference C++ rank kernel sorted u32 correctly — the "
                "documented multi-byte bug no longer reproduces; re-point "
                "the rank oracle at it")

    rec = {
        "parity_cases": cases,
        "failures": len(failures),
        "elapsed_s": round(time.time() - t_start, 1),
        "bit_exact": not failures,
        "ref_cpp_rank_kernel_bug_reproduced": cpp_rank_bug,
    }
    print(json.dumps(rec))
    for f in failures:
        print("FAILURE:", f, file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
