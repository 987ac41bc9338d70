"""Device-profile artifact: op-level ms table for the headline 40M sort.

Round-4 VERDICT item 7: the stages JSON is wall-clock prefix differencing;
this script captures a REAL device trace (`utils.timing.trace` →
jax.profiler perfetto output) of the headline sort and the masked counting
tier, reduces each to an op-level table (`utils.timing.device_op_table`),
and writes a dated report — the TPU counterpart of the perf-stat sections
the reference archives with every report (`bench.sh:14-17`,
`report/report-i7-6700k-2019-02-15.txt`).

Run: PYTHONPATH="/root/.axon_site:/root/repo" python scripts/profile_headline.py [n]
"""

import datetime
import json
import platform
import shutil
import subprocess
import sys

import numpy as np


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    K = 5

    import jax
    import jax.numpy as jnp
    from jax import lax

    from radix_sorting_tpu.ops import counting_engine, hw_engine, kdf
    from radix_sorting_tpu.utils.timing import device_op_table, trace

    x = jax.jit(lambda: jax.random.bits(
        jax.random.PRNGKey(0x5EED), (n,), jnp.uint32))()
    np.asarray(x[-1:])
    print(json.dumps({"device": str(jax.devices()[0]), "n": n, "reps": K}),
          flush=True)

    def headline(a):
        def body(i, c):
            (w,) = kdf.encode(c)
            (sw,), _ = hw_engine.sort_words((w,), stable=False)
            r = kdf.decode((sw,), jnp.uint32)
            return r * np.uint32(2654435761) + (r[-1] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    mask = 0xF0F00000

    def masked(a):
        def body(i, c):
            cm = c & np.uint32(mask)
            (s,) = counting_engine.sort_words_counting((cm,), (mask,))
            return c * np.uint32(2654435761) + (s[-1] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    sections = {}
    for name, fn in (("headline_u32_sort", headline),
                     ("counting_masked_8bit", masked)):
        g = jax.jit(fn)
        np.asarray(g(x)[-1:])  # compile + warm OUTSIDE the trace
        logdir = f"/tmp/rst-prof-{name}"
        shutil.rmtree(logdir, ignore_errors=True)
        with trace(logdir):
            np.asarray(g(x)[-1:])
        rows = device_op_table(logdir)
        for r in rows:
            r["us_per_sort"] = round(r["total_us"] / K, 1)
        sections[name] = rows[:20]
        print(json.dumps({"section": name,
                          "top_ops": [(r["op"], r["us_per_sort"])
                                      for r in rows[:6]]}), flush=True)

    sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True,
                         cwd="/root/repo").stdout.strip() or "nogit"
    dev = str(jax.devices()[0]).replace(" ", "-")
    path = (f"report/profile-{dev}-"
            f"{datetime.date.today().isoformat()}-{sha}.json")
    with open(f"/root/repo/{path}", "w") as f:
        json.dump({"uname": platform.uname()._asdict(), "sha": sha,
                   "device": str(jax.devices()[0]), "jax": jax.__version__,
                   "n": n, "reps_per_trace": K,
                   "note": ("op durations are device-side 'XLA Ops' thread "
                            "totals per trace; us_per_sort divides by the "
                            f"{K} in-trace iterations"),
                   "sections": sections}, f, indent=2)
    print(f"# wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
