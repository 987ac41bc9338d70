"""Headline benchmark: sort the 40M-u32 dataset on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mkeys/s", "vs_baseline": N, ...}

Baseline: the reference's best steady-state single-core rate on the same
workload — 404.3 M keys/s (i7-8550U, `report/report-i7-8550U-2019-02-10.txt:211`;
see BASELINE.md). The dataset mirrors `make genkeys` (`Makefile:79-82`):
40,000,000 uniform-random u32.

Methodology notes (this environment):
* the axon TPU tunnel adds ~170 ms per dispatch and `block_until_ready` does
  not sync, so the sort is looped K times *inside one jit* with a data
  dependence between iterations, and timing is closed by a host readback —
  the same steady-state style as the reference's Google-benchmark runs
  (`radix_bench.cpp:88-133`).
* keys are generated ON DEVICE (threefry): the round-3 driver capture died
  uploading the 160 MB host dataset through the ~15 MB/s tunnel before the
  first measurement stage (BENCH_r03.json, stage "data on device").
* the result is self-verified like the reference CLI's always-on
  `-DVERIFY_SORT` (`radix_experiment.cpp:208-212`): a full-array ON-DEVICE
  comparison against XLA's independent stable sorter (nothing large crosses
  the tunnel), plus a 1M-key host-side numpy spot check.
* every stage transition is timestamped; the stage history ships in the
  JSON (success or watchdog failure) so a degraded-window capture is
  diagnosable after the fact.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_MKEYS = 404.3  # reference best steady-state, BASELINE.md


def _mark(state: dict, stage: str) -> None:
    state["stage"] = stage
    state["history"].append([stage, round(time.perf_counter()
                                          - state["t0"], 1)])


def _arm_watchdog(budget_s: float, state: dict) -> threading.Timer:
    """Emit ONE labeled JSON line and exit if no result lands in budget_s.

    The axon tunnel has day-long outages where even jax registration hangs
    (ROADMAP "measurement hygiene" 2026-08-17/18); without this the driver's
    round record would be an empty tail. A labeled zero-value record with
    the stage history is an honest, parseable account of the outage. The
    timer is a daemon THREAD (not SIGALRM): a C-level socket wait may never
    return to the interpreter for a signal handler to run.
    """

    def _fire():
        rec = {
            "metric": "sort 40M u32 keys/s/chip",
            "value": 0.0,
            "unit": "Mkeys/s",
            "vs_baseline": 0.0,
            "error": ("watchdog: no result within "
                      f"{budget_s:.0f}s — TPU tunnel unreachable or "
                      f"degraded (stage reached: {state.get('stage')})"),
            "stage_history": state.get("history"),
            "canary_history_ms": state.get("canaries"),
        }
        print(json.dumps(rec), flush=True)
        os._exit(1)

    t = threading.Timer(budget_s, _fire)
    t.daemon = True
    t.start()
    return t


def main() -> int:
    state = {"stage": "startup", "history": [], "canaries": [],
             "t0": time.perf_counter()}
    _mark(state, "startup")
    # 20 min: ample for the real-TPU run (2-4 min steady + compiles + the
    # canary's bounded degraded-window waits) while still beating typical
    # harness timeouts so the labeled line lands in the recorded tail. A
    # full-scale CPU contract run needs it raised (or RST_BENCH_N lowered).
    watchdog = _arm_watchdog(
        float(os.environ.get("RST_BENCH_WATCHDOG_S", "1200")), state)
    # PGO analog: reuse compiled executables across invocations (harmless
    # when the backend cannot serialize; see utils/compile_cache.py)
    from radix_sorting_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import radix_sorting_tpu as rst

    _mark(state, "imports done (tunnel registered)")
    # RST_BENCH_N: test hook for verifying the bench CONTRACT (one JSON
    # line, all fields) off-chip quickly; the driver never sets it, so
    # recorded numbers are always the headline 40M workload.
    n = int(os.environ.get("RST_BENCH_N", 40_000_000))
    # Keys are born IN HBM — uniform u32 via threefry. (The host PCG64
    # dataset of utils.keyfile is bit-reproducible for parity work; for
    # throughput only uniformity matters, and the 160 MB upload was the
    # round-3 single point of failure.)
    x = jax.jit(lambda: jax.random.bits(
        jax.random.PRNGKey(0x5EED), (n,), jnp.uint32))()
    np.asarray(x[-1:])  # materialize before any timing
    _mark(state, "data generated on device")

    # Degraded-window guard: the shared slice has windows where the 74 ms
    # sorter reads 10-25x slow (ROADMAP "measurement hygiene"). A number
    # recorded inside one is meaningless, so gate the measurement on a tiny
    # canary — the 4M sorter steady (healthy < 20 ms; threshold 30 ms allows
    # tenancy jitter) — and wait out bounded stretches of degradation before
    # proceeding regardless (the canary history is recorded either way).
    xc = x[: min(n, 1 << 22)]
    canary = jax.jit(lambda v: lax.fori_loop(
        0, 10, lambda i, c: lax.sort(c) * np.uint32(2654435761)
        + (c[-1] & np.uint32(1)), v))
    np.asarray(canary(xc)[-1:])  # compile + warm
    _mark(state, "canary compiled")

    def canary_probe(max_attempts, sleep_s):
        ms = None
        for attempt in range(max_attempts):
            t0 = time.perf_counter()
            np.asarray(canary(xc)[-1:])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            state["canaries"].append(round(ms, 2))
            if ms < 30.0:
                break
            if attempt < max_attempts - 1:
                time.sleep(sleep_s)
        return ms

    canary_ms = canary_probe(4, 60)
    _mark(state, f"canary {canary_ms:.1f} ms")

    def sort_once(a):
        # the public keys-only path: KDF encode -> unstable hardware sort
        # (exact for keys-only; see hw_engine.sort_words) -> decode
        (w,) = rst.ops.kdf.encode(a)
        (sw,), _ = rst.ops.hw_engine.sort_words((w,), stable=False)
        return rst.ops.kdf.decode((sw,), jnp.uint32)

    # Enough in-jit iterations to amortize the per-call dispatch/readback
    # overhead (~5 ms/sort at K=5 on the tunnel); the reference's
    # google-benchmark runs likewise iterate to steady state.
    K = 20

    @jax.jit
    def steady(a):
        def body(i, carry):
            r = sort_once(carry)
            # Chain iterations through a multiplicative scramble: an odd
            # multiplier is a bijection mod 2^32, so every iteration sorts a
            # fresh uniform-distributed array — the measurement stays honest
            # even if a data-dependent path (e.g. the presorted guard) ever
            # enters the headline engine. (A rotate-by-1 chain would feed
            # nearly-sorted input after iteration 1 — valid only for
            # data-oblivious engines.) Measured on the chip: both chains
            # time identically for the oblivious sorter (71.6 vs 72.0 ms),
            # so the robust form costs nothing.
            return r * np.uint32(2654435761) + (r[-1] & np.uint32(1))
        return lax.fori_loop(0, K, body, a)

    # compile + warm
    r = steady(x)
    np.asarray(r[-1:])
    _mark(state, "headline compiled")

    def measure_headline():
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            rr = steady(x)
            np.asarray(rr[-1:])  # host readback closes the async pipeline
            best = min(best, (time.perf_counter() - t0) / K)
        return best

    # Full-pipeline degraded-window retry (round-3 lesson: one linear
    # attempt is not resilient on a slice with hour-long bad windows).
    # A healthy 40M sort on this part is ~71-75 ms; accept < 4x that,
    # else re-gate on the canary and re-measure, up to 3 rounds.
    dt = None
    for round_i in range(3):
        dt = measure_headline()
        _mark(state, f"headline measured {dt * 1e3:.1f} ms (round {round_i})")
        if n != 40_000_000 or dt < 0.300:
            break
        canary_ms = canary_probe(3, 45)
        _mark(state, f"re-gate canary {canary_ms:.1f} ms")

    # Verification (like -DVERIFY_SORT), nothing large across the tunnel:
    # full-array ON-DEVICE equality against XLA's stable sorter (an
    # independent sorter configuration), closed by a 1-byte readback...
    out = sort_once(x)
    ok_dev = bool(np.asarray(jnp.array_equal(out, jnp.sort(x))))
    # ...plus a 1M-key host numpy spot check (exact, different oracle).
    m = min(n, 1_000_000)
    xs = np.asarray(x[:m])
    ok_host = bool(np.array_equal(np.asarray(sort_once(jnp.asarray(xs))),
                                  np.sort(xs)))
    ok = ok_dev and ok_host
    _mark(state, "verified")

    # secondary showcase rates, same steady-state methodology (recorded as
    # extra keys of the same single JSON line)
    def steady_rate(fn, a, reps):
        # the runtime input must flow through the loop (a closed-over array
        # would be embedded as an HLO constant, inviting constant folding);
        # best-of-2 like the headline loop (shared-slice jitter)
        g = jax.jit(lambda v: lax.fori_loop(0, reps, lambda i, c: fn(c), v))
        r = g(a)
        np.asarray(jnp.ravel(r)[-1:])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = g(a)
            np.asarray(jnp.ravel(r)[-1:])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    from radix_sorting_tpu.ops import counting_engine
    mask = 0xF0F00000
    xm = x & np.uint32(mask)

    def masked_once(c):
        (w,) = rst.ops.kdf.encode(c)
        (s,) = counting_engine.sort_words_counting((w,), (mask,))
        return c ^ (s[0] & np.uint32(1)) ^ np.uint32(1)

    dt_masked = steady_rate(masked_once, xm, 10)
    _mark(state, "masked measured")

    # 16-bit full-domain keys: the windowed-regeneration counting tier
    # (round 2; ops/pallas_kernels.regenerate_windowed_tpu)
    xu16 = (x & np.uint32(0xFFFF)).astype(jnp.uint16)

    def u16_once(c):
        (w,) = rst.ops.kdf.encode(c)
        (s,) = counting_engine.sort_words_counting((w,), (0xFFFF,))
        dep = s[0].astype(jnp.uint16) & np.uint16(1)
        return c ^ dep ^ np.uint16(1)

    dt_u16 = steady_rate(u16_once, xu16, 8)
    _mark(state, "u16 measured")

    ROW = 4096
    xb = x[: (n // ROW) * ROW].reshape(-1, ROW)

    def batched_once(c):
        (s,) = lax.sort((c,), dimension=1, is_stable=False, num_keys=1)
        # consume EVERY row's output so no row sort is dead code
        dep = jnp.bitwise_xor.reduce(s[:, 0]) & np.uint32(1)
        return c ^ dep ^ np.uint32(1)

    dt_batched = steady_rate(batched_once, xb, 10)
    _mark(state, "batched measured")

    # dense group-by tier (round 4): sum of i32 values over 2^10 dense keys
    # — the MXU weighted-histogram route, no sort at all
    from radix_sorting_tpu.extras import group_reduce

    def group_once(c):
        k = c & np.uint32(1023)
        v = (c >> np.uint32(10)).astype(jnp.int32)
        _, red, _ = group_reduce(k, v, reduce="sum", groups=1024, size=1024)
        # consume EVERY group's sum so no part of the reduction is dead code
        dep = jnp.bitwise_xor.reduce(lax.bitcast_convert_type(
            red, jnp.uint32)) & np.uint32(1)
        return c ^ dep ^ np.uint32(1)

    dt_group = steady_rate(group_once, x, 8)
    _mark(state, "group-by measured")

    # Speed-of-light normalization (BASELINE north-star #2): one SAME-PROCESS
    # stream-bandwidth probe, then each case reports its effective GB/s under
    # an explicit minimum-traffic model and the fraction of delivered stream
    # bandwidth it reaches — the bytes/s-next-to-every-row discipline of the
    # reference's counters (`radix_bench.cpp:72-77`).
    from radix_sorting_tpu.utils.timing import stream_gbps
    bw = stream_gbps(x=x)
    _mark(state, f"stream {bw:.1f} GB/s")

    def sol(bytes_min, dt_):
        eff = bytes_min / dt_ / 1e9
        return {"eff_GBps": round(eff, 2),
                "sol_fraction": round(eff / bw, 4)}

    mkeys = n / dt / 1e6
    rec = {
        "metric": "sort 40M u32 keys/s/chip",
        "value": round(mkeys, 1),
        "unit": "Mkeys/s",
        "vs_baseline": round(mkeys / BASELINE_MKEYS, 3),
        "ms_per_sort": round(dt * 1e3, 2),
        "verified_bit_exact": ok,
        "masked_8bit_Mkeys": round(n / dt_masked / 1e6, 1),
        "u16_full_Mkeys": round(n / dt_u16 / 1e6, 1),
        "batched_rows_Mkeys": round(xb.size / dt_batched / 1e6, 1),
        "group_dense_1024_Mrows": round(n / dt_group / 1e6, 1),
        "stream_GBps": round(bw, 1),
        # per-case minimum-traffic models: sorts/counting move one read + one
        # write of the element stream (u16 elements are 2 B); the group-by
        # reads keys+values (8 B/row) and writes only O(G)
        "sol": {
            "headline": dict(traffic="2*4n read+write key stream",
                             **sol(8 * n, dt)),
            "masked_8bit": dict(traffic="2*4n", **sol(8 * n, dt_masked)),
            "u16_full": dict(traffic="2*2n", **sol(4 * n, dt_u16)),
            "batched_rows": dict(traffic="2*4n",
                                 **sol(8 * xb.size, dt_batched)),
            "group_dense_1024": dict(traffic="8n keys+values read",
                                     **sol(8 * n, dt_group)),
        },
        "canary_4M_ms": round(canary_ms, 2),
        "canary_history_ms": state["canaries"],
        "stage_history": state["history"],
        "device": str(jax.devices()[0]),
        "n": n,
    }
    watchdog.cancel()
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
