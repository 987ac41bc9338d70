#!/bin/bash
# Queued TPU verification battery — run when the axon tunnel recovers.
# One command, ordered cheapest-first, each step logged; safe to re-run.
#
#   bash scripts/tpu_queue.sh [logdir]
#
# Steps (see memory ledger / ROADMAP "round-3 on-chip verification"):
#   0. canary health gate (abort early if the slice is degraded)
#   1. drive_tpu.py — all 27 surfaces, host-oracle verified
#   2. exp_device_probe.py — u64 probe numbers (pending since mid round 3)
#   3. exp_searchsorted.py — method-default numbers for ROADMAP
#   4. on-chip dtype suites (float8/bfloat16/int4 + extras incl. bincount)
#   5. bench.py — headline JSON (has its own canary gate)
set -u
LOG=${1:-/tmp/tpu_queue_$(date +%Y%m%d_%H%M%S)}
mkdir -p "$LOG"
export PYTHONPATH="/root/.axon_site:/root/repo"
cd /root/repo

step() {
  name=$1; shift
  echo "== $name ($(date +%H:%M:%S)) -> $LOG/$name.log"
  timeout "$QTO" "$@" >"$LOG/$name.log" 2>&1
  rc=$?
  echo "   exit=$rc"
  return $rc
}

QTO=420 step canary python scripts/exp_sol_probe.py --canary || {
  echo "slice unhealthy/unreachable — stopping (logs in $LOG)"; exit 1; }

QTO=2400 step drive    python scripts/drive_tpu.py
QTO=3600 step probe64  python scripts/exp_device_probe.py
QTO=3600 step ssorted  python scripts/exp_searchsorted.py
QTO=3600 step groupred python scripts/exp_group_reduce.py
QTO=2400 RST_TEST_PLATFORM=axon step dtypes \
    python -m pytest tests/test_sort.py tests/test_kdf.py \
    tests/test_extras.py tests/test_records_rank.py tests/test_sets.py \
    tests/test_stats.py \
    -q -p no:cacheprovider -k \
    "float8 or bfloat16 or int4 or searchsorted or bincount or bytes_payload or unique or isin or setops or group_reduce or rankdata or quantile or histogram or digitize" \
    || true
QTO=2400 step bench    python bench.py

echo "== done; summaries:"
for f in "$LOG"/*.log; do echo "-- $f"; tail -3 "$f"; done
