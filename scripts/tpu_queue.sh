#!/bin/bash
# Queued TPU verification battery — run when the axon tunnel recovers.
# One command, ordered cheapest-first, each step logged; safe to re-run.
#
#   bash scripts/tpu_queue.sh [logdir]
#
# Round-4 queue (see ROADMAP "round-4 on-chip verification"):
#   0. canary health gate (abort early if the slice is degraded)
#   1. drive_tpu.py — all surfaces (incl. the dense group tier + chunked
#      searchsorted), host-oracle verified
#   2. exp_group_reduce.py — dense_shipped vs sort_native (the >=7x claim)
#   3. bench_suite.py --stages — per-stage timing artifact into report/
#   4. exp_small_n.py — columnsort vs flat at 64k..4M (quadrant attack)
#   5. exp_sol_probe.py + exp_sol_round2.py — same-day SoL constants so
#      every refutation cites current ratios
#   6. on-chip dtype suites (float8/bfloat16/int4 + extras)
#   7. bench.py — headline JSON (has its own canary gate)
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
QTO=3600 step groupred python scripts/exp_group_reduce.py
QTO=2400 step stages   python bench_suite.py --stages --out report
QTO=3600 step smalln   python scripts/exp_small_n.py
QTO=3600 step ssorted  python scripts/exp_searchsorted.py
QTO=2400 step solprobe python scripts/exp_sol_probe.py
QTO=3600 step solr2    python scripts/exp_sol_round2.py
QTO=2400 step dtypes env RST_TEST_PLATFORM=axon \
    python -m pytest tests/test_sort.py tests/test_kdf.py \
    tests/test_extras.py tests/test_records_rank.py tests/test_sets.py \
    tests/test_stats.py \
    -q -p no:cacheprovider -k \
    "float8 or bfloat16 or int4 or searchsorted or bincount or bytes_payload or unique or isin or setops or group_reduce or rankdata or quantile or histogram or digitize" \
    || true
QTO=2400 step bench    python bench.py

echo "== done; summaries:"
for f in "$LOG"/*.log; do echo "-- $f"; tail -3 "$f"; done
