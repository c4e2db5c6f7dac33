#!/bin/bash
# Interleaved A/B for the r13 post-GC settle (SPARK_GRAFT_BENCH_SETTLE):
# ON vs OFF on HEAD, full bench each leg, per-run BENCH_DETAIL captured.
set -u
OUT=/root/repo/bench_ab_settle.jsonl
DET=/root/repo/.bench_ab_settle
mkdir -p "$DET"
: > "$OUT"
cd /root/repo || exit 1
for round in 1 2 3; do
  for leg in on off; do
    case "$leg" in
      on) export SPARK_GRAFT_BENCH_SETTLE=1 ;;
      off) export SPARK_GRAFT_BENCH_SETTLE=0 ;;
    esac
    line=$(python bench.py 2>/dev/null | tail -1)
    if [ -z "$line" ]; then
      echo "bench.py produced no output for $leg round $round" >&2
      exit 1
    fi
    echo "{\"leg\": \"$leg\", \"round\": $round, \"bench\": $line}" >> "$OUT"
    cp /root/repo/BENCH_DETAIL.json "$DET/${leg}_${round}.json" 2>/dev/null
  done
done
echo DONE >> "$OUT"
