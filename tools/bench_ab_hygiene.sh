#!/bin/bash
# A/B the inter-query hygiene flag (SPARK_GRAFT_BENCH_HYGIENE) on HEAD:
# 3 interleaved rotations of hygiene OFF (r11 loop reproduced exactly)
# vs ON (default). Measures whether releasing leaked cross-query state
# between timed regions changes totals and tail variance (guide §5).
set -u
OUT=/root/repo/bench_ab_hygiene.jsonl
DET=/root/repo/.bench_ab_hygiene
mkdir -p "$DET"
cd /root/repo || exit 1
for round in 1 2 3; do
  for leg in off on; do
    case "$leg" in
      off) export SPARK_GRAFT_BENCH_HYGIENE=0 ;;
      on) export SPARK_GRAFT_BENCH_HYGIENE=1 ;;
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
echo DONEHYG >> "$OUT"
