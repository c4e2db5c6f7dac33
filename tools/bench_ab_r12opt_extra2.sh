#!/bin/bash
# Rounds 7-9 of the r12-opt closing A/B: rotations 3 and 5 head legs were
# contaminated by concurrent session activity (278 s / 253 s vs 154-163 s
# for the clean rotations); these run on a verified-idle box (no other
# Spark or Python processes) and APPEND to the record.
set -u
OUT=/root/repo/bench_ab_r12opt.jsonl
DET=/root/repo/.bench_ab_detail_opt
for round in 7 8 9; do
  for snap in pre head; do
    case "$snap" in
      pre) dir=/root/repo/.bench_snapshots/r12pre ;;
      head) dir=/root/repo ;;
    esac
    cd "$dir" || { echo "missing snapshot dir: $dir" >&2; exit 1; }
    line=$(python bench.py 2>/dev/null | tail -1)
    if [ -z "$line" ]; then
      echo "bench.py produced no output for $snap round $round" >&2
      exit 1
    fi
    echo "{\"snap\": \"$snap\", \"round\": $round, \"bench\": $line}" >> "$OUT"
    cp "$dir/BENCH_DETAIL.json" "$DET/${snap}_${round}.json" 2>/dev/null
  done
done
echo DONE3 >> "$OUT"
