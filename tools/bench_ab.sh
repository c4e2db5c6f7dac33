#!/bin/bash
# Interleaved cold A/B closing bench: r6 -> r9entry -> HEAD, 3 rotations.
set -u
OUT=/root/repo/bench_ab_r9s2.jsonl
: > "$OUT"
for round in 1 2 3; do
  for snap in r6 r9entry head; do
    case "$snap" in
      r6) dir=/root/repo/.bench_snapshots/r6 ;;
      r9entry) dir=/root/repo/.bench_snapshots/r9entry ;;
      head) dir=/root/repo ;;
    esac
    cd "$dir"
    line=$(python bench.py 2>/dev/null | tail -1)
    echo "{\"snap\": \"$snap\", \"round\": $round, \"bench\": $line}" >> "$OUT"
  done
done
echo DONE >> "$OUT"
