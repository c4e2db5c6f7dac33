#!/bin/bash
# Interleaved cold A/B for the SECOND r13 session: session-start
# snapshot (fe6bfd5, git worktree) vs HEAD, 3 rotations, per-run
# BENCH_DETAIL captured for per-query medians.
set -u
OUT=/root/repo/bench_ab_r13b.jsonl
DET=/root/repo/.bench_ab_detail_r13b
mkdir -p "$DET"
: > "$OUT"
for round in 1 2 3; do
  for snap in pre head; do
    case "$snap" in
      pre) dir=/root/repo/.bench_snapshots/r13b_pre ;;
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
echo DONE >> "$OUT"
