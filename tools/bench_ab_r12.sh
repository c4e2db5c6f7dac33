#!/bin/bash
# Interleaved cold A/B closing bench: r11-final vs HEAD, 3 rotations,
# per-run BENCH_DETAIL captured for per-query medians.
set -u
OUT=/root/repo/bench_ab_r12.jsonl
DET=/root/repo/.bench_ab_detail
mkdir -p "$DET"
: > "$OUT"
for round in 1 2 3; do
  for snap in r11 head; do
    case "$snap" in
      r11) dir=/root/repo/.bench_snapshots/r11 ;;
      head) dir=/root/repo ;;
    esac
    # unchecked cd would bench HEAD while labeling the line r11 —
    # a fabricated zero-delta A/B. Fail the leg instead.
    cd "$dir" || { echo "missing snapshot dir: $dir" >&2; exit 1; }
    line=$(python bench.py 2>/dev/null | tail -1)
    if [ -z "$line" ]; then
      echo "bench.py produced no output for $snap round $round" >&2
      exit 1
    fi
    echo "{\"snap\": \"$snap\", \"round\": $round, \"bench\": $line}" >> "$OUT"
    cp "$dir/BENCH_DETAIL.json" "$DET/${snap}_r12_${round}.json" 2>/dev/null
  done
done
echo DONE >> "$OUT"
