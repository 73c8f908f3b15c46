#!/bin/sh
# Batch-shape curve: sequential bench.py runs at several batch sizes.
# Run under nohup; one TPU client at a time; never kill mid-compile
# (the axon relay wedges for ~an hour if you do).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/batch_curve.jsonl}
: > "$OUT"
for B in 32 8; do
    echo "=== batch=$B start $(date -u +%H:%M:%S) ===" >> "$OUT"
    timeout 2400 python -u bench.py --batch "$B" --iters 10 \
        --watchdog-sec 2100 >> "$OUT" 2>/tmp/batch_curve_b$B.err
    echo "=== batch=$B exit=$? $(date -u +%H:%M:%S) ===" >> "$OUT"
done
echo "=== sweep done $(date -u +%H:%M:%S) ===" >> "$OUT"
