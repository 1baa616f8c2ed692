#!/bin/bash
# Decade-4 scaling probe (VERDICT r8 ask #3): run the top-risk keys
# at sf10 and sf100 (1 trial each, fresh JVM per key, serialized so
# local[32] is never shared) and emit a TSV per scale.
#
# Usage: scripts/sf100_probe.sh <keys_csv> <sf10_dir> <sf100_dir> <out_prefix>
set -u
KEYS="$1"; SF10="$2"; SF100="$3"; PREFIX="$4"
IFS=',' read -ra KARR <<< "$KEYS"

for SCALE in sf10 sf100; do
  if [ "$SCALE" = "sf10" ]; then DIR="$SF10"; TMO=900; XMX=24g; else DIR="$SF100"; TMO=3600; XMX=48g; fi
  OUT="${PREFIX}_${SCALE}.tsv"; : > "$OUT"
  for K in "${KARR[@]}"; do
    echo "[probe] $SCALE $K ..." >&2
    scripts/bench_one.sh "$K" "$DIR" "$TMO" 1 32 "$XMX" >> "$OUT"
    tail -1 "$OUT" >&2
  done
done
