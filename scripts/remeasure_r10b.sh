#!/bin/bash
# Round-10 second-pass re-measures, serialized (fresh JVM per key):
#   - keys structurally rewritten since the sweep: ecs_flocking,
#     text_langid, src_roundtrip (gzip legs), dedup_lsh_sweep handled
#     separately
#   - noisy-spread keys from the rewritten set, at 3 trials so the
#     warm min is decidable on this slower-disk box: dedup_simhash,
#     knn_hnsw, dedup_embedding
#   - knn_random_projection: the sweep ERR was inherited disk
#     pressure; record a clean solo number
# Usage: scripts/remeasure_r10b.sh <sf10_dir> <sf100_dir> <out_dir>
set -u
SF10="$1"; SF100="$2"; OUTD="$3"
mkdir -p "$OUTD"

OUT10="$OUTD/fixed2_sf10.tsv"; : > "$OUT10"
for K in ecs_flocking text_langid src_roundtrip; do
  echo "[r10b sf10] $K ..." >&2
  scripts/bench_one.sh "$K" "$SF10" 900 2 32 24g >> "$OUT10"
  tail -1 "$OUT10" >&2
done

OUT100="$OUTD/fixed2_sf100.tsv"; : > "$OUT100"
for K in ecs_flocking text_langid src_roundtrip knn_random_projection; do
  echo "[r10b sf100] $K ..." >&2
  scripts/bench_one.sh "$K" "$SF100" 3600 2 32 48g >> "$OUT100"
  tail -1 "$OUT100" >&2
done

OUTN="$OUTD/noisy_sf100.tsv"; : > "$OUTN"
for K in dedup_simhash knn_hnsw dedup_embedding; do
  echo "[r10b noisy sf100] $K ..." >&2
  scripts/bench_one.sh "$K" "$SF100" 3600 3 32 48g >> "$OUTN"
  tail -1 "$OUTN" >&2
done
echo "=== R10B REMEASURE DONE ===" >&2
