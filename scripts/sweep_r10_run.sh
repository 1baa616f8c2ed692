#!/bin/bash
# Round-10 decade-4 sweep driver (VERDICT r9 ask #2): one serialized
# pass that (a) re-measures the four keys structurally rewritten this
# round at both scales, then (b) probes the 22 heaviest previously
# uncovered sf10 keys at sf10 + sf100. Fresh JVM per key, clean
# serialized protocol (the r9 lesson: a key probed after another
# key's disk blow-up inherits its writeback pressure).
#
# Usage: scripts/sweep_r10_run.sh <sf10_dir> <sf100_dir> <out_dir>
set -u
SF10="$1"; SF100="$2"; OUTD="$3"
mkdir -p "$OUTD"

REWRITTEN="dedup_embedding,dedup_simhash,knn_hnsw,knn_graph"
NEW_KEYS=(
  knn_mmr knn_lsh dedup_lsh_sweep stream_ewma_anomaly src_roundtrip
  text_langid text_hash_features knn_random_projection sketch_set_ops
  sketch_bloom_filter text_classifier_score pipeline_contamination
  text_rake_keywords dedup_minhash_est pipeline_quality_calibration
  dedup_corpus_ngram pipeline_token_budget text_bpe_encode
  src_compact_small_files vec_pca_power ecs_flocking pipeline_triangles
)

# (a) rewritten keys: 2 trials at each scale (warm-min decidability —
# these four carry round-over-round claims).
IFS=',' read -ra RARR <<< "$REWRITTEN"
for SCALE in sf10 sf100; do
  if [ "$SCALE" = "sf10" ]; then DIR="$SF10"; TMO=900; XMX=24g; else DIR="$SF100"; TMO=3600; XMX=48g; fi
  ROUT="$OUTD/rewritten_${SCALE}.tsv"; : > "$ROUT"
  for K in "${RARR[@]}"; do
    echo "[rewritten $SCALE] $K ..." >&2
    scripts/bench_one.sh "$K" "$DIR" "$TMO" 2 32 "$XMX" >> "$ROUT"
    tail -1 "$ROUT" >&2
  done
done

# (b) the 22-key extension: sf10 first (fresh baselines on this code +
# layout — the r8 numbers predate the r9/r10 rewrites of shared paths),
# then sf100.
OUT10="$OUTD/new_sf10.tsv"; : > "$OUT10"
for K in "${NEW_KEYS[@]}"; do
  echo "[sweep sf10] $K ..." >&2
  scripts/bench_one.sh "$K" "$SF10" 900 1 32 24g >> "$OUT10"
  tail -1 "$OUT10" >&2
done
OUT100="$OUTD/new_sf100.tsv"; : > "$OUT100"
for K in "${NEW_KEYS[@]}"; do
  echo "[sweep sf100] $K ..." >&2
  scripts/bench_one.sh "$K" "$SF100" 1800 1 32 48g >> "$OUT100"
  tail -1 "$OUT100" >&2
done
echo "=== SWEEP DONE ===" >&2
