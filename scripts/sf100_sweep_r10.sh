#!/bin/bash
# Round-10 decade-4 sweep extension: probe the heaviest sf10 keys that
# r9's 13-key top-risk probe did NOT cover, at sf100 (1 trial, fresh
# JVM per key, serialized). sf10 baselines come from the r8 full sweep
# (bench/sf10_probe.json) for unchanged keys; keys rewritten this
# round (dedup_embedding, dedup_simhash, knn_hnsw, knn_graph) are
# re-measured at both scales separately.
#
# Usage: scripts/sf100_sweep_r10.sh <sf100_dir> <out_tsv> [timeout]
set -u
SF100="$1"; OUT="$2"; TMO="${3:-600}"
: > "$OUT"
KEYS=(
  knn_mmr knn_lsh dedup_lsh_sweep stream_ewma_anomaly src_roundtrip
  text_langid text_hash_features knn_random_projection sketch_set_ops
  sketch_bloom_filter text_classifier_score pipeline_contamination
  text_rake_keywords dedup_minhash_est pipeline_quality_calibration
  dedup_corpus_ngram pipeline_token_budget text_bpe_encode
  src_compact_small_files vec_pca_power ecs_flocking pipeline_triangles
)
for K in "${KEYS[@]}"; do
  echo "[sweep] $K ..." >&2
  scripts/bench_one.sh "$K" "$SF100" "$TMO" 1 32 48g >> "$OUT"
  tail -1 "$OUT" >&2
done
