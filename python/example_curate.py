"""An LLM training-data CURATION chain on the graft Python on-ramp
(VERDICT r8 ask #8: the pipeline surface from Python, not just the
ECS toy): exact dedup (C1) -> text quality gates (E2) -> token-budget
selection, composed as PySpark joins between registry operators and
user code, with per-stage accounting — the J28 cascade shape driven
from Python. Every stage is a JVM-side Catalyst plan; Python only
declares the composition (no per-row Python anywhere).

Run (from the repo root, after `sbt compile` or `sbt package`):

    python3 python/example_curate.py [sf_dir]
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graft import run_query, session
from pyspark.sql import functions as F


def find_classpath(root):
    jars = sorted(j for j in glob.glob(os.path.join(root, "target/scala-2.13/*.jar"))
                  if "-tests" not in j)
    classes = os.path.join(root, "target/scala-2.13/classes")
    return jars[-1] if jars else classes


def curate(spark, sf_dir, token_budget=20000):
    """dedup -> quality gate -> budgeted selection; returns
    (selected DataFrame, per-stage accounting list of (stage, rows))."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    stages = [("raw", docs.count())]

    # C1 exact dedup: keep one representative per content hash
    reps = run_query(spark, "dedup_exact", sf_dir) \
        .select(F.col("keep_id").alias("doc_id"))
    deduped = docs.join(reps, "doc_id")
    stages.append(("dedup_exact", deduped.count()))

    # E2 quality gates: the engine's own length/punct/stopword scoring
    quality = run_query(spark, "text_quality", sf_dir)
    gated = deduped.join(
        quality.filter(F.col("quality_flag") == 1)
        .select("doc_id", "n_words_approx"),
        "doc_id")
    stages.append(("quality_gate", gated.count()))

    # token-budget selection: longest-first greedy under the budget —
    # a running sum over one ordered window, the J4 shape
    from pyspark.sql import Window
    w = (Window.orderBy(F.col("n_words_approx").desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    selected = (gated
                .withColumn("cum_tokens", F.sum("n_words_approx").over(w))
                .filter(F.col("cum_tokens") <= token_budget)
                .select("doc_id", "lang", "n_words_approx", "cum_tokens"))
    stages.append(("token_budget", selected.count()))
    return selected, stages


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = session(jar=find_classpath(root), app_name="graft-example-curate")
    spark.sparkContext.setLogLevel("WARN")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    selected, stages = curate(spark, sf_dir)
    for name, n in stages:
        print(f"[curate] {name:>14}: {n} docs")
    kept_tokens = selected.agg(F.sum("n_words_approx")).collect()[0][0]
    print(f"[curate] selected {stages[-1][1]} docs, {kept_tokens} tokens")

    # funnel sanity: monotone non-increasing, budget respected
    counts = [n for _, n in stages]
    assert counts == sorted(counts, reverse=True), counts
    assert kept_tokens <= 20000, kept_tokens

    # the engine's own multi-stage cascade (J28) over the same corpus,
    # for comparison — per-stage survival accounting computed JVM-side
    print("[curate] engine cascade (pipeline_cascade):")
    for row in run_query(spark, "pipeline_cascade", sf_dir).collect():
        print(f"[curate]   {row.asDict()}")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
