package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable cores of the inferential-statistics operators (B77/B80/
  * B78/B87). Factored out so a spec can drive each formula on PLANTED
  * data with hand-computed expected values — the DuckDB oracle replays
  * the same algebra as the query, so a shared formula bug would pass
  * the gate; an independent planted answer breaks that symmetry
  * (StatsSpec).
  *
  * All cores keep the operator's scale shape: exact-integer
  * sufficient statistics ride tiny frames; doubles appear only in the
  * final closed forms.
  */
object StatTests {

  /** Mann-Whitney U with tie correction. Input: one row per
    * observation with `in_a` (1 = group A, 0 = group B) and an exact
    * integer `v`. The per-VALUE rank algebra rides
    * [[DistributedPrefixSum]] (one row per distinct value — no
    * single-partition window). Output (1 row): n1, n2, u1, z.
    */
  def mannWhitney(obs: DataFrame): DataFrame = {
    val byVal = obs.groupBy(col("v"))
      .agg(count(lit(1)).as("t"), sum(col("in_a")).as("tr"))
    val cum = DistributedPrefixSum
      .withRunningTotal(byVal, col("t"), "cum_incl", col("v"))
      .withColumn("cum_less", col("cum_incl") - col("t"))
    cum.agg(
      sum(col("tr")).as("n1"),
      sum(col("t") - col("tr")).as("n2"),
      sum(col("tr") * (lit(2) * col("cum_less") + col("t") + 1)).as("r1x2"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("u1", (col("r1x2") - col("n1") * (col("n1") + 1)) / 2.0)
      .withColumn("mu", col("n1").cast("double") * col("n2") / 2.0)
      .withColumn("var_u",
        col("n1").cast("double") * col("n2") / 12.0 *
          ((col("n") + lit(1.0)) -
            col("tie3").cast("double") / (col("n") * (col("n") - lit(1.0)))))
      .withColumn("z", (col("u1") - col("mu")) / sqrt(col("var_u")))
      .select(col("n1"), col("n2"), col("u1"), col("z"))
  }

  /** Kaplan-Meier estimate. Input: one row per subject with integer
    * lifetime `t` and `event` (1 = event observed, 0 = censored).
    * Output per distinct t: n_at_risk, d, censored, s_km (ordered
    * left-fold product — the t-frame is bounded by the lifetime span,
    * so its windows are safe at any subject count).
    */
  def kaplanMeier(subjects: DataFrame): DataFrame = {
    val km = subjects.groupBy(col("t"))
      .agg(sum(col("event")).as("d"),
        sum(lit(1L) - col("event")).as("censored"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km
      .withColumn("n_at_risk", sum(col("d") + col("censored")).over(wRisk))
      .withColumn("factor",
        lit(1.0) - col("d").cast("double") / col("n_at_risk"))
      .withColumn("fs", collect_list(col("factor")).over(wCum))
      .withColumn("s_km",
        expr("aggregate(fs, CAST(1.0 AS DOUBLE), (a, x) -> a * x)"))
      .select(col("t"), col("n_at_risk"), col("d"), col("censored"),
        col("s_km"))
  }

  /** Chi-square independence over a contingency frame. Input: one row
    * per cell (rk, ck, observed). Output per cell: expected, contrib,
    * chi2 (total, repeated), df.
    */
  def chiSquare(cells: DataFrame): DataFrame = {
    val rowT = cells.groupBy(col("rk")).agg(sum(col("observed")).as("row_tot"))
    val colT = cells.groupBy(col("ck")).agg(sum(col("observed")).as("col_tot"))
    val tot = cells.agg(sum(col("observed")).as("n"),
      countDistinct(col("rk")).as("r"), countDistinct(col("ck")).as("c"))
    val scored = cells
      .join(broadcast(rowT), Seq("rk"))
      .join(broadcast(colT), Seq("ck"))
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        col("row_tot").cast("double") * col("col_tot") / col("n"))
      .withColumn("contrib",
        pow(col("observed") - col("expected"), 2) / col("expected"))
    val chi2 = scored.agg(round(sum(col("contrib")), 4).as("chi2"))
    scored.crossJoin(broadcast(chi2))
      .select(col("rk"), col("ck"), col("observed"), col("expected"),
        col("contrib"), col("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("df"))
  }

  /** Wald-Wolfowitz runs test per group. Input: one row per
    * observation with `grp`, ordering columns, and `above` (1/0).
    * Output per grp: n1, n2, runs, mu, z.
    */
  def runsTest(obs: DataFrame, ord: Seq[Column]): DataFrame = {
    val wSeq = Window.partitionBy(col("grp")).orderBy(ord: _*)
    val runs = obs
      .withColumn("prev", lag(col("above"), 1).over(wSeq))
      .withColumn("new_run",
        when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L))
    runs.groupBy(col("grp"))
      .agg(sum(col("above")).as("n1"),
        sum(lit(1L) - col("above")).as("n2"),
        sum(col("new_run")).as("runs"))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("mu", lit(2.0) * col("n1") * col("n2") / col("n") + 1.0)
      .withColumn("var_r",
        (col("mu") - 1.0) * (col("mu") - 2.0) / (col("n") - 1.0))
      .withColumn("z", (col("runs") - col("mu")) / sqrt(col("var_r")))
      .select(col("grp"), col("n1"), col("n2"), col("runs"), col("mu"),
        col("z"))
  }
}
