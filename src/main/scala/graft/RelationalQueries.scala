package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational/analytical operator suite (SURVEY §2.B) over the
  * TPC-H-ish tables. Declarative DataFrame plans — Catalyst handles
  * predicate pushdown, column pruning and join selection; small dims
  * are broadcast explicitly. Float parity protocol: see SURVEY §5.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  // B1 — groupBy multi-aggregate pricing summary (TPC-H Q1 shape).
  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 2) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      | round(avg(l_quantity), 4) AS avg_qty,
      | round(avg(l_extendedprice), 4) AS avg_price,
      | round(avg(l_discount), 4) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // B2 — selective filter + narrow projection (scan pushdown).
  private def q2Filter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_size").between(10, 30) && col("p_type") === "ECONOMY")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))

  private val q2Sql =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_size BETWEEN 10 AND 30 AND p_type = 'ECONOMY'
      |ORDER BY p_partkey""".stripMargin

  // B3 — fact⋈fact⋈dim + agg + deterministic top-k (TPC-H Q3 shape).
  private def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders").filter(col("o_orderdate") < ts("1998-01-01"))
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") > ts("1998-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // B4 — broadcast dim chain region→nation→customer.
  private def q4Broadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(avg(col("c_acctbal")), 4).as("avg_bal"))
      .orderBy(col("r_name"), col("n_name"))

  private val q4Sql =
    """SELECT r_name, n_name, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      | JOIN customer ON c_nationkey = n_nationkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // B5 — 6-way join, local-supplier predicate (TPC-H Q5 shape).
  private def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
    t(s, dir, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Sql =
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // B6 — selective scan + global agg (TPC-H Q6 shape).
  private def q6ScanAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01")
        && col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  private val q6Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin

  // B7 — global sort + limit (TakeOrdered at the physical level).
  private def q7SortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  private val q7Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // B8 — window functions: row_number/rank/lag per customer.
  private def q8Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(-1.0)), 2).as("prev_price"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q8Sql =
    """SELECT * FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |   CAST(row_number() OVER w AS BIGINT) AS rn,
      |   CAST(rank() OVER w AS BIGINT) AS rk,
      |   round(coalesce(lag(o_totalprice) OVER w, -1.0), 2) AS prev_price
      | FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // B37 — the remaining rank-family windows: percent_rank / cume_dist
  // / ntile-free relative position + nth_value with an explicit frame
  // (nth_value needs the full partition visible, hence the
  // unbounded-following frame — the default running frame would
  // return null before row n arrives).
  private def q37WindowExtras(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_best_order"))
      .filter(col("rn") <= 4)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  private val q37Sql =
    """SELECT * FROM (
      | SELECT o_orderpriority, o_orderkey, o_totalprice,
      |   CAST(row_number() OVER w AS BIGINT) AS rn,
      |   round(percent_rank() OVER w, 6) AS pct_rank,
      |   round(cume_dist() OVER w, 6) AS cdist,
      |   nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority
      |     ORDER BY o_totalprice DESC, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |     AS second_best_order
      | FROM orders WINDOW w AS (PARTITION BY o_orderpriority
      |   ORDER BY o_totalprice DESC, o_orderkey)
      |) WHERE rn <= 4 ORDER BY o_orderpriority, rn""".stripMargin

  // B38 — datetime function suite: trunc/extract/offset arithmetic.
  // Cross-engine traps handled explicitly: Spark dayofweek is 1=Sunday
  // while DuckDB dow is 0=Sunday (normalized to ISO 1=Monday..7 on
  // both); add_months pairs with DuckDB's INTERVAL month addition;
  // datediff pairs with date_diff('day', ...).
  private def q38DatetimeFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        date_trunc("quarter", col("o_orderdate")).cast("timestamp_ntz").as("q_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).cast("long").as("iso_dow"),
        add_months(col("o_orderdate"), 3).cast("timestamp_ntz").as("plus3mo"),
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate")))
          .cast("long").as("days_to_eoy"))
      .filter(col("o_orderkey") <= 2000)
      .orderBy(col("o_orderkey"))

  private val q38Sql =
    """SELECT o_orderkey,
      | date_trunc('quarter', o_orderdate) AS q_start,
      | CAST(year(o_orderdate) AS BIGINT) AS yr,
      | CAST(month(o_orderdate) AS BIGINT) AS mo,
      | CAST(day(o_orderdate) AS BIGINT) AS dom,
      | CAST(CASE WHEN dayofweek(o_orderdate) = 0 THEN 7
      |      ELSE dayofweek(o_orderdate) END AS BIGINT) AS iso_dow,
      | o_orderdate + INTERVAL 3 MONTH AS plus3mo,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
      |   AS days_to_eoy
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin

  // B39 — null semantics: null-safe equality (<=>, DuckDB IS NOT
  // DISTINCT FROM), NULLIF/COALESCE chains, nulls in aggregates
  // (ignored by sum/avg, counted by count(*) only), and EXPLICIT null
  // ordering — Spark sorts nulls FIRST ascending, DuckDB LAST, so any
  // cross-engine sort over nullable keys must pin it.
  private def q39NullSemantics(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
        when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal7"))
    d.groupBy(col("seg_nb"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("bal7")).as("n_bal"),
        round(sum(col("bal7")), 2).as("sum_bal"),
        round(avg(col("bal7")), 4).as("avg_bal"),
        count(when(col("bal7") <=> lit(null).cast("double"), 1)).as("n_null_safe"))
      .orderBy(col("seg_nb").asc_nulls_last)
  }

  private val q39Sql =
    """WITH d AS (
      | SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_nb,
      |   CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal7
      | FROM customer)
      |SELECT seg_nb, count(*) AS n_rows, count(bal7) AS n_bal,
      | round(sum(bal7), 2) AS sum_bal, round(avg(bal7), 4) AS avg_bal,
      | count(CASE WHEN bal7 IS NOT DISTINCT FROM NULL THEN 1 END) AS n_null_safe
      |FROM d GROUP BY seg_nb ORDER BY seg_nb ASC NULLS LAST""".stripMargin

  // B9 — distinct cardinalities (single row).
  private def q9Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_partkey"), col("l_suppkey")).as("n_pairs"))

  private val q9Sql =
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      | count(DISTINCT l_suppkey) AS n_supps,
      | count(DISTINCT (l_partkey, l_suppkey)) AS n_pairs
      |FROM lineitem""".stripMargin

  // B10 — left-semi join (EXISTS).
  private def q10Semi(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))

  private val q10Sql =
    """SELECT c_mktsegment, count(*) AS n FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // B11 — left-anti join (NOT EXISTS).
  private def q11Anti(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  private val q11Sql =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // B12 — union all + agg over heterogeneous sources.
  private def q12Union(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").select(lit("order").as("src"),
      date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("m"))
    val b = t(s, dir, "lineitem").select(lit("ship").as("src"),
      date_trunc("month", col("l_shipdate")).cast("timestamp_ntz").as("m"))
    a.unionByName(b).groupBy(col("src"), col("m")).agg(count(lit(1)).as("n"))
      .orderBy(col("src"), col("m"))
  }

  private val q12Sql =
    """SELECT src, m, count(*) AS n FROM (
      | SELECT 'order' AS src, date_trunc('month', o_orderdate) AS m FROM orders
      | UNION ALL
      | SELECT 'ship' AS src, date_trunc('month', l_shipdate) AS m FROM lineitem
      |) GROUP BY src, m ORDER BY src, m""".stripMargin

  // B13 — conditional aggregation.
  private def q13CaseAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").groupBy(col("o_orderpriority")).agg(
      sum(when(col("o_totalprice") > 150000, 1).otherwise(0)).cast("long").as("n_big"),
      sum(when(col("o_totalprice") <= 150000, 1).otherwise(0)).cast("long").as("n_small"),
      round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("f_total"))
      .orderBy(col("o_orderpriority"))

  private val q13Sql =
    """SELECT o_orderpriority,
      | CAST(sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      | CAST(sum(CASE WHEN o_totalprice <= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
      | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // B14 — above-brand-average comparison (decorrelated as a join).
  private def q14Subquery(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
      .agg(avg(col("p_retailprice")).as("b_avg"))
    p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
      .filter(col("p_retailprice") > col("b_avg") * 1.01)
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  private val q14Sql =
    """SELECT p_partkey, p_brand, p_retailprice FROM part
      |WHERE p_retailprice > (SELECT avg(p2.p_retailprice) * 1.01 FROM part p2
      |                       WHERE p2.p_brand = part.p_brand)
      |ORDER BY p_partkey""".stripMargin

  // B15 — aggregate + HAVING.
  private def q15Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n_orders") >= 12)
      .orderBy(col("o_custkey"))

  private val q15Sql =
    """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
      |ORDER BY o_custkey""".stripMargin

  // B16 — hierarchical rollup.
  private def q16Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_extendedprice")), 2).as("total"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("total"), col("n"))
      .orderBy(col("rf"), col("ls"))

  private val q16Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
      | round(sum(l_extendedprice), 2) AS total, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // B17 — pivot to wide by market segment.
  private val Segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  private def q17Pivot(s: SparkSession, dir: String): DataFrame = {
    val joined = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
    val piv = joined.groupBy(col("n_name"))
      .pivot("c_mktsegment", Segments)
      .agg(round(avg(col("c_acctbal")), 4))
    piv.select(col("n_name") +: Segments.map(v =>
      round(coalesce(col(v), lit(0.0)), 4).as(v.toLowerCase)): _*)
      .orderBy(col("n_name"))
  }

  private val q17Sql = {
    val cols = Segments.map(v =>
      s" round(coalesce(avg(CASE WHEN c_mktsegment = '$v' THEN c_acctbal END), 0), 4) AS ${v.toLowerCase}")
      .mkString(",\n")
    s"""SELECT n_name,
       |$cols
       |FROM customer JOIN nation ON n_nationkey = c_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin
  }

  // B18 — as-of join: latest order at-or-before each event, per user.
  // Spark has no dataframe as-of join; composed as union + running
  // last-non-null window — one shuffle on user, scale-safe (no
  // per-row subqueries, no BNLJ).
  private def q18AsOf(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val oPart = ord.select(col("o_custkey").as("uid"),
      col("o_orderdate").cast("timestamp_ntz").as("at"),
      lit(0).as("kind"), lit(null).cast("long").as("event_id"), col("o_orderkey"))
    val ePart = t(s, dir, "events").select(col("user_id").as("uid"),
      col("ts").cast("timestamp_ntz").as("at"),
      lit(1).as("kind"), col("event_id"), lit(null).cast("long").as("o_orderkey"))
    val w = Window.partitionBy(col("uid")).orderBy(col("at"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oPart.unionByName(ePart)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("uid").as("user_id"), col("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  private val q18Sql =
    """WITH ord AS (
      | SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      | FROM orders GROUP BY o_custkey, o_orderdate
      |)
      |SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey
      |FROM events e ASOF LEFT JOIN ord o
      | ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // B23 — as-of join again, but through the custom operator tier:
  // AsOfJoinPlan (LogicalPlan) → AsOfJoinStrategy → AsOfJoinExec
  // (sort-merge, one shuffle per side, O(1) merge state). Same output
  // and oracle as B18's composition — two independent engines, one
  // contract.
  private def q23AsOfNative(s: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.install(s)
    // repartition by o_custkey ALONE before the groupBy: hash(o_custkey)
    // satisfies both the agg's ClusteredDistribution(custkey, orderdate)
    // (subset clustering) and the as-of join's
    // ClusteredDistribution(custkey) — one shuffle of orders, not two
    val ord = t(s, dir, "orders")
      .repartition(col("o_custkey"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp_ntz").as("o_time"),
        col("o_orderkey"))
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    graft.plans.AsOfJoin.join(ev, ord, "user_id", "ts", "o_custkey", "o_time")
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  // B36 — as-of with TOLERANCE through the native operator (pandas
  // merge_asof(tolerance=...) semantics): the latest order at-or-
  // before each event only counts within 30 days — staler matches
  // null out instead of attaching arbitrarily old state. The bound is
  // enforced INSIDE the merge (one comparison per emit, no post-join
  // filter pass); DuckDB replays it as ASOF + a CASE on the gap.
  private def q36AsOfTolerance(s: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.install(s)
    val ord = t(s, dir, "orders")
      .repartition(col("o_custkey"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp_ntz").as("o_time"),
        col("o_orderkey"))
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    val tol30d = 30L * 86400L * 1000000L // timestamp_ntz is microseconds
    graft.plans.AsOfJoin.join(ev, ord, "user_id", "ts", "o_custkey", "o_time",
        tolerance = Some(tol30d))
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  private val q36Sql =
    """WITH ord AS (
      | SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      | FROM orders GROUP BY o_custkey, o_orderdate
      |)
      |SELECT e.event_id, e.user_id,
      | CASE WHEN e.ts - o.o_orderdate <= INTERVAL 30 DAY THEN o.o_orderkey END
      |   AS asof_orderkey
      |FROM events e ASOF LEFT JOIN ord o
      | ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // B31 — FORWARD as-of through the native operator: each event
  // attaches the user's NEXT order at-or-after the event time
  // (DuckDB replays it as ASOF with the inequality flipped).
  private def q31AsOfForward(s: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.install(s)
    val ord = t(s, dir, "orders")
      .repartition(col("o_custkey"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp_ntz").as("o_time"),
        col("o_orderkey"))
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    graft.plans.AsOfJoin.join(ev, ord, "user_id", "ts", "o_custkey", "o_time",
        forward = true)
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("next_orderkey"))
      .orderBy(col("event_id"))
  }

  private val q31Sql =
    """WITH ord AS (
      | SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      | FROM orders GROUP BY o_custkey, o_orderdate
      |)
      |SELECT e.event_id, e.user_id, o.o_orderkey AS next_orderkey
      |FROM events e ASOF LEFT JOIN ord o
      | ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  // B33 — NEAREST as-of through the native operator: each event
  // attaches the user's order closest in time in EITHER direction
  // (ties prefer the earlier order). DuckDB has no nearest ASOF, so
  // the oracle composes its backward and forward ASOF joins and picks
  // the closer match with the same tie rule.
  private def q33AsOfNearest(s: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.install(s)
    val ord = t(s, dir, "orders")
      .repartition(col("o_custkey"))
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp_ntz").as("o_time"),
        col("o_orderkey"))
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    graft.plans.AsOfJoin.joinNearest(ev, ord, "user_id", "ts", "o_custkey", "o_time")
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("nearest_orderkey"))
      .orderBy(col("event_id"))
  }

  private val q33Sql =
    """WITH ord AS (
      | SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS o_time,
      |   max(o_orderkey) AS o_orderkey
      | FROM orders GROUP BY o_custkey, o_orderdate
      |),
      |b AS (
      | SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS bk, o.o_time AS bt
      | FROM events e ASOF LEFT JOIN ord o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_time
      |),
      |f AS (
      | SELECT e.event_id, o.o_orderkey AS fk, o.o_time AS ft
      | FROM events e ASOF LEFT JOIN ord o
      |  ON e.user_id = o.o_custkey AND e.ts <= o.o_time
      |)
      |SELECT b.event_id, b.user_id,
      |  CASE WHEN bk IS NULL THEN fk
      |       WHEN fk IS NULL THEN bk
      |       WHEN epoch_us(b.ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(b.ts)
      |         THEN bk ELSE fk END AS nearest_orderkey
      |FROM b JOIN f USING (event_id)
      |ORDER BY b.event_id""".stripMargin

  // B34 — MULTI-KEY as-of through the native operator: each event
  // attaches the latest 6-hour (user, event_type) activity-bucket
  // summary at-or-before its timestamp — a composite (long, string)
  // key, which exercises the operator's lexicographic merge path
  // (DuckDB ASOF accepts extra equality conditions natively).
  private def q34AsOfMultiKey(s: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.install(s)
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
    val buckets = ev
      .repartition(col("user_id"), col("event_type"))
      .groupBy(col("user_id").as("b_user"), col("event_type").as("b_type"),
        window(col("ts"), "6 hours")("start").cast("timestamp_ntz").as("bstart"))
      .agg(count(lit(1)).as("n_in_bucket"))
    graft.plans.AsOfJoin.joinMulti(ev, buckets,
        Seq("user_id", "event_type"), "ts", Seq("b_user", "b_type"), "bstart")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("bstart").as("bucket_start"), col("n_in_bucket"))
      .orderBy(col("event_id"))
  }

  private val q34Sql =
    """WITH b AS (
      | SELECT user_id AS b_user, event_type AS b_type,
      |   time_bucket(INTERVAL '6 hours', ts) AS bstart,
      |   count(*) AS n_in_bucket
      | FROM events GROUP BY 1, 2, 3
      |)
      |SELECT e.event_id, e.user_id, e.event_type,
      |  b.bstart AS bucket_start, b.n_in_bucket
      |FROM events e ASOF LEFT JOIN b
      | ON e.user_id = b.b_user AND e.event_type = b.b_type
      |  AND e.ts >= b.bstart
      |ORDER BY e.event_id""".stripMargin

  // B19 — range join: price-band histogram. The band table is tiny →
  // broadcast nested-loop on the range predicate is the right plan.
  private def q19Range(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 10).toDF("band_id")
    t(s, dir, "part").join(broadcast(bands),
      col("p_retailprice") >= lit(900.0) + col("band_id") * 10.0 &&
        col("p_retailprice") < lit(900.0) + (col("band_id") + 1) * 10.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n_parts"), round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("band_id"))
  }

  private val q19Sql =
    """SELECT band_id, count(*) AS n_parts, round(avg(p_retailprice), 4) AS avg_price
      |FROM (SELECT unnest(generate_series(0, 9)) AS band_id) bands
      |JOIN part ON p_retailprice >= 900.0 + band_id * 10.0
      |         AND p_retailprice < 900.0 + (band_id + 1) * 10.0
      |GROUP BY band_id ORDER BY band_id""".stripMargin

  // B20 — tumbling time bucket + JSON-ish props extraction.
  private def q20TimeBucket(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"),
        sum(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long")).as("k_sum"))
      .orderBy(col("hr"), col("event_type"))

  private val q20Sql =
    """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n,
      | round(sum(value), 2) AS total_value,
      | CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum
      |FROM events GROUP BY date_trunc('hour', ts), event_type
      |ORDER BY hr, event_type""".stripMargin

  // B21 — sessionization: 30-min-gap sessions per user
  // (gaps-and-islands with integer-microsecond arithmetic).
  private def q21Sessionize(s: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(wOrd))
      .withColumn("is_new", when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wCum).cast("long"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).cast("timestamp_ntz").as("session_start"),
        max(col("ts")).cast("timestamp_ntz").as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q21Sql =
    """WITH e AS (
      | SELECT user_id, event_id, ts,
      |   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
      | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      | SELECT user_id, ts,
      |   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      | FROM e
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // B24 — exact interpolated percentiles per group.
  private def q24Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val q24Sql =
    """SELECT o_orderpriority,
      | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      | round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      | round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      | count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // B25 — range-frame rolling window: 7-day revenue per customer.
  private def q25Rolling(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("sec"))
      .rangeBetween(-7L * 86400, 0)
    t(s, dir, "orders")
      .withColumn("sec", unix_seconds(col("o_orderdate").cast("timestamp")))
      .withColumn("rolling_7d", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"), col("rolling_7d"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  private val q25Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | round(sum(o_totalprice) OVER (
      |   PARTITION BY o_custkey ORDER BY o_orderdate
      |   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 2) AS rolling_7d
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // B26 — ntile bucketing over a total order. Distributed two-phase
  // ntile (graft.operators.DistributedNtile): range-repartition +
  // per-partition ranks + broadcast offsets — NOT the single-partition
  // `ntile().over(Window.orderBy(...))`, which serializes the whole
  // table through one task at scale.
  private def q26Ntile(s: SparkSession, dir: String): DataFrame =
    graft.operators.DistributedNtile
      .withNtile(t(s, dir, "orders"), 4, "quartile",
        col("o_totalprice").desc, col("o_orderkey"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"), round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("quartile"))

  private val q26Sql =
    """SELECT quartile, count(*) AS n, round(min(o_totalprice), 2) AS min_price,
      | round(max(o_totalprice), 2) AS max_price
      |FROM (SELECT o_totalprice,
      |        CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
      |      FROM orders)
      |GROUP BY quartile ORDER BY quartile""".stripMargin

  // B27 — string function suite over part names.
  private def q27Strings(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        reverse(col("p_name")).as("rname"),
        lpad(col("p_brand"), 12, "_").as("padded"),
        translate(col("p_type"), "AEIOU", "aeiou").as("translated"),
        levenshtein(col("p_type"), col("p_brand")).cast("long").as("lev"),
        substring(col("p_name"), 3, 5).as("sub35"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
      .orderBy(col("p_partkey"))

  private val q27Sql =
    """SELECT p_partkey, upper(p_name) AS uname, reverse(p_name) AS rname,
      | lpad(p_brand, 12, '_') AS padded,
      | translate(p_type, 'AEIOU', 'aeiou') AS translated,
      | CAST(levenshtein(p_type, p_brand) AS BIGINT) AS lev,
      | substring(p_name, 3, 5) AS sub35,
      | concat_ws('|', p_brand, p_type) AS joined
      |FROM part ORDER BY p_partkey""".stripMargin

  // B28 — collect + sort to a deterministic string per group.
  private def q28Collect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(sort_array(collect_list(col("p_size"))).as("arr"), count(lit(1)).as("n"))
      .select(col("p_brand"),
        concat_ws(",", expr("transform(arr, x -> CAST(x AS STRING))")).as("sizes"),
        col("n"))
      .orderBy(col("p_brand"))

  private val q28Sql =
    """SELECT p_brand, array_to_string(list_sort(list(p_size)), ',') AS sizes, count(*) AS n
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // B29 — native JSON extraction from the props column.
  private def q29Json(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("k")), 4).as("avg_k"),
        sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  private val q29Sql =
    """SELECT event_type, count(*) AS n,
      | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
      | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // B22 — cube / grouping sets.
  private def q22Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy(col("pri"), col("status"))

  private val q22Sql =
    """SELECT coalesce(o_orderpriority, 'ALL') AS pri,
      | coalesce(o_orderstatus, 'ALL') AS status,
      | count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
      |ORDER BY pri, status""".stripMargin

  // B30 — set operations: INTERSECT / EXCEPT (both deduplicating, per
  // SQL semantics). Customers with orders in BOTH bands minus a
  // high-value exclusion set; Catalyst plans these as left-semi /
  // left-anti joins over distinct aggregates — no row-by-row set
  // machinery.
  private def q30SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val low = o.filter(col("o_totalprice") < 50000).select(col("o_custkey"))
    val high = o.filter(col("o_totalprice") >= 50000).select(col("o_custkey"))
    val vip = o.filter(col("o_totalprice") >= 400000).select(col("o_custkey"))
    low.intersect(high).except(vip)
      .select(col("o_custkey").as("custkey"))
      .orderBy(col("custkey"))
  }

  private val q30Sql =
    """SELECT o_custkey AS custkey FROM (
      | SELECT o_custkey FROM orders WHERE o_totalprice < 50000
      | INTERSECT
      | SELECT o_custkey FROM orders WHERE o_totalprice >= 50000
      | EXCEPT
      | SELECT o_custkey FROM orders WHERE o_totalprice >= 400000
      |) ORDER BY custkey""".stripMargin

  // B32 — MAP-typed columns: per-user map of event_type → total value
  // (map_from_entries over a sorted entry list), queried back with
  // size / element_at / map_keys. The oracle computes the equivalent
  // scalars with conditional aggregation — the map is a Spark-side
  // shape, the VALUES prove it was built and probed correctly.
  private def q32MapOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(round(sum(col("value")), 2).as("tv"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("event_type"), col("tv"))))).as("m"))
      .select(col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        coalesce(element_at(col("m"), "click"), lit(0.0)).as("click_total"),
        array_join(map_keys(col("m")), ",").as("types"))
      .orderBy(col("user_id"))

  private val q32Sql =
    """SELECT user_id,
      | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      | coalesce(round(sum(value) FILTER (event_type = 'click'), 2), 0.0) AS click_total,
      | array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // B35 — UNPIVOT (melt), the inverse of q17's pivot: three lineitem
  // measures fold into (metric, val) rows via the native Unpivot
  // logical node (one pass, no union of three scans), then aggregate
  // per (returnflag, metric). The oracle is the explicit UNION ALL
  // the unpivot replaces.
  private def q35Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "val")
      .groupBy(col("l_returnflag"), col("metric"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("total"))
      .orderBy(col("l_returnflag"), col("metric"))

  private val q35Sql =
    """SELECT * FROM (
      | SELECT l_returnflag, 'l_quantity' AS metric, count(*) AS n,
      |   round(sum(l_quantity), 2) AS total FROM lineitem GROUP BY 1
      | UNION ALL
      | SELECT l_returnflag, 'l_extendedprice' AS metric, count(*) AS n,
      |   round(sum(l_extendedprice), 2) AS total FROM lineitem GROUP BY 1
      | UNION ALL
      | SELECT l_returnflag, 'l_discount' AS metric, count(*) AS n,
      |   round(sum(l_discount), 2) AS total FROM lineitem GROUP BY 1
      |) ORDER BY l_returnflag, metric""".stripMargin

  // B37b/q40 — correlated subqueries through the SQL surface: a
  // correlated EXISTS filter plus a correlated SCALAR subquery in the
  // select list. Catalyst's decorrelation rewrites both into joins
  // (the EXISTS to a left-semi, the scalar to a left-outer over a
  // per-key aggregate) — no per-row re-execution, which is what makes
  // the construct survive 100 TB. The DataFrame tier's equivalent
  // shapes are q10/q11/q14; this entry proves the SQL entry point.
  private def q40ExistsCorrelated(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q40_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_q40_orders")
    s.sql(
      """SELECT c.c_custkey, c.c_mktsegment,
        | (SELECT round(max(o.o_totalprice), 2) FROM graft_q40_orders o
        |   WHERE o.o_custkey = c.c_custkey) AS max_price,
        | (SELECT count(*) FROM graft_q40_orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_closed
        |FROM graft_q40_customer c
        |WHERE EXISTS (SELECT 1 FROM graft_q40_orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c.c_custkey""".stripMargin)
  }

  private val q40Sql =
    """SELECT c.c_custkey, c.c_mktsegment,
      | (SELECT round(max(o.o_totalprice), 2) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey) AS max_price,
      | (SELECT count(*) FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F') AS n_closed
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c.c_custkey""".stripMargin

  // q41 — lateral explode with ordinality: posexplode splits every
  // document into (position, token) rows — the row-generator shape
  // (flatten-with-index) that text pipelines run before any per-token
  // work. Generate runs inside the scan stage (no shuffle until the
  // aggregation); the oracle reconstructs ordinality with a bounded
  // integer series since DuckDB's unnest carries no position.
  private def q41LateralExplode(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("word")).as("n_words"),
        min(col("word")).as("first_word"),
        max(col("word")).as("last_word"))
      .orderBy(col("pos"))

  private val q41Sql =
    """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |mx AS (SELECT max(len(w)) AS m FROM s),
      |e AS (SELECT doc_id, i - 1 AS pos, w[i] AS word
      |      FROM s, mx, (SELECT unnest(generate_series(1, 200)) AS i)
      |      WHERE i <= len(w))
      |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n_docs,
      | count(DISTINCT word) AS n_words,
      | min(word) AS first_word, max(word) AS last_word
      |FROM e GROUP BY pos ORDER BY pos""".stripMargin

  // q42 — array function suite: arrays built per group, then probed
  // with slice / contains / fold (higher-order aggregate) / max /
  // distinct — all codegen'd array expressions, no UDFs. The fold
  // keeps long arithmetic (exact) and the slice/join surface a
  // deterministic string so the oracle hash-matches.
  private def q42ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .groupBy(col("p_brand"))
      .agg(sort_array(collect_list(col("p_size").cast("long"))).as("arr"))
      .select(col("p_brand"),
        concat_ws(",", expr("transform(slice(arr, 1, 3), x -> CAST(x AS STRING))")).as("first3"),
        array_contains(col("arr"), 25L).as("has25"),
        expr("aggregate(arr, 0L, (a, x) -> a + x)").as("total"),
        array_max(col("arr")).as("mx"),
        size(array_distinct(col("arr"))).cast("long").as("n_distinct"))
      .orderBy(col("p_brand"))

  private val q42Sql =
    """WITH g AS (SELECT p_brand,
      |  list_sort(list(CAST(p_size AS BIGINT))) AS arr FROM part GROUP BY p_brand)
      |SELECT p_brand,
      | array_to_string(list_slice(arr, 1, 3), ',') AS first3,
      | list_contains(arr, 25) AS has25,
      | CAST(list_sum(arr) AS BIGINT) AS total,
      | list_max(arr) AS mx,
      | CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct
      |FROM g ORDER BY p_brand""".stripMargin

  // q43 — regexp suite: extract / count / filter / strip over part
  // descriptors. Patterns stay in the regex subset Java and RE2 agree
  // on (no backrefs, no lookaround). All four run inside one codegen'd
  // projection — string ops are the bulk of corpus preprocessing, so
  // they must not fall out of whole-stage codegen.
  private def q43Regexp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").rlike("^(red|blue|green)\\b"))
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("color"),
        regexp_extract(col("p_brand"), "([0-9]+)$", 1).cast("long").as("brand_num"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).cast("long").as("n_consonant"),
        regexp_count(col("p_name"), lit("[a-z]+")).cast("long").as("n_tokens"))
      .orderBy(col("p_partkey"))

  private val q43Sql =
    """SELECT p_partkey,
      | regexp_extract(p_name, '^([a-z]+)', 1) AS color,
      | CAST(regexp_extract(p_brand, '([0-9]+)$', 1) AS BIGINT) AS brand_num,
      | CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS n_consonant,
      | CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_tokens
      |FROM part
      |WHERE regexp_matches(p_name, '^(red|blue|green)\b')
      |ORDER BY p_partkey""".stripMargin

  // q44 — time-RANGE window frame: per event, the same user's activity
  // over the PRECEDING HOUR by timestamp value (not row count — q25 is
  // the ROWS variant). The frame is value-bounded on epoch micros, so
  // same-timestamp peers aggregate identically in any engine; the
  // window shuffles once on user_id and each partition streams sorted
  // — the canonical sliding-aggregate shape for event telemetry.
  private def q44RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("n_hour", count(lit(1)).over(w))
      .withColumn("sum_hour", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("n_hour"), col("sum_hour"))
      .transform(QueryShape.stagedSort(_, col("event_id")))
  }

  private val q44Sql =
    """SELECT event_id, user_id,
      | count(*) OVER w AS n_hour,
      | round(sum(value) OVER w, 2) AS sum_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // q45 — LATERAL correlated top-k: each customer's 2 highest-value
  // orders via a lateral subquery with correlated ORDER BY + LIMIT.
  // Catalyst rewrites the per-row subquery into a join + windowed
  // rank (DomainJoin decorrelation) — no nested-loop re-execution,
  // which is what lets "top-N per key" run at 100 TB. DuckDB executes
  // the same SQL shape natively.
  private def q45LateralTopk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q45_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_q45_orders")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM graft_q45_customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM graft_q45_orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
  }

  private val q45Sql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin

  // q46 — FULL OUTER join with key coalescing: customers who only
  // click vs only purchase vs both, from two aggregated sides joined
  // full-outer (the reconciliation shape: neither side may drop).
  // Spark plans a sort-merge full outer; the null-side counts prove
  // both dangling directions survive.
  private def q46FullOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("cu")).agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("pu")).agg(count(lit(1)).as("n_buys"))
    clicks.join(purchases, col("cu") === col("pu"), "full_outer")
      .select(coalesce(col("cu"), col("pu")).as("user_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_buys"), lit(0L)).as("n_buys"),
        when(col("cu").isNull, "buy_only")
          .when(col("pu").isNull, "click_only")
          .otherwise("both").as("kind"))
      .orderBy(col("user_id"))
  }

  private val q46Sql =
    """WITH c AS (SELECT user_id AS cu, count(*) AS n_clicks FROM events
      |           WHERE event_type = 'click' GROUP BY user_id),
      |p AS (SELECT user_id AS pu, count(*) AS n_buys FROM events
      |      WHERE event_type = 'purchase' GROUP BY user_id)
      |SELECT coalesce(cu, pu) AS user_id,
      | coalesce(n_clicks, 0) AS n_clicks,
      | coalesce(n_buys, 0) AS n_buys,
      | CASE WHEN cu IS NULL THEN 'buy_only'
      |      WHEN pu IS NULL THEN 'click_only'
      |      ELSE 'both' END AS kind
      |FROM c FULL OUTER JOIN p ON cu = pu
      |ORDER BY user_id""".stripMargin

  // q47 — union BY NAME with missing columns: two event projections
  // with different column sets union by NAME (not position), absent
  // columns null-filling — the schema-drift-tolerant append every
  // long-lived ingest needs. DuckDB's UNION ALL BY NAME is the same
  // contract.
  private def q47UnionMissing(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("err_code"))
    clicks.unionByName(errors, allowMissingColumns = true)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("click_value"), // null for error rows
        count(col("err_code")).as("n_errors"))
      .orderBy(col("user_id"))
  }

  private val q47Sql =
    """WITH u AS (
      | SELECT event_id, user_id, value FROM events WHERE event_type = 'click'
      | UNION ALL BY NAME
      | SELECT event_id, user_id,
      |   CAST(json_extract_string(props, '$.k') AS BIGINT) AS err_code
      | FROM events WHERE event_type = 'error')
      |SELECT user_id, count(*) AS n,
      | round(sum(value), 2) AS click_value,
      | count(err_code) AS n_errors
      |FROM u GROUP BY user_id ORDER BY user_id""".stripMargin

  // q48 — bitwise-operation suite: AND/OR/XOR/shifts/bit_count over
  // derived key bits — the primitive tier under every hash/fingerprint
  // operator in the suite, exercised directly (all codegen'd).
  private def q48BitOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        (col("o_orderkey") % 256).as("k"))
      .select(col("o_orderkey"),
        col("k").bitwiseAND(lit(0xF0L)).as("masked"),
        col("k").bitwiseOR(lit(1L)).as("odd"),
        col("k").bitwiseXOR(col("o_orderkey") % 16).as("mixed"),
        shiftleft(col("k"), 3).cast("long").as("shl"),
        shiftright(col("k"), 2).cast("long").as("shr"),
        bit_count(col("k")).cast("long").as("popcnt"))
      .transform(QueryShape.stagedSort(_, col("o_orderkey")))

  private val q48Sql =
    """SELECT o_orderkey,
      | (o_orderkey % 256) & 240 AS masked,
      | (o_orderkey % 256) | 1 AS odd,
      | xor(o_orderkey % 256, o_orderkey % 16) AS mixed,
      | (o_orderkey % 256) << 3 AS shl,
      | (o_orderkey % 256) >> 2 AS shr,
      | CAST(bit_count(o_orderkey % 256) AS BIGINT) AS popcnt
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // q49 — FILTER-clause aggregation (SQL:2003): per-group aggregates
  // each over their own predicate in one pass — the standard-SQL twin
  // of q13's CASE-WHEN conditional aggregation, through spark.sql.
  private def q49FilterAgg(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q49_orders")
    s.sql(
      """SELECT o_orderpriority,
        | count(*) AS n,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_closed,
        | round(sum(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
        |   AS big_total,
        | round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
        |   AS open_avg
        |FROM graft_q49_orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private val q49Sql =
    """SELECT o_orderpriority,
      | count(*) AS n,
      | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_closed,
      | round(sum(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2)
      |   AS big_total,
      | round(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 4)
      |   AS open_avg
      |FROM orders
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // q50 — explicit GROUPING SETS + grouping_id: an arbitrary list of
  // grouping shapes in ONE pass (per-priority, per-status, grand
  // total — NOT the full cube), with grouping_id() disambiguating
  // which set produced each row (cleaner than q22's coalesce
  // sentinel). Completes the grouping trio: q16 rollup, q22 cube,
  // q50 explicit sets.
  private def q50GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("graft_q50_orders")
    s.sql(
      """SELECT coalesce(o_orderpriority, 'ALL') AS pri,
        | coalesce(o_orderstatus, 'ALL') AS status,
        | CAST(grouping_id(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM graft_q50_orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, pri, status""".stripMargin)
  }

  private val q50Sql =
    """SELECT coalesce(o_orderpriority, 'ALL') AS pri,
      | coalesce(o_orderstatus, 'ALL') AS status,
      | CAST(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS BIGINT) AS gid,
      | count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY gid, pri, status""".stripMargin

  // q51 — date-spine densification (gap filling): every (user, day)
  // cell over the corpus's date span, absent days zero-filled — the
  // step that turns sparse event logs into dense daily series for
  // downstream models. The spine is generated (sequence over the
  // min/max date — one tiny agg + a broadcast cross join), never
  // stored; the only real shuffle is the daily aggregation.
  private def q51DateSpine(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").withColumn("day", to_date(col("ts")))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val days = span.select(explode(expr("sequence(d0, d1)")).as("day"))
    val users = ev.select(col("user_id")).distinct()
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    users.crossJoin(broadcast(days))
      .join(daily, Seq("user_id", "day"), "left")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        count(col("n")).as("n_active"),
        (count(lit(1)) - count(col("n"))).as("n_gaps"),
        round(sum(coalesce(col("v"), lit(0.0))), 2).as("total_value"))
      .orderBy(col("user_id"))
  }

  private val q51Sql =
    """WITH span AS (
      | SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      | FROM events),
      |days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |         FROM span),
      |u AS (SELECT DISTINCT user_id FROM events),
      |daily AS (SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
      |            sum(value) AS v
      |          FROM events GROUP BY 1, 2)
      |SELECT u.user_id, count(*) AS n_days, count(daily.n) AS n_active,
      | count(*) - count(daily.n) AS n_gaps,
      | round(sum(coalesce(daily.v, 0)), 2) AS total_value
      |FROM u CROSS JOIN days
      |LEFT JOIN daily ON daily.user_id = u.user_id AND daily.day = days.day
      |GROUP BY u.user_id ORDER BY u.user_id""".stripMargin

  // q52 — built-in approximate percentile (Greenwald-Khanna) beside
  // the exact: Spark's approx_percentile(col, q, accuracy) is the
  // stock answer before reaching for the KLL tier; its determinism is
  // data-order-based (no RNG), and the GK guarantee bounds the RANK
  // error by n/accuracy — asserted I4-style (rank of the estimate
  // within 2·n/accuracy of the target), beside the exact DuckDB
  // replays.
  private def q52ApproxPercentile(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val sk = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, 0.5, 1000)").as("apx_p50"),
        round(expr("percentile(value, 0.5)"), 4).as("exact_p50"),
        count(lit(1)).as("n"))
    ev.join(broadcast(sk), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("exact_p50")).as("exact_p50"),
        first(col("n")).as("n"),
        (abs(count(when(col("value") <= col("apx_p50"), 1)) -
          first(col("n")) / 2) <= first(col("n")) * 2 / 1000 + 1).as("gk_ok"))
      .orderBy(col("event_type"))
  }

  private val q52Sql =
    """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS exact_p50,
      | count(*) AS n, true AS gk_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // q53 — time-series GAP FILL with linear interpolation: the
  // resample step every sensor/metric pipeline runs before modeling
  // (q51's date spine densifies; this INTERPOLATES). A fixed 6-hour
  // grid (first 120 buckets of the span, epoch-aligned by integer
  // arithmetic — the microsecond epoch overflows double precision,
  // so DIV, not ceil) unions with each sampled user's events; the
  // surrounding observations come from two frame-bounded ignoreNulls
  // window lookups (last over preceding, first over following — the
  // as-of-both-directions shape as ONE sort per user instead of two
  // joins), then per-row lerp. Grid points before the first / after
  // the last observation clamp to the nearest one; an event exactly
  // on a grid point wins both lookups and the lerp degenerates to
  // its value. Events are pre-deduped per (user, ts) with min() so
  // the window ordering is total — no tie nondeterminism.
  private def q53Interpolate(s: SparkSession, dir: String): DataFrame = {
    val sixH = 21600000000L
    val ev = t(s, dir, "events")
      .filter(col("user_id") % 50 === 0)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"), col("value"))
      .groupBy(col("user_id"), col("ts_us"))
      .agg(min(col("value")).as("value"))
    val bounds = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
    // Spark's sequence(start, stop, step) THROWS when start > stop with a
    // positive step, while DuckDB's generate_series returns empty — guard so
    // a degenerate window (all events before the first 6h boundary, or an
    // empty filter result) degrades to zero grid points on both engines.
    val grid = bounds.select(explode(expr(
      s"""CASE WHEN ((lo + ${sixH - 1}L) DIV ${sixH}L) * ${sixH}L <= hi THEN
         | sequence(((lo + ${sixH - 1}L) DIV ${sixH}L) * ${sixH}L,
         | least(hi, ((lo + ${sixH - 1}L) DIV ${sixH}L) * ${sixH}L + ${119 * sixH}L),
         | ${sixH}L) END""".stripMargin)).as("ts_us"))
    val gridPts = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(grid))
      .withColumn("value", lit(null).cast("double"))
      .withColumn("is_grid", lit(1))
    val all = ev.withColumn("is_grid", lit(0)).unionByName(gridPts)
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_grid"))
    val wPrev = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    all
      .withColumn("pv", last(col("value"), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(when(col("value").isNotNull, col("ts_us")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("value"), ignoreNulls = true).over(wNext))
      .withColumn("nt", first(when(col("value").isNotNull, col("ts_us")), ignoreNulls = true).over(wNext))
      .filter(col("is_grid") === 1)
      .select(col("user_id"), col("ts_us"),
        round(
          when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .when(col("nt") === col("pt"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("ts_us") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double"))), 4).as("interp"))
      .orderBy(col("user_id"), col("ts_us"))
  }

  private val q53Sql =
    """WITH ev AS (
      | SELECT user_id, epoch_us(ts) AS ts_us, min(value) AS value
      | FROM events WHERE user_id % 50 = 0
      | GROUP BY user_id, epoch_us(ts)
      |), b AS (
      | SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM ev
      |), grid AS (
      | SELECT unnest(generate_series(
      |   ((lo + 21599999999) // 21600000000) * 21600000000,
      |   least(hi, ((lo + 21599999999) // 21600000000) * 21600000000
      |     + 119 * 21600000000),
      |   21600000000)) AS ts_us
      | FROM b
      |), gp AS (
      | SELECT u.user_id, g.ts_us, CAST(NULL AS DOUBLE) AS value, 1 AS is_grid
      | FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN grid g
      |), allr AS (
      | SELECT user_id, ts_us, value, 0 AS is_grid FROM ev
      | UNION ALL SELECT * FROM gp
      |), w AS (
      | SELECT user_id, ts_us, is_grid,
      |  last_value(value IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, is_grid
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |  last_value(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, is_grid
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
      |  first_value(value IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, is_grid
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |  first_value(CASE WHEN value IS NOT NULL THEN ts_us END IGNORE NULLS) OVER
      |    (PARTITION BY user_id ORDER BY ts_us, is_grid
      |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      | FROM allr
      |)
      |SELECT user_id, ts_us,
      | round(CASE WHEN pv IS NULL THEN nv
      |            WHEN nv IS NULL THEN pv
      |            WHEN nt = pt THEN pv
      |            ELSE pv + (nv - pv) *
      |              (CAST(ts_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE)) END, 4)
      |   AS interp
      |FROM w WHERE is_grid = 1
      |ORDER BY user_id, ts_us""".stripMargin

  // q54 — SCD TYPE-2 dimension build: turn a change log (per-customer
  // order-priority changes, one change per day via arg-max-orderkey
  // dedup) into versioned dimension rows with [valid_from, valid_to)
  // ranges and an is_current flag — lead() over the change sequence,
  // the warehouse-standard dimension-versioning op. One shuffle
  // (window by customer); null valid_to marks the open version.
  private def q54Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    t(s, dir, "orders")
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("prio"))
      .select(col("o_custkey"), col("o_orderdate").as("valid_from"), col("prio"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col("o_custkey"), col("valid_from"))
  }

  private val q54Sql =
    """WITH ch AS (
      | SELECT o_custkey, o_orderdate, arg_max(o_orderpriority, o_orderkey) AS prio
      | FROM orders GROUP BY o_custkey, o_orderdate
      |)
      |SELECT o_custkey, o_orderdate AS valid_from, prio,
      | lead(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
      |   AS valid_to,
      | lead(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
      |   IS NULL AS is_current
      |FROM ch ORDER BY o_custkey, valid_from""".stripMargin

  // q57 — SCHEMA-ENFORCED JSON parsing with malformed-row accounting:
  // q29 extracts scalars path-wise; real ingest parses against an
  // explicit schema and must COUNT what failed (silently nulled rows
  // are how corrupt feeds go unnoticed). Every 7th event's payload is
  // deliberately mangled; from_json (PERMISSIVE) nulls it, the
  // aggregate reports good/bad counts and the sum over survivors.
  // DuckDB replays with json_valid + json_extract.
  private def q57JsonSchema(s: SparkSession, dir: String): DataFrame = {
    // Malformed = PARSE failure, matched to DuckDB's json_valid: the schema
    // carries a corrupt-record column so unparseable payloads are flagged
    // structurally, while VALID json merely lacking (or nulling) `k` counts
    // as well-formed on both engines — the two signals are identical by
    // construction, not by data luck.
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_bad",
        org.apache.spark.sql.types.StringType)))
    t(s, dir, "events")
      .withColumn("raw", when(col("event_id") % 7 === 0,
        concat(lit("x"), col("props"))).otherwise(col("props")))
      .withColumn("parsed", from_json(col("raw"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_bad")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count(when(col("parsed._bad").isNotNull, 1)).as("n_malformed"),
        sum(when(col("parsed._bad").isNull, col("parsed.k"))).as("sum_k"))
      .orderBy(col("event_type"))
  }

  private val q57Sql =
    """WITH r AS (
      | SELECT event_type,
      |   CASE WHEN event_id % 7 = 0 THEN 'x' || props ELSE props END AS raw
      | FROM events
      |)
      |SELECT event_type, count(*) AS n,
      | CAST(count(*) FILTER (WHERE NOT json_valid(raw)) AS BIGINT) AS n_malformed,
      | CAST(sum(CASE WHEN json_valid(raw)
      |   THEN CAST(json_extract(raw, '$.k') AS BIGINT) END) AS BIGINT) AS sum_k
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  // q56 — CUBE: the full 2^d grouping-set lattice (q16 covers rollup,
  // q22/q50 explicit grouping sets; cube completes the family). Both
  // engines materialize all four (status × priority) subtotal levels
  // in one pass with grouping-null markers coalesced to 'ALL'.
  private def q56Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("total"), col("n"))
      .orderBy(col("status"), col("priority"))

  private val q56Sql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      | coalesce(o_orderpriority, 'ALL') AS priority,
      | round(sum(o_totalprice), 2) AS total, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  // q55 — conversion FUNNEL through the native forward as-of with
  // tolerance: every click attaches the user's EARLIEST purchase
  // at-or-after it, null once the gap exceeds 24 h — exactly
  // AsOfJoinExec(Forward, tolerance), the funnel primitive as one
  // sort-merge pass instead of a window-deduped interval join. Output
  // = per click-day conversion rates. DuckDB replays it as forward
  // ASOF + a CASE on the gap (its ASOF has no tolerance).
  private def q55Funnel(s: SparkSession, dir: String): DataFrame = {
    graft.plans.AsOfJoin.install(s)
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp_ntz").as("ts"))
    val clicks = ev.filter(col("event_type") === "click")
    // repartition by user BEFORE the dedup agg: hash(user) satisfies
    // both the (user, ts) aggregation's clustering AND the as-of's
    // required distribution, so the purchase side shuffles exactly
    // once (q31's pattern)
    val purchases = ev.filter(col("event_type") === "purchase")
      .repartition(col("user_id"))
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(min(col("event_id")).as("p_event_id"))
    val dayUs = 86400000000L
    graft.plans.AsOfJoin.join(clicks, purchases,
        "user_id", "ts", "p_user", "p_ts",
        forward = true, tolerance = Some(dayUs))
      .groupBy(col("ts").cast("date").as("click_day"))
      .agg(count(lit(1)).as("n_clicks"),
        count(col("p_event_id")).as("n_converted"),
        round(count(col("p_event_id")).cast("double") / count(lit(1)), 4)
          .as("conv_rate"))
      .orderBy(col("click_day"))
  }

  private val q55Sql =
    """WITH c AS (
      | SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
      |), p AS (
      | SELECT user_id AS p_user, ts AS p_ts, min(event_id) AS p_event_id
      | FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
      |), j AS (
      | SELECT c.ts,
      |   CASE WHEN pp.p_ts IS NOT NULL
      |     AND epoch_us(pp.p_ts) - epoch_us(c.ts) <= 86400000000
      |   THEN pp.p_event_id END AS p_event_id
      | FROM c ASOF LEFT JOIN p pp
      |   ON c.user_id = pp.p_user AND c.ts <= pp.p_ts
      |)
      |SELECT CAST(ts AS DATE) AS click_day, count(*) AS n_clicks,
      | count(p_event_id) AS n_converted,
      | round(CAST(count(p_event_id) AS DOUBLE) / count(*), 4) AS conv_rate
      |FROM j GROUP BY 1 ORDER BY click_day""".stripMargin

  // B58 — EXACT DECIMAL money arithmetic (TPC-H Q1's measures without
  // float error): at 100 TB a float sum of prices drifts with
  // partition count and merge order; decimals are exact and
  // order-independent, so the distributed sum equals the oracle's
  // single-threaded one bit-for-bit with NO rounding trick. Every
  // intermediate carries an explicit cast so both engines walk the
  // same scale ladder: 2dp inputs → 4dp discounted price (exact
  // product) → 6dp charge (exact product) → wide exact sums. The only
  // double→decimal conversions happen on the 2-decimal-valued source
  // columns where nearest-2dp rounding is unambiguous. The FINAL
  // projection re-emits the exact sums as round(CAST(x AS DOUBLE), N):
  // the driver's hash canonicalizes doubles but not DECIMAL(38,x)
  // (r5's only hash-reds were these two, value-identical to the
  // oracle), so the gate compares doubles while the ladder that IS the
  // point of the operator stays exact end-to-end — asserted on the
  // pre-projection schema below.
  private def q58DecimalAgg(s: SparkSession, dir: String): DataFrame = {
    val exact = q58DecimalAggExact(s, dir)
    val want = Seq(
      "sum_qty" -> "decimal(38,2)", "sum_base_price" -> "decimal(38,2)",
      "sum_disc_price" -> "decimal(38,4)", "sum_charge" -> "decimal(38,6)")
    want.foreach { case (c, tpe) =>
      val got = exact.schema(c).dataType.simpleString
      require(got == tpe, s"q58 decimal ladder broken: $c is $got, want $tpe")
    }
    exact.select(col("l_returnflag"), col("l_linestatus"),
      round(col("sum_qty").cast("double"), 2).as("sum_qty"),
      round(col("sum_base_price").cast("double"), 2).as("sum_base_price"),
      round(col("sum_disc_price").cast("double"), 4).as("sum_disc_price"),
      round(col("sum_charge").cast("double"), 6).as("sum_charge"),
      col("count_order"))
  }

  private def q58DecimalAggExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(l_quantity AS DECIMAL(18,2))").as("qty"),
        expr("CAST(l_extendedprice AS DECIMAL(18,2))").as("price"),
        expr("CAST(l_discount AS DECIMAL(18,2))").as("disc"),
        expr("CAST(l_tax AS DECIMAL(18,2))").as("tax"))
      .withColumn("disc_price",
        expr("CAST(price * (CAST(1 AS DECIMAL(18,2)) - disc) AS DECIMAL(18,4))"))
      .withColumn("charge",
        expr("CAST(disc_price * (CAST(1 AS DECIMAL(18,2)) + tax) AS DECIMAL(18,6))"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        expr("CAST(sum(qty) AS DECIMAL(38,2))").as("sum_qty"),
        expr("CAST(sum(price) AS DECIMAL(38,2))").as("sum_base_price"),
        expr("CAST(sum(disc_price) AS DECIMAL(38,4))").as("sum_disc_price"),
        expr("CAST(sum(charge) AS DECIMAL(38,6))").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q58Sql =
    """WITH d AS (
      | SELECT l_returnflag, l_linestatus,
      |  CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |  CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |  CAST(l_discount AS DECIMAL(18,2)) AS disc,
      |  CAST(l_tax AS DECIMAL(18,2)) AS tax
      | FROM lineitem),
      |e AS (
      | SELECT *, CAST(price * (CAST(1 AS DECIMAL(18,2)) - disc) AS DECIMAL(18,4)) AS disc_price
      | FROM d),
      |f AS (
      | SELECT *, CAST(disc_price * (CAST(1 AS DECIMAL(18,2)) + tax) AS DECIMAL(18,6)) AS charge
      | FROM e)
      |SELECT l_returnflag, l_linestatus,
      | round(CAST(CAST(sum(qty) AS DECIMAL(38,2)) AS DOUBLE), 2) AS sum_qty,
      | round(CAST(CAST(sum(price) AS DECIMAL(38,2)) AS DOUBLE), 2) AS sum_base_price,
      | round(CAST(CAST(sum(disc_price) AS DECIMAL(38,4)) AS DOUBLE), 4) AS sum_disc_price,
      | round(CAST(CAST(sum(charge) AS DECIMAL(38,6)) AS DOUBLE), 6) AS sum_charge,
      | count(*) AS count_order
      |FROM f GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // B59 — SKEW-SALTED join, surfaced as a first-class operator (the
  // manual hot-key treatment when AQE's runtime split can't help —
  // e.g. the dim side must shuffle too, or the skew is known ahead of
  // time). The big side tags each row with salt = l_linenumber % 8 (a
  // value already on the row — no rand(), bit-replayable); the small
  // side replicates ×8 via explode so every (key, salt) pair still
  // finds its match; the join key widens to (suppkey, salt), spreading
  // any hot supplier over 8 shuffle partitions. The oracle is the
  // PLAIN unsalted join — equality proves salting is semantics-free.
  // Money sums ride B58's exact-decimal ladder so the distributed
  // fold is order-independent. SkewJoinSpec drives the same idiom on
  // a planted 85%-hot-key fact and proves the per-task balance.
  private def q59SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val S = 8
    val li = t(s, dir, "lineitem")
      .withColumn("l_salt", (col("l_linenumber") % S).cast("int"))
    val supp = t(s, dir, "supplier")
      .withColumn("s_salt", explode(array((0 until S).map(lit): _*)))
    li.join(supp,
        col("l_suppkey") === col("s_suppkey") && col("l_salt") === col("s_salt"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("qty", expr("CAST(l_quantity AS DECIMAL(18,2))"))
      .withColumn("rev", expr(
        """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
          | (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
          | AS DECIMAL(18,4))""".stripMargin))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        expr("CAST(sum(qty) AS DECIMAL(38,2))").as("sum_qty_dec"),
        expr("CAST(sum(rev) AS DECIMAL(38,4))").as("revenue_dec"))
      // Final projection: double-canonical for the gate hash (see B58
      // note); the exact-decimal fold is asserted just above.
      .transform { exact =>
        require(exact.schema("sum_qty_dec").dataType.simpleString == "decimal(38,2)" &&
          exact.schema("revenue_dec").dataType.simpleString == "decimal(38,4)",
          "q59 decimal ladder broken")
        exact.select(col("n_name"), col("n_items"),
          round(col("sum_qty_dec").cast("double"), 2).as("sum_qty"),
          round(col("revenue_dec").cast("double"), 4).as("revenue"))
      }
      .orderBy(col("n_name"))
  }

  private val q59Sql =
    """SELECT n_name, count(*) AS n_items,
      | round(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE), 2) AS sum_qty,
      | round(CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |   (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |   AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE), 4) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  // B60 — MERGE/upsert semantics (the Delta/Iceberg `MERGE INTO`
  // statement, expressed as the relational algebra it compiles to):
  // target = every third order, source = every second order with a
  // re-priced total (+500.00 — an exact-decimal shift, so 2dp rounding
  // never lands on an engine-divergent half-way case); WHEN MATCHED AND src.price > 300000 → DELETE,
  // WHEN MATCHED → UPDATE price, WHEN NOT MATCHED → INSERT. The plan
  // is ONE full-outer equi-join on the merge key + a codegen'd CASE
  // router — exactly how lakehouse engines execute MERGE (join target
  // and source, route each row to delete/update/insert/keep). Each
  // output row carries its `action` tag so the oracle verifies the
  // ROUTING, not just the final multiset. At scale the join shuffles
  // on the merge key (AQE handles skew); file-level pruning of
  // untouched target files — H11's manifest trick — is the physical
  // complement.
  private def q60MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val tgt = t(s, dir, "orders").filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("key"),
        round(col("o_totalprice"), 2).as("t_price"),
        col("o_orderstatus").as("t_status"))
    val src = t(s, dir, "orders").filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("key"),
        round(col("o_totalprice") + 500.0, 2).as("s_price"),
        lit("M").as("s_status"))
    tgt.join(src, Seq("key"), "full_outer")
      .withColumn("action",
        when(col("t_price").isNotNull && col("s_price").isNotNull &&
          col("s_price") > 300000.0, "delete")
          .when(col("t_price").isNotNull && col("s_price").isNotNull, "update")
          .when(col("t_price").isNull, "insert")
          .otherwise("keep"))
      .filter(col("action") =!= "delete")
      .select(col("key"),
        when(col("action") === "update" || col("action") === "insert",
          col("s_price")).otherwise(col("t_price")).as("price"),
        when(col("action") === "insert", col("s_status"))
          .otherwise(col("t_status")).as("status"),
        col("action"))
      .transform(QueryShape.stagedSort(_, col("key")))
  }

  private val q60Sql =
    """WITH tgt AS (
      | SELECT o_orderkey AS key, round(o_totalprice, 2) AS t_price,
      |   o_orderstatus AS t_status
      | FROM orders WHERE o_orderkey % 3 = 0),
      |src AS (
      | SELECT o_orderkey AS key, round(o_totalprice + 500.0, 2) AS s_price,
      |   'M' AS s_status
      | FROM orders WHERE o_orderkey % 2 = 0),
      |m AS (
      | SELECT coalesce(tgt.key, src.key) AS key, t_price, t_status,
      |   s_price, s_status,
      |   CASE WHEN t_price IS NOT NULL AND s_price IS NOT NULL
      |          AND s_price > 300000.0 THEN 'delete'
      |        WHEN t_price IS NOT NULL AND s_price IS NOT NULL THEN 'update'
      |        WHEN t_price IS NULL THEN 'insert'
      |        ELSE 'keep' END AS action
      | FROM tgt FULL OUTER JOIN src ON tgt.key = src.key)
      |SELECT key,
      | CASE WHEN action IN ('update', 'insert') THEN s_price
      |      ELSE t_price END AS price,
      | CASE WHEN action = 'insert' THEN s_status ELSE t_status END AS status,
      | action
      |FROM m WHERE action <> 'delete' ORDER BY key""".stripMargin

  // B61 — HIERARCHY resolution without recursive SQL. Spark has no
  // WITH RECURSIVE, and the naive loop walks one parent hop per round
  // — O(depth) shuffles. Pointer JUMPING (Wyllie '79) squares the hop
  // instead: each round f' = f∘f, d' = d + d∘f, so every node reaches
  // the root in ⌈log2 depth⌉ self-joins — 4 rounds for a depth-14
  // (16k-node) tree, ~5 extra rounds per MILLION-fold growth. That
  // log-round contraction is the 100 TB shape: org charts, category
  // trees, thread ancestries all resolve in a handful of shuffles.
  // The hierarchy is derived, not stored: parent(k) = (k-1)/2 over
  // the live supplier keys (a binary heap on the key column — every
  // parent exists because keys are dense from 0). Oracle = DuckDB's
  // real WITH RECURSIVE walking ONE hop per step, so a green row
  // proves the log-round contraction equals the linear recursion.
  private def q61Hierarchy(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "supplier").select(
      col("s_suppkey").as("node"),
      when(col("s_suppkey") === 0, lit(0L))
        .otherwise(expr("CAST((s_suppkey - 1) / 2 AS BIGINT)")).as("parent"))
    graft.operators.PointerJumping.resolve(s, edges)
      .select(col("node").as("s_suppkey"), col("depth"),
        col("root").as("root_key"))
      .orderBy("s_suppkey")
  }

  private val q61Sql =
    """WITH RECURSIVE walk(node, anc, d) AS (
      | SELECT s_suppkey, s_suppkey, 0 FROM supplier
      | UNION ALL
      | SELECT node, (anc - 1) // 2, d + 1 FROM walk WHERE anc > 0
      |)
      |SELECT node AS s_suppkey, CAST(max(d) AS BIGINT) AS depth,
      | CAST(0 AS BIGINT) AS root_key
      |FROM walk GROUP BY node ORDER BY s_suppkey""".stripMargin

  // B62 — distribution SHAPE aggregates (mean, sd, skewness, excess
  // kurtosis) from ONE-PASS raw power sums. The builtins are a parity
  // trap — Spark's skewness/kurtosis are population moments, DuckDB's
  // are bias-corrected sample statistics — so both sides fold the
  // SAME population formulas from Σx..Σx⁴: map-side-combinable, one
  // shuffle of five doubles per group regardless of row count, the
  // canonical sufficient-statistics shape for 100 TB profiling.
  // Prices are pre-scaled ×1e-3 to keep Σx⁴ ~1e12 — 4 safe digits of
  // headroom under the 6dp rounding even at 1000× the rows.
  private def q62Moments(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), (col("l_extendedprice") / 1000.0).as("x"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("x*x")).as("s2"), sum(expr("x*x*x")).as("s3"),
        sum(expr("x*x*x*x")).as("s4"))
      .withColumn("m", col("s1") / col("n"))
      .withColumn("m2", col("s2") / col("n") - col("m") * col("m"))
      .withColumn("m3", col("s3") / col("n")
        - lit(3.0) * col("m") * col("s2") / col("n")
        + lit(2.0) * col("m") * col("m") * col("m"))
      .withColumn("m4", col("s4") / col("n")
        - lit(4.0) * col("m") * col("s3") / col("n")
        + lit(6.0) * col("m") * col("m") * col("s2") / col("n")
        - lit(3.0) * col("m") * col("m") * col("m") * col("m"))
      .select(col("l_returnflag"), col("n"),
        round(col("m"), 6).as("mean_k"),
        round(sqrt(col("m2")), 6).as("sd_k"),
        round(col("m3") / pow(col("m2"), 1.5), 6).as("skewness"),
        round(col("m4") / (col("m2") * col("m2")) - 3.0, 6).as("kurtosis"))
      .orderBy(col("l_returnflag"))

  private val q62Sql =
    """WITH p AS (
      | SELECT l_returnflag, l_extendedprice / 1000.0 AS x FROM lineitem),
      |a AS (
      | SELECT l_returnflag, count(*) AS n, sum(x) AS s1, sum(x*x) AS s2,
      |  sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
      | FROM p GROUP BY l_returnflag),
      |m AS (
      | SELECT *, s1/n AS m FROM a),
      |c AS (
      | SELECT *, s2/n - m*m AS m2,
      |  s3/n - 3*m*s2/n + 2*m*m*m AS m3,
      |  s4/n - 4*m*s3/n + 6*m*m*s2/n - 3*m*m*m*m AS m4
      | FROM m)
      |SELECT l_returnflag, n, round(m, 6) AS mean_k,
      | round(sqrt(m2), 6) AS sd_k,
      | round(m3 / pow(m2, 1.5), 6) AS skewness,
      | round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis
      |FROM c ORDER BY l_returnflag""".stripMargin

  // B63 — equi-width HISTOGRAM + cumulative distribution. Bucketing
  // is pure arithmetic — floor(price/5000), identical IEEE division
  // in both engines (width_bucket is NOT portable: DuckDB lacks it) —
  // so the scan does all the work map-side and the shuffle carries
  // one row per bucket (~21). The running total and shares run a
  // single-partition window over those 21 rows — fine at any scale
  // because the histogram's cardinality is fixed by the bucket width,
  // not the data volume.
  private def q63Histogram(s: SparkSession, dir: String): DataFrame = {
    val b = t(s, dir, "lineitem")
      .select(expr("CAST(floor(l_extendedprice / 5000.0) AS INT)").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    b.withColumn("cum_cnt", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(all))
      .select(col("bucket"), col("cnt"), col("cum_cnt"),
        round(col("cnt") / col("total"), 6).as("share"),
        round(col("cum_cnt") / col("total"), 6).as("cum_share"))
      .orderBy(col("bucket"))
  }

  private val q63Sql =
    """WITH b AS (
      | SELECT CAST(floor(l_extendedprice / 5000.0) AS INT) AS bucket,
      |  count(*) AS cnt
      | FROM lineitem GROUP BY 1),
      |c AS (
      | SELECT bucket, cnt,
      |  CAST(sum(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum_cnt,
      |  CAST(sum(cnt) OVER () AS BIGINT) AS total
      | FROM b)
      |SELECT bucket, cnt, cum_cnt,
      | round(cnt * 1.0 / total, 6) AS share,
      | round(cum_cnt * 1.0 / total, 6) AS cum_share
      |FROM c ORDER BY bucket""".stripMargin

  // B64 — MODE with a deterministic tie-break + exact median. The
  // builtin mode() is tie-ARBITRARY in both engines (and Spark's is
  // marked indeterministic), so mode is computed as the algebra:
  // count per (group, value) — map-side combinable — then top-1 by
  // (count DESC, value ASC) over the ~50 distinct quantities per
  // group. Median rides q24's percentile/quantile_cont parity pair.
  private def q64ModeMedian(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val cnts = li.groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("c").desc, col("l_quantity").asc)
    val mode = cnts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
        col("c").as("mode_count"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        count(lit(1)).as("n"))
    mode.join(med, Seq("l_returnflag")).orderBy(col("l_returnflag"))
  }

  private val q64Sql =
    """WITH c AS (
      | SELECT l_returnflag, l_quantity, count(*) AS c
      | FROM lineitem GROUP BY 1, 2),
      |m AS (
      | SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_count,
      |  row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY c DESC, l_quantity ASC) AS rn
      | FROM c),
      |med AS (
      | SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4)
      |   AS median_qty, count(*) AS n
      | FROM lineitem GROUP BY 1)
      |SELECT m.l_returnflag, mode_qty, mode_count, median_qty, n
      |FROM m JOIN med ON m.l_returnflag = med.l_returnflag
      |WHERE rn = 1 ORDER BY m.l_returnflag""".stripMargin

  // B65 — DAU/WAU: daily active users + 7-day ROLLING distinct users.
  // Sliding-window COUNT DISTINCT does not decompose (you can't merge
  // daily distincts), and a global count(DISTINCT) OVER window drags
  // raw user ids through one partition. The scalable exact shape:
  // dedup to (user, day) pairs first (map-side combinable — the big
  // shrink happens in the scan), then CONTRIBUTE each pair to the 7
  // window anchors it can serve (a fixed ×7 explode of the already-
  // deduped pairs, not the raw events) and dedup per anchor. Work is
  // linear with a constant-7 factor; every shuffle key is
  // (day, user_id). The approximate twin at 100 TB is I7's rolling
  // HLL with the identical plan minus the second dedup.
  private def q65Wau(s: SparkSession, dir: String): DataFrame = {
    val ud = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .withColumn("t", explode(sequence(lit(0), lit(6))))
      .select(expr("date_add(day, t)").as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  private val q65Sql =
    """WITH ud AS (
      | SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |contrib AS (
      | SELECT DISTINCT day + CAST(t AS INTEGER) AS day, user_id
      | FROM ud, (SELECT unnest(generate_series(0, 6)) AS t)),
      |wau AS (SELECT day, count(*) AS wau FROM contrib GROUP BY day)
      |SELECT dau.day, dau, wau
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY dau.day""".stripMargin

  // B66 — INTERVAL OVERLAP self-join (temporal/genomic join: which
  // validity windows intersect?). All-pairs is O(n²); the scale shape
  // decomposes each interval into its covering WEEK buckets and
  // equi-joins on the bucket — work ∝ overlapping bucket co-residents,
  // never the full cross product. A pair sharing several buckets
  // would count once per shared bucket, so the join keeps a pair only
  // in its FIRST shared bucket (bucket = max of the two start
  // buckets) — the standard dedup-free guard (no distinct needed).
  // The oracle is the brute-force quadratic join over the same
  // filtered subset, so a green row proves the decomposition finds
  // every overlap exactly once.
  private def q66IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "orders")
      .filter(col("o_orderkey") % 37 === 0)
      .select(col("o_orderkey").as("k"),
        expr("CAST(o_orderdate AS DATE)").as("st"),
        expr("date_add(CAST(o_orderdate AS DATE), CAST(o_orderkey % 14 AS INT) + 1)").as("en"))
      .withColumn("sb", floor(expr("datediff(st, DATE'1995-01-01')") / 7))
      .withColumn("eb", floor(expr("datediff(en, DATE'1995-01-01')") / 7))
    val bucketed = iv.withColumn("b", explode(expr("sequence(sb, eb)")))
    val a = bucketed.select(col("b"), col("k").as("ka"), col("st").as("sa"),
      col("en").as("ea"), col("sb").as("sba"))
    val bb = bucketed.select(col("b"), col("k").as("kb"), col("st").as("sbt"),
      col("en").as("ebt"), col("sb").as("sbb"))
    a.join(bb, Seq("b"))
      .filter(col("ka") < col("kb"))
      .filter(col("sa") < col("ebt") && col("sbt") < col("ea"))
      .filter(col("b") === greatest(col("sba"), col("sbb")))
      .select(
        expr("datediff(least(ea, ebt), greatest(sa, sbt))").cast("long")
          .as("overlap_days"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("overlap_days")).as("total_overlap_days"),
        max(col("overlap_days")).as("max_overlap_days"))
  }

  private val q66Sql =
    """WITH iv AS (
      | SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS st,
      |  CAST(o_orderdate AS DATE) + CAST(o_orderkey % 14 AS INT) + 1 AS en
      | FROM orders WHERE o_orderkey % 37 = 0),
      |p AS (
      | SELECT a.k, date_diff('day', greatest(a.st, b.st), least(a.en, b.en))
      |   AS overlap_days
      | FROM iv a JOIN iv b ON a.k < b.k AND a.st < b.en AND b.st < a.en)
      |SELECT count(*) AS n_pairs,
      | CAST(sum(overlap_days) AS BIGINT) AS total_overlap_days,
      | CAST(max(overlap_days) AS BIGINT) AS max_overlap_days
      |FROM p""".stripMargin

  // B67 — COHORT RETENTION matrix (the product-analytics staple): a
  // user's cohort is their first-activity week; retention at offset k
  // = the share of that cohort active k weeks later. Three hash aggs,
  // all map-side combinable: (user → first week), dedup (user, week),
  // then (cohort, offset) counts joined to cohort sizes. Shuffle keys
  // are (user) then (cohort, offset) — never raw events — and the
  // matrix is O(weeks²) rows regardless of data volume. Weeks are
  // integer epoch-day/7 buckets (identical floor arithmetic both
  // engines, no engine week-of-year semantics).
  private def q67Retention(s: SparkSession, dir: String): DataFrame = {
    val uw = t(s, dir, "events")
      .select(col("user_id"),
        floor(expr("datediff(CAST(ts AS DATE), DATE'2024-01-01')") / 7)
          .as("wk"))
      .distinct()
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    val sizes = cohorts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_users"))
    uw.join(cohorts, Seq("user_id"))
      .withColumn("offset", col("wk") - col("cohort"))
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"),
        col("cohort_users"),
        round(col("n_active") / col("cohort_users"), 6).as("retention"))
      .orderBy(col("cohort"), col("offset"))
  }

  private val q67Sql =
    """WITH uw AS (
      | SELECT DISTINCT user_id,
      |  (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS wk
      | FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id),
      |sz AS (SELECT cohort, count(*) AS cohort_users FROM c GROUP BY cohort),
      |act AS (
      | SELECT cohort, wk - cohort AS "offset", count(*) AS n_active
      | FROM uw JOIN c USING (user_id) GROUP BY cohort, wk - cohort)
      |SELECT cohort, "offset", n_active, cohort_users,
      | round(n_active * 1.0 / cohort_users, 6) AS retention
      |FROM act JOIN sz USING (cohort)
      |ORDER BY cohort, "offset"""".stripMargin

  // B68 — period-over-period deltas (the MoM/YoY reporting staple):
  // monthly revenue, % change vs previous month and vs same month
  // last year, via lag(1)/lag(12) over the month series. The series
  // has FIXED cardinality (one row per month whatever the data
  // volume), so the single-partition window is a non-issue — all the
  // heavy lifting is the map-side-combining month aggregation under
  // it. Revenue is rounded to cents BEFORE the ratios, so both
  // engines divide identical numbers.
  private def q68MomChange(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .groupBy(expr("CAST(date_trunc('month', o_orderdate) AS DATE)").as("month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("prev", lag(col("revenue"), 1).over(w))
      .withColumn("prev_yr", lag(col("revenue"), 12).over(w))
      .select(col("month"), col("revenue"), col("n_orders"),
        round((col("revenue") - col("prev")) / col("prev") * 100, 4)
          .as("mom_pct"),
        round((col("revenue") - col("prev_yr")) / col("prev_yr") * 100, 4)
          .as("yoy_pct"))
      .orderBy(col("month"))
  }

  private val q68Sql =
    """WITH m AS (
      | SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |  round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
      | FROM orders GROUP BY 1),
      |l AS (
      | SELECT *, lag(revenue, 1) OVER (ORDER BY month) AS prev,
      |  lag(revenue, 12) OVER (ORDER BY month) AS prev_yr
      | FROM m)
      |SELECT month, revenue, n_orders,
      | round((revenue - prev) / prev * 100, 4) AS mom_pct,
      | round((revenue - prev_yr) / prev_yr * 100, 4) AS yoy_pct
      |FROM l ORDER BY month""".stripMargin

  // B69 — event TRANSITION matrix (the Markov/sankey view of user
  // journeys): lag(event_type) per user over event time gives the
  // (from, to) edge stream; two hash aggs produce counts and
  // row-normalized transition probabilities. The window partitions by
  // user_id — millions of small independent partitions at scale, the
  // OPPOSITE of a global-order window — and the matrix output is
  // O(|types|²) rows regardless of volume.
  private def q69Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val edges = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = edges.groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_total"))
    counts.join(totals, Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"),
        round(col("n") / col("row_total"), 6).as("p"))
      .orderBy(col("prev_type"), col("event_type"))
  }

  private val q69Sql =
    """WITH e AS (
      | SELECT prev_type, event_type FROM (
      |  SELECT event_type, lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS prev_type
      |  FROM events)
      | WHERE prev_type IS NOT NULL),
      |c AS (SELECT prev_type, event_type, count(*) AS n FROM e GROUP BY 1, 2),
      |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS row_total
      |      FROM c GROUP BY 1)
      |SELECT prev_type, event_type, n,
      | round(n * 1.0 / row_total, 6) AS p
      |FROM c JOIN t USING (prev_type)
      |ORDER BY prev_type, event_type""".stripMargin

  // B70 — WELCH's t-TEST from sufficient statistics (the A/B-test
  // primitive): URGENT-priority orders vs the rest on o_totalprice.
  // Engines' stddev/var builtins differ in bias correction and
  // summation algorithm, so both sides fold the same (n, Σx, Σx²)
  // power sums — one map-side-combining agg, shuffle = 3 doubles per
  // arm at ANY scale — and apply Welch's t and the Welch–
  // Satterthwaite df formula explicitly. Prices are pre-scaled ×1e-3
  // (B62's headroom trick).
  private def q70AbTtest(s: SparkSession, dir: String): DataFrame = {
    val armed = t(s, dir, "orders")
      .select(when(col("o_orderpriority") === "1-URGENT", "urgent")
        .otherwise("rest").as("arm"),
        (col("o_totalprice") / 1000.0).as("x"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("x*x")).as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      // unbiased sample variance from power sums
      .withColumn("v",
        (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
    val u = armed.filter(col("arm") === "urgent")
      .select(col("n").as("nu"), col("mean").as("mu"), col("v").as("vu"))
    val r = armed.filter(col("arm") === "rest")
      .select(col("n").as("nr"), col("mean").as("mr"), col("v").as("vr"))
    u.crossJoin(r)
      .withColumn("se2", col("vu") / col("nu") + col("vr") / col("nr"))
      .withColumn("t_stat",
        (col("mu") - col("mr")) / sqrt(col("se2")))
      // n²·(n−1) in DOUBLE: the long product overflows past n ≈ 2.1M
      // (n³ > 2⁶³ — hit at sf10 where the rest arm has ~12M orders).
      // Not exact past 2⁵³, but welch_df rounds to 2 decimals and the
      // term only enters as a denominator of a tiny correction, so the
      // oracle hash is unchanged at every probed SF. The oracle SQL
      // mirrors the DOUBLE cast so both engines take the same path.
      .withColumn("welch_df",
        col("se2") * col("se2") /
          (col("vu") * col("vu") /
            (col("nu").cast("double") * col("nu") * (col("nu") - 1))
            + col("vr") * col("vr") /
            (col("nr").cast("double") * col("nr") * (col("nr") - 1))))
      .select(col("nu"), col("nr"),
        round(col("mu"), 4).as("mean_urgent"),
        round(col("mr"), 4).as("mean_rest"),
        round(col("t_stat"), 4).as("t_stat"),
        round(col("welch_df"), 2).as("welch_df"),
        (abs(col("t_stat")) >= 1.96).as("significant_5pct"))
  }

  private val q70Sql =
    """WITH a AS (
      | SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
      |   ELSE 'rest' END AS arm, o_totalprice / 1000.0 AS x
      | FROM orders),
      |g AS (
      | SELECT arm, count(*) AS n, sum(x) AS s1, sum(x*x) AS s2 FROM a
      | GROUP BY arm),
      |st AS (
      | SELECT arm, n, s1 / n AS mean,
      |  (s2 - s1 * s1 / n) / (n - 1) AS v
      | FROM g),
      |u AS (SELECT n AS nu, mean AS mu, v AS vu FROM st WHERE arm = 'urgent'),
      |r AS (SELECT n AS nr, mean AS mr, v AS vr FROM st WHERE arm = 'rest'),
      |w AS (
      | SELECT *, vu / nu + vr / nr AS se2 FROM u CROSS JOIN r)
      |SELECT nu, nr, round(mu, 4) AS mean_urgent, round(mr, 4) AS mean_rest,
      | round((mu - mr) / sqrt(se2), 4) AS t_stat,
      | round(se2 * se2 / (vu * vu / (CAST(nu AS DOUBLE) * nu * (nu - 1))
      |   + vr * vr / (CAST(nr AS DOUBLE) * nr * (nr - 1))), 2) AS welch_df,
      | abs((mu - mr) / sqrt(se2)) >= 1.96 AS significant_5pct
      |FROM w""".stripMargin

  // B71 — Pearson CORRELATION matrix from one pass of cross power
  // sums (Σx, Σy, Σxy per pair): the engines' corr() builtins use
  // different one/two-pass algorithms, so the formula is applied
  // explicitly to identical sums. The UNPIVOTED pair layout (one row
  // per (var_a, var_b)) is the shape a 100-column feature audit
  // needs — pairs explode map-side, the shuffle carries one 5-double
  // row per pair, never the data.
  private def q71CorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val vars = Seq("qty" -> "l_quantity", "price" -> "l_extendedprice",
      "disc" -> "l_discount", "tax" -> "l_tax")
    val base = t(s, dir, "lineitem").select(
      vars.map { case (a, c) => (col(c) / 100.0).as(a) }: _*)
    val pairs = for {
      (a, ia) <- vars.map(_._1).zipWithIndex
      (b, ib) <- vars.map(_._1).zipWithIndex if ib > ia
    } yield (a, b)
    val exploded = base.select(pairs.map { case (a, b) =>
      struct(lit(a).as("va"), lit(b).as("vb"), col(a).as("x"), col(b).as("y"))
        .as(s"${a}_$b")
    }: _*)
      .select(explode(array(pairs.map { case (a, b) => col(s"${a}_$b") }: _*))
        .as("p"))
      .select(col("p.va"), col("p.vb"), col("p.x"), col("p.y"))
    exploded.groupBy(col("va"), col("vb"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("corr_xy",
        (col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
      .select(col("va"), col("vb"), col("n"),
        (round(col("corr_xy"), 4) + lit(0.0)).as("pearson_r"))
      .orderBy(col("va"), col("vb"))
  }

  private val q71Sql =
    """WITH b AS (
      | SELECT l_quantity / 100.0 AS qty, l_extendedprice / 100.0 AS price,
      |  l_discount / 100.0 AS disc, l_tax / 100.0 AS tax
      | FROM lineitem),
      |e AS (
      | SELECT 'disc' AS va, 'tax' AS vb, disc AS x, tax AS y FROM b
      | UNION ALL SELECT 'price', 'disc', price, disc FROM b
      | UNION ALL SELECT 'price', 'tax', price, tax FROM b
      | UNION ALL SELECT 'qty', 'price', qty, price FROM b
      | UNION ALL SELECT 'qty', 'disc', qty, disc FROM b
      | UNION ALL SELECT 'qty', 'tax', qty, tax FROM b),
      |g AS (
      | SELECT va, vb, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |  sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      | FROM e GROUP BY va, vb)
      |SELECT va, vb, n,
      | round((sxy - sx * sy / n) /
      |   (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 4) + 0
      |   AS pearson_r
      |FROM g ORDER BY va, vb""".stripMargin

  // B72 — OLS simple regression from sufficient statistics (price ~
  // quantity per return flag): slope, intercept, R² from the same
  // five power sums as B71 — the one-pass, map-side-combinable shape
  // that scales to any row count (a GLM on 100 TB starts exactly
  // here: X'X and X'y are power sums). Closed-form two-variable OLS;
  // both engines apply the identical algebra.
  private def q72Ols(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").as("x"),
        (col("l_extendedprice") / 1000.0).as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n"))
      .withColumn("r2",
        pow(col("n") * col("sxy") - col("sx") * col("sy"), 2) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))))
      .select(col("l_returnflag"), col("n"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 4).as("intercept"),
        round(col("r2"), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  private val q72Sql =
    """WITH g AS (
      | SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sx,
      |  sum(l_extendedprice / 1000.0) AS sy,
      |  sum(l_quantity * (l_extendedprice / 1000.0)) AS sxy,
      |  sum(l_quantity * l_quantity) AS sxx,
      |  sum((l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)) AS syy
      | FROM lineitem GROUP BY l_returnflag),
      |o AS (
      | SELECT *, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
      | FROM g)
      |SELECT l_returnflag, n, round(slope, 6) AS slope,
      | round((sy - slope * sx) / n, 4) AS intercept,
      | round(pow(n * sxy - sx * sy, 2) /
      |   ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM o ORDER BY l_returnflag""".stripMargin

  // B73 — MEDIAN ABSOLUTE DEVIATION (robust dispersion + outlier
  // gate): MAD = median(|x − median(x)|), immune to the heavy tails
  // that poison B62's moment-based σ. Two exact percentile passes
  // (group median joined back — q24's percentile/quantile_cont parity
  // pair), then the standard 3·1.4826·MAD outlier fence with both
  // sides rounded before comparing so the flag can't flip on float
  // noise. Shuffles: two group aggs + one broadcast-sized join of
  // per-group medians.
  private def q73Mad(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").as("x"))
    val med = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(x, 0.5)").as("med"))
    val dev = li.join(broadcast(med), Seq("l_returnflag"))
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("l_returnflag"))
      .agg(expr("percentile(adev, 0.5)").as("mad"), count(lit(1)).as("n"))
    dev.join(broadcast(mad.select(col("l_returnflag"), col("mad"))),
        Seq("l_returnflag"))
      .withColumn("is_out",
        round(col("adev"), 4) > round(col("mad") * 3 * 1.4826, 4))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 4).as("median_qty"),
        round(max(col("mad")), 4).as("mad_qty"),
        sum(when(col("is_out"), 1L).otherwise(0L)).as("n_outliers"))
      .withColumn("median_qty", col("median_qty") + lit(0.0))
      .withColumn("mad_qty", col("mad_qty") + lit(0.0))
      .orderBy(col("l_returnflag"))
  }

  private val q73Sql =
    """WITH li AS (SELECT l_returnflag, l_quantity AS x FROM lineitem),
      |med AS (
      | SELECT l_returnflag, quantile_cont(x, 0.5) AS med FROM li
      | GROUP BY l_returnflag),
      |dev AS (
      | SELECT li.l_returnflag, x, abs(x - med) AS adev, med
      | FROM li JOIN med USING (l_returnflag)),
      |mad AS (
      | SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad FROM dev
      | GROUP BY l_returnflag)
      |SELECT dev.l_returnflag, count(*) AS n,
      | round(max(med), 4) + 0 AS median_qty,
      | round(max(mad), 4) + 0 AS mad_qty,
      | CAST(sum(CASE WHEN round(adev, 4) > round(mad * 3 * 1.4826, 4)
      |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev JOIN mad USING (l_returnflag)
      |GROUP BY dev.l_returnflag ORDER BY dev.l_returnflag""".stripMargin

  // B74 — GINI coefficient per group (revenue-concentration /
  // inequality analytics): the rank-weighted formula G =
  // (2·Σ i·xᵢ) / (n·Σx) − (n+1)/n over values sorted ascending.
  // Ranks come from a per-group window (groups are few and balanced
  // here; the single-group variant would ride DistributedPrefixSum,
  // J21's scalable ranking). Money is rounded to cents before the
  // rank-weighted sum so both engines weight identical values; the
  // final ratio gets one 6dp rounding.
  private def q74Gini(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("x"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("x"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("i") * col("x")).as("six"))
      .select(col("o_orderpriority"), col("n"),
        round(col("sx"), 2).as("total"),
        (round(lit(2.0) * col("six") / (col("n") * col("sx"))
          - (col("n") + 1.0) / col("n"), 6) + lit(0.0)).as("gini"))
      .orderBy(col("o_orderpriority"))
  }

  private val q74Sql =
    """WITH r AS (
      | SELECT o_orderpriority, round(o_totalprice, 2) AS x,
      |  CAST(row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY round(o_totalprice, 2), o_orderkey) AS BIGINT) AS i
      | FROM orders),
      |g AS (
      | SELECT o_orderpriority, count(*) AS n, sum(x) AS sx,
      |  sum(i * x) AS six
      | FROM r GROUP BY o_orderpriority)
      |SELECT o_orderpriority, n, round(sx, 2) AS total,
      | round(2.0 * six / (n * sx) - (n + 1.0) / n, 6) + 0 AS gini
      |FROM g ORDER BY o_orderpriority""".stripMargin

  // B75 — TIME-WEIGHTED average (TWAP — the "average over TIME, not
  // over ticks" every billing/finance/telemetry pipeline needs when
  // observations arrive unevenly): each value holds until the next
  // event, so its weight is the exact integer-microsecond interval to
  // the successor (lead over the per-user event-time order; the last
  // observation carries zero weight — a closed integral over the
  // observed span). All weights are exact longs; one window + one
  // hash agg, partitioned by user — millions of independent small
  // partitions at scale.
  private def q75Twap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("ts_us"),
        col("value").as("v"))
      .withColumn("dt", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt")).as("span_us"),
        (round(sum(col("v") * col("dt")) / sum(col("dt")), 4) + lit(0.0))
          .as("twap"))
      .filter(col("span_us") > 0)
      .orderBy(col("user_id"))
  }

  private val q75Sql =
    """WITH e AS (
      | SELECT user_id, event_id, epoch_us(ts) AS ts_us, value AS v
      | FROM events),
      |l AS (
      | SELECT user_id, v,
      |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
      |    - ts_us AS dt
      | FROM e)
      |SELECT user_id, count(*) AS n_intervals,
      | CAST(sum(dt) AS BIGINT) AS span_us,
      | round(sum(v * dt) / sum(dt), 4) + 0 AS twap
      |FROM l WHERE dt IS NOT NULL
      |GROUP BY user_id HAVING sum(dt) > 0
      |ORDER BY user_id""".stripMargin

  // B76 — TWO-PROPORTION z-TEST (B70's categorical sibling — the
  // conversion-rate A/B test): arms = user_id parity, conversion =
  // "user purchased ≥ 14 times" (the median — "ever purchased"
  // saturates this corpus at 100% and the pooled variance would be
  // 0). Per-user conversion is one hash agg, arms reduce to four
  // integers, and the pooled-variance z statistic is closed-form
  // algebra both engines apply to identical counts. The entire
  // statistical surface that ships to the decision is (n₁, x₁, n₂,
  // x₂) — at 100 TB the shuffle is still four longs.
  private def q76ConversionZtest(s: SparkSession, dir: String): DataFrame = {
    val conv = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 14L).cast("long").as("converted"))
      .withColumn("arm",
        when(col("user_id") % 2 === 0, "even").otherwise("odd"))
    val arms = conv.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
    val e = arms.filter(col("arm") === "even")
      .select(col("n").as("n1"), col("x").as("x1"))
    val o = arms.filter(col("arm") === "odd")
      .select(col("n").as("n2"), col("x").as("x2"))
    e.crossJoin(o)
      .withColumn("p1", col("x1") / col("n1"))
      .withColumn("p2", col("x2") / col("n2"))
      .withColumn("pp", (col("x1") + col("x2")) / (col("n1") + col("n2")))
      .withColumn("z",
        (col("p1") - col("p2")) /
          sqrt(col("pp") * (lit(1.0) - col("pp"))
            * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))))
      .select(col("n1"), col("x1"), col("n2"), col("x2"),
        round(col("p1"), 6).as("rate_even"),
        round(col("p2"), 6).as("rate_odd"),
        round(col("z"), 4).as("z_stat"),
        (abs(col("z")) >= 1.96).as("significant_5pct"))
  }

  private val q76Sql =
    """WITH conv AS (
      | SELECT user_id,
      |  CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    >= 14 THEN 1 ELSE 0 END AS converted,
      |  CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS arm
      | FROM events GROUP BY user_id),
      |a AS (
      | SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS x
      | FROM conv GROUP BY arm),
      |e AS (SELECT n AS n1, x AS x1 FROM a WHERE arm = 'even'),
      |o AS (SELECT n AS n2, x AS x2 FROM a WHERE arm = 'odd'),
      |c AS (
      | SELECT *, x1 * 1.0 / n1 AS p1, x2 * 1.0 / n2 AS p2,
      |  (x1 + x2) * 1.0 / (n1 + n2) AS pp
      | FROM e CROSS JOIN o),
      |zc AS (
      | SELECT *, (p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
      |   AS z
      | FROM c)
      |SELECT n1, x1, n2, x2,
      | round(p1, 6) AS rate_even, round(p2, 6) AS rate_odd,
      | round(z, 4) AS z_stat, abs(z) >= 1.96 AS significant_5pct
      |FROM zc""".stripMargin

  // B77 — CHI-SQUARE test of independence (the categorical×categorical
  // sibling of B70/B76): is order status independent of order
  // priority?  Observed counts are one hash agg over the fact table;
  // expected counts E = row_tot·col_tot/N come from two broadcast-
  // sized marginal aggs — the statistical surface that rides the
  // shuffle is r·c cells, never rows, so the same plan serves 100 TB.
  // All counts are exact longs; the only doubles are the final E and
  // (O−E)²/E divisions, identical algebra both engines. df here is
  // (3−1)(5−1)=8; the 5% critical value 15.5073 is a shared literal
  // (neither engine has a chi² CDF — shipping the threshold with the
  // statistic is what a decision pipeline does anyway).
  private def q77Chisq(s: SparkSession, dir: String): DataFrame = {
    // core factored into StatTests.chiSquare (planted-answer spec)
    val cells = t(s, dir, "orders")
      .groupBy(col("o_orderstatus").as("rk"), col("o_orderpriority").as("ck"))
      .agg(count(lit(1)).as("observed"))
    graft.operators.StatTests.chiSquare(cells)
      .select(col("rk").as("o_orderstatus"), col("ck").as("o_orderpriority"),
        col("observed"),
        round(col("expected"), 4).as("expected"),
        round(col("contrib"), 6).as("contrib"),
        col("chi2"), col("df"),
        (col("chi2") >= 15.5073).as("significant_5pct"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  private val q77Sql =
    """WITH cells AS (
      | SELECT o_orderstatus, o_orderpriority, count(*) AS observed
      | FROM orders GROUP BY o_orderstatus, o_orderpriority),
      |rt AS (SELECT o_orderstatus, sum(observed) AS row_tot
      |       FROM cells GROUP BY o_orderstatus),
      |ct AS (SELECT o_orderpriority, sum(observed) AS col_tot
      |       FROM cells GROUP BY o_orderpriority),
      |tot AS (SELECT sum(observed) AS n,
      |        count(DISTINCT o_orderstatus) AS r,
      |        count(DISTINCT o_orderpriority) AS c FROM cells),
      |sc AS (
      | SELECT cells.*, row_tot, col_tot, n, r, c,
      |  CAST(row_tot AS DOUBLE) * col_tot / n AS expected
      | FROM cells JOIN rt USING (o_orderstatus)
      |  JOIN ct USING (o_orderpriority) CROSS JOIN tot),
      |sc2 AS (
      | SELECT *, pow(observed - expected, 2) / expected AS contrib FROM sc),
      |x2 AS (SELECT round(sum(contrib), 4) AS chi2 FROM sc2)
      |SELECT o_orderstatus, o_orderpriority, observed,
      | round(expected, 4) AS expected, round(contrib, 6) AS contrib,
      | chi2, (r - 1) * (c - 1) AS df, chi2 >= 15.5073 AS significant_5pct
      |FROM sc2 CROSS JOIN x2
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // B78 — MANN-WHITNEY U (Wilcoxon rank-sum), the nonparametric A/B
  // test for when B70's t-test assumptions fail: compares
  // l_extendedprice between return flags R and A on RANKS, so heavy
  // tails can't dominate. The whole statistic is EXACT INTEGER
  // algebra until the final z: prices become cents (longs), ranks
  // are doubled (2·avg-tie-rank = 2·count_less + t + 1 — an integer
  // even for half-ranks), and the rank-sum rides per-VALUE counts —
  // the shuffle carries one row per distinct value, never rows. The
  // global cumulative count_less uses DistributedPrefixSum (no
  // single-partition window; distinct-value count is unbounded at
  // 100 TB). Tie-corrected variance; z in doubles at the very end.
  private def q78MannWhitney(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag").as("g"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    // core factored into StatTests.mannWhitney so StatsSpec can drive
    // the identical algebra on planted data with hand-computed answers
    graft.operators.StatTests.mannWhitney(
      v.select((col("g") === "R").cast("long").as("in_a"),
        col("cents").as("v")))
      .select(col("n1"), col("n2"), col("u1"),
        round(col("z"), 4).as("z_stat"),
        (abs(col("z")) >= 1.96).as("significant_5pct"))
  }

  private val q78Sql =
    """WITH v AS (
      | SELECT l_returnflag AS g,
      |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
      | FROM lineitem WHERE l_returnflag IN ('R', 'A')),
      |bv AS (
      | SELECT cents, count(*) AS t,
      |  sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS tr
      | FROM v GROUP BY cents),
      |c AS (
      | SELECT *, sum(t) OVER (ORDER BY cents
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS cum_less
      | FROM bv),
      |a AS (
      | SELECT CAST(sum(tr) AS BIGINT) AS n1,
      |  CAST(sum(t - tr) AS BIGINT) AS n2,
      |  CAST(sum(tr * (2 * cum_less + t + 1)) AS BIGINT) AS r1x2,
      |  CAST(sum(t * t * t - t) AS BIGINT) AS tie3
      | FROM c),
      |s AS (
      | SELECT *, n1 + n2 AS n,
      |  (r1x2 - n1 * (n1 + 1)) / 2.0 AS u1,
      |  CAST(n1 AS DOUBLE) * n2 / 2.0 AS mu
      | FROM a),
      |z AS (
      | SELECT *, (u1 - mu) / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0 *
      |   ((n + 1.0) - CAST(tie3 AS DOUBLE) / (n * (n - 1.0)))) AS zs
      | FROM s)
      |SELECT n1, n2, u1, round(zs, 4) AS z_stat,
      | abs(zs) >= 1.96 AS significant_5pct
      |FROM z""".stripMargin

  // B79 — DECILE LIFT / GAINS table (the model-evaluation staple):
  // customers ranked by 1995 spend into deciles, outcome = ordered
  // again in 1996; per decile conversion rate, lift vs the base rate,
  // and cumulative converter capture. Deciles come from
  // DistributedNtile (exact SQL-ntile semantics, no single-partition
  // window — the ranking shuffle is range-partitioned), spend is
  // exact cents, and the (spend DESC, custkey) order is total so
  // assignment is deterministic. The decile frame itself is 10 rows —
  // its cumulative window is trivially safe at any scale.
  private def q79DecileLift(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val spend95 = o
      .filter(col("o_orderdate") >= ts("1995-01-01") &&
        col("o_orderdate") < ts("1996-01-01"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("spend_cents"))
    val buyers96 = o
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1997-01-01"))
      .select(col("o_custkey")).distinct()
      .withColumn("converted", lit(1L))
    val scored = graft.operators.DistributedNtile
      .withNtile(spend95, 10, "decile",
        col("spend_cents").desc, col("o_custkey"))
      .join(buyers96, Seq("o_custkey"), "left")
      .withColumn("converted", coalesce(col("converted"), lit(0L)))
    val perDecile = scored.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("converted")).as("n_converted"))
    val base = perDecile.agg(sum(col("n_customers")).as("tot_n"),
      sum(col("n_converted")).as("tot_conv"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecile.crossJoin(broadcast(base))
      .withColumn("cum_conv", sum(col("n_converted")).over(wCum))
      .select(col("decile"), col("n_customers"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_customers"), 6)
          .as("conv_rate"),
        round(col("n_converted").cast("double") * col("tot_n") /
          (col("n_customers") * col("tot_conv")), 4).as("lift"),
        round(col("cum_conv").cast("double") / col("tot_conv"), 6)
          .as("cum_capture"))
      .orderBy(col("decile"))
  }

  private val q79Sql =
    """WITH s95 AS (
      | SELECT o_custkey,
      |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS spend_cents
      | FROM orders
      | WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |   AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      | GROUP BY o_custkey),
      |b96 AS (
      | SELECT DISTINCT o_custkey FROM orders
      | WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |   AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      |d AS (
      | SELECT s95.o_custkey, spend_cents,
      |  CAST(ntile(10) OVER (ORDER BY spend_cents DESC, s95.o_custkey)
      |    AS BIGINT) AS decile,
      |  CASE WHEN b96.o_custkey IS NULL THEN 0 ELSE 1 END AS converted
      | FROM s95 LEFT JOIN b96 ON s95.o_custkey = b96.o_custkey),
      |pd AS (
      | SELECT decile, count(*) AS n_customers,
      |  CAST(sum(converted) AS BIGINT) AS n_converted
      | FROM d GROUP BY decile),
      |base AS (SELECT sum(n_customers) AS tot_n,
      |         sum(n_converted) AS tot_conv FROM pd)
      |SELECT decile, n_customers, n_converted,
      | round(CAST(n_converted AS DOUBLE) / n_customers, 6) AS conv_rate,
      | round(CAST(n_converted AS DOUBLE) * tot_n /
      |   (n_customers * tot_conv), 4) AS lift,
      | round(CAST(sum(n_converted) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |   / tot_conv, 6) AS cum_capture
      |FROM pd CROSS JOIN base
      |ORDER BY decile""".stripMargin

  // B80 — KAPLAN-MEIER survival estimate (churn/retention analytics
  // with CENSORING — B67's retention grid can't say "still alive,
  // just not observed long enough"): per customer, lifetime = months
  // from first to last order; churned if the last order predates
  // 2001-03 (within 6 months of the corpus end = still at risk ⇒
  // censored). The KM table is one hash agg to per-month (d, censored)
  // counts — the frame is bounded by the corpus month span (~80
  // rows), so its windows are safe at any scale; rows never ride
  // them. n_at_risk(t) = suffix sum, S(t) = Π(1 − d/n) as an ORDERED
  // LEFT FOLD over collected factors (aggregate() over a window
  // collect_list) — DuckDB's windowed product() folds in the same
  // order, so the doubles multiply in the identical sequence and the
  // 6dp round is belt-and-braces, not load-bearing.
  private def q80Survival(s: SparkSession, dir: String): DataFrame = {
    val life = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(date_trunc("month", min(col("o_orderdate"))).as("m0"),
        date_trunc("month", max(col("o_orderdate"))).as("m1"))
      .withColumn("t_months", months_between(col("m1"), col("m0")).cast("long"))
      .withColumn("churned",
        when(col("m1") < ts("2001-03-01"), 1L).otherwise(0L))
    // core factored into StatTests.kaplanMeier (planted-answer spec)
    graft.operators.StatTests.kaplanMeier(
      life.select(col("t_months").as("t"), col("churned").as("event")))
      .select(col("t").as("t_months"), col("n_at_risk"), col("d"),
        col("censored"), round(col("s_km"), 6).as("s_km"))
      .orderBy(col("t_months"))
  }

  private val q80Sql =
    """WITH life AS (
      | SELECT o_custkey,
      |  date_trunc('month', min(o_orderdate)) AS m0,
      |  date_trunc('month', max(o_orderdate)) AS m1
      | FROM orders GROUP BY o_custkey),
      |lt AS (
      | SELECT o_custkey, date_diff('month', m0, m1) AS t_months,
      |  CASE WHEN m1 < TIMESTAMP '2001-03-01 00:00:00' THEN 1 ELSE 0 END
      |    AS churned
      | FROM life),
      |km AS (
      | SELECT t_months, CAST(sum(churned) AS BIGINT) AS d,
      |  CAST(sum(1 - churned) AS BIGINT) AS censored
      | FROM lt GROUP BY t_months),
      |r AS (
      | SELECT *, CAST(sum(d + censored) OVER (ORDER BY t_months
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      |   AS n_at_risk
      | FROM km),
      |f AS (
      | SELECT *, 1.0 - CAST(d AS DOUBLE) / n_at_risk AS factor FROM r)
      |SELECT t_months, n_at_risk, d, censored,
      | round(product(factor) OVER (ORDER BY t_months
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS s_km
      |FROM f ORDER BY t_months""".stripMargin

  // B81 — BLOOM-PREFILTER JOIN (the runtime-row-filter pattern Spark
  // plans as `runtimeFilterBloomFilter` and Iceberg/Delta readers get
  // from dynamic filtering): the selective dim side's JOIN-KEY DOMAIN
  // is aggregated into one bloom (partials OR-merge map-side),
  // broadcast, and probed on the fact side BEFORE the join — fact
  // rows that cannot match never enter the join's hash relation. The
  // final join is exact, so bloom false positives cost only wasted
  // probe rows, never wrong rows — the RESULT is identical to the
  // plain join, which is exactly what the oracle checks; the
  // require() proves the prefilter genuinely pruned (i.e. the bloom
  // is wired into the plan, not decorative). At 100 TB this is the
  // difference between shuffling/building a hash relation over the
  // full fact table and over the ~selectivity fraction that survives.
  private def q81BloomJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.BloomFunctions.{bloom, bloomContains}
    val dim = t(s, dir, "part")
      .filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"), col("p_name"))
    // SIZE THE FILTER TO THE DOMAIN (measured lesson: a fixed 64 Kbit
    // filter at 10× keys pushed FPR to ~50% and the prefilter stopped
    // pruning): ~16 bits/key keeps FPR(k=4) ≈ 0.2% at any scale; the
    // count is one tiny agg over the already-filtered dim side.
    val nKeys = dim.count()
    val numBits = math.max(65536L, java.lang.Long.highestOneBit(
      nKeys * 16 * 2 - 1)).min(1L << 28).toInt
    // The built filter is collected ONCE and embedded as a LITERAL in
    // the probe expression — exactly how Spark's own runtime filter
    // injects its bloom. Carrying it as a broadcast-joined COLUMN
    // instead copies the full buffer into every probe row's UnsafeRow:
    // measured 227 s at sf1 (1 MB filter × 6M rows) vs ~8 s as a
    // literal. The filter is a driver artifact of the same class as
    // k-means centroids: O(bits), independent of fact size.
    val bfBytes = dim.agg(bloom(col("p_partkey"), numBits, 4).as("bf"))
      .head().getAs[Array[Byte]](0)
    val fact = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val pre = fact.filter(bloomContains(lit(bfBytes), col("l_partkey")))
    // prove the bloom pruned: survivors must be well under the fact
    // count (ECONOMY parts are ~1/5 of the domain; 4-hash/64Kbit FPR
    // is far below the 50% headroom this leaves)
    val nFact = fact.count()
    val nPre = pre.count()
    require(nPre * 2 < nFact,
      s"bloom prefilter did not prune: $nPre of $nFact rows survived")
    pre.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("p_name"))
  }

  private val q81Sql =
    """SELECT p_name, count(*) AS n_lines,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'ECONOMY'
      |GROUP BY p_name ORDER BY p_name""".stripMargin

  // B82 — FIRST/LAST-TOUCH ATTRIBUTION (the marketing-analytics
  // staple funnels don't answer: which channel gets credit for a
  // purchase?): per user, a running "first/last non-purchase event
  // type so far" rides one event-time window (first/last with
  // ignoreNulls over unbounded-preceding rows — per-USER partitions,
  // so the window distributes; no global sort anywhere), then each
  // purchase row reads its credit off the running columns.
  // Purchases with no preceding touch credit 'none' — the honest
  // bucket attribution tools hide. One shuffle on user_id; at 100 TB
  // the same plan holds because the window key is the natural
  // partition key.
  private def q82Attribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    t(s, dir, "events")
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("first_touch"), lit("none")).as("first_touch"),
        coalesce(col("last_touch"), lit("none")).as("last_touch"),
        col("value"))
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("attributed_value"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  private val q82Sql =
    """WITH r AS (
      | SELECT event_type, value,
      |  first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
      |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      | FROM events)
      |SELECT coalesce(first_touch, 'none') AS first_touch,
      | coalesce(last_touch, 'none') AS last_touch,
      | count(*) AS n_purchases, round(sum(value), 2) AS attributed_value
      |FROM r WHERE event_type = 'purchase'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // B84 — KEY-SEQUENCE GAP AUDIT (the data-quality sweep for "did
  // ingestion drop rows?"): find every gap in the orderkey sequence
  // WITHOUT a global-order window (lag over an unpartitioned ORDER BY
  // is the single-partition anti-pattern). Scale-safe decomposition:
  // keys bucket by DIV 1000 — within a bucket, missing = span −
  // count (one hash agg); ACROSS bucket boundaries, the gap between
  // bucket i's max and the next non-empty bucket's min comes from a
  // window over the PER-BUCKET frame (≤ n/1000 rows — three orders
  // of magnitude smaller than the data; at 100 TB recurse the same
  // trick once more if even that frame is large). Output: per-bucket
  // interior missing + boundary missing, plus totals that reconcile
  // against (global span − distinct keys) — an internal consistency
  // proof the oracle re-derives independently.
  private def q84SequenceGaps(s: SparkSession, dir: String): DataFrame = {
    val keys = t(s, dir, "orders").select(col("o_orderkey")).distinct()
    val buckets = keys
      .groupBy((col("o_orderkey") / 1000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_keys"), min(col("o_orderkey")).as("k_min"),
        max(col("o_orderkey")).as("k_max"))
    val wNext = Window.orderBy(col("bucket")) // per-bucket frame: tiny
    val audited = buckets
      .withColumn("interior_missing",
        col("k_max") - col("k_min") + 1 - col("n_keys"))
      .withColumn("next_min", lead(col("k_min"), 1).over(wNext))
      .withColumn("boundary_missing",
        coalesce(col("next_min") - col("k_max") - 1, lit(0L)))
    audited
      .agg(sum(col("n_keys")).as("n_keys"),
        min(col("k_min")).as("k_lo"), max(col("k_max")).as("k_hi"),
        sum(col("interior_missing")).as("interior_missing"),
        sum(col("boundary_missing")).as("boundary_missing"),
        count(lit(1)).as("n_buckets"))
      .withColumn("total_missing",
        col("interior_missing") + col("boundary_missing"))
      .withColumn("reconciles",
        col("total_missing") === col("k_hi") - col("k_lo") + 1 - col("n_keys"))
  }

  private val q84Sql =
    """WITH k AS (SELECT DISTINCT o_orderkey FROM orders),
      |b AS (
      | SELECT o_orderkey // 1000 AS bucket, count(*) AS n_keys,
      |  min(o_orderkey) AS k_min, max(o_orderkey) AS k_max
      | FROM k GROUP BY 1),
      |a AS (
      | SELECT *, k_max - k_min + 1 - n_keys AS interior_missing,
      |  coalesce(lead(k_min) OVER (ORDER BY bucket) - k_max - 1, 0)
      |    AS boundary_missing
      | FROM b),
      |t AS (
      | SELECT CAST(sum(n_keys) AS BIGINT) AS n_keys, min(k_min) AS k_lo,
      |  max(k_max) AS k_hi,
      |  CAST(sum(interior_missing) AS BIGINT) AS interior_missing,
      |  CAST(sum(boundary_missing) AS BIGINT) AS boundary_missing,
      |  count(*) AS n_buckets
      | FROM a)
      |SELECT *, interior_missing + boundary_missing AS total_missing,
      | interior_missing + boundary_missing = k_hi - k_lo + 1 - n_keys
      |   AS reconciles
      |FROM t""".stripMargin

  // B85 — BENFORD first-digit audit (the fraud/data-quality screen:
  // organically-generated amounts follow P(d) = log10(1+1/d);
  // fabricated or truncated data doesn't): first significant digit
  // via string ops on the cent-exact amount (no float log in the
  // digit extraction), exact counts, and the expected Benford mass
  // as nine SHARED LITERALS (both engines compare against the same
  // constants — no libm log10 in the gate). Output per digit:
  // count, observed frac, expected, |dev|; plus the chi-square-style
  // total deviation as a repeated column. One hash agg; 9-row frame.
  private def q85Benford(s: SparkSession, dir: String): DataFrame = {
    val benford = Seq(
      1 -> 0.30103, 2 -> 0.17609, 3 -> 0.12494, 4 -> 0.09691,
      5 -> 0.07918, 6 -> 0.06695, 7 -> 0.05799, 8 -> 0.05115, 9 -> 0.04576)
    val exp = benford.map { case (d, p) =>
      struct(lit(d.toLong).as("digit"), lit(p).as("benford_p"))
    }
    val digits = t(s, dir, "orders")
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("n_total"))
    digits
      .join(broadcast(s.range(1).select(explode(array(exp: _*)).as("e"))
        .select(col("e.digit"), col("e.benford_p"))), Seq("digit"))
      .crossJoin(broadcast(tot))
      .withColumn("obs_frac", col("n").cast("double") / col("n_total"))
      .withColumn("abs_dev", abs(col("obs_frac") - col("benford_p")))
      .select(col("digit"), col("n"),
        round(col("obs_frac"), 6).as("obs_frac"), col("benford_p"),
        round(col("abs_dev"), 6).as("abs_dev"))
      .orderBy(col("digit"))
  }

  private val q85Sql =
    """WITH e AS (
      | SELECT * FROM (VALUES (1, 0.30103), (2, 0.17609), (3, 0.12494),
      |  (4, 0.09691), (5, 0.07918), (6, 0.06695), (7, 0.05799),
      |  (8, 0.05115), (9, 0.04576)) v(digit, benford_p)),
      |d AS (
      | SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
      |   AS VARCHAR), 1, 1) AS BIGINT) AS digit, count(*) AS n
      | FROM orders GROUP BY 1),
      |t AS (SELECT sum(n) AS n_total FROM d)
      |SELECT d.digit, n, round(CAST(n AS DOUBLE) / n_total, 6) AS obs_frac,
      | benford_p,
      | round(abs(CAST(n AS DOUBLE) / n_total - benford_p), 6) AS abs_dev
      |FROM d JOIN e ON e.digit = d.digit CROSS JOIN t
      |ORDER BY d.digit""".stripMargin

  // B86 — SESSION BOUNCE metrics (product-analytics layer over q21's
  // sessionization): sessions = 30-min-gap islands per user (lag +
  // running sum of gap flags, per-USER windows — distributes on the
  // natural key), then per-session size/span and the corpus-level
  // bounce rate (single-event sessions). Span is exact integer
  // seconds; ratios round at the edge. One shuffle on user_id, one
  // per-session hash agg, one global fold — the same plan at 100 TB.
  private def q86BounceSessions(s: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // exact integer MICROS on both sides (unix_timestamp truncates to
    // seconds; DuckDB's epoch() keeps fractional seconds — sub-second
    // drift turned the averages red once)
    val ev = t(s, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wSeq))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(wSeq.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
    val sessions = ev.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("ts_us")) - min(col("ts_us"))) / 1000000.0).as("span_sec"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
      round(avg(col("n_events")), 4).as("avg_events"),
      round(avg(col("span_sec")), 4).as("avg_span_sec"))
      .withColumn("bounce_rate",
        round(col("n_bounce").cast("double") / col("n_sessions"), 6))
  }

  private val q86Sql =
    """WITH e AS (
      | SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
      |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS prev_us
      | FROM events),
      |f AS (
      | SELECT *, CASE WHEN prev_us IS NULL
      |   OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      | FROM e),
      |g AS (
      | SELECT *, sum(new_session) OVER (PARTITION BY user_id
      |   ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |   CURRENT ROW) AS session_id
      | FROM f),
      |sess AS (
      | SELECT user_id, session_id, count(*) AS n_events,
      |  (max(ts_us) - min(ts_us)) / 1000000.0 AS span_sec
      | FROM g GROUP BY user_id, session_id)
      |SELECT count(*) AS n_sessions,
      | CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |   AS n_bounce,
      | round(avg(n_events), 4) AS avg_events,
      | round(avg(span_sec), 4) AS avg_span_sec,
      | round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |   / count(*), 6) AS bounce_rate
      |FROM sess""".stripMargin

  // B87 — WALD-WOLFOWITZ RUNS TEST (randomness audit on an ordered
  // sequence — serial correlation that B71's cross-variable Pearson
  // can't see): per event type, the value stream in event-time order
  // becomes above/below-median flags; R = number of runs, compared
  // to E[R] = 2·n1·n2/n + 1 with the closed-form variance. The flag
  // and run-boundary counting ride per-TYPE windows (5 partitions —
  // the ordered scan distributes by the group key; a global sequence
  // would need the B84 bucketing trick instead). Median from exact
  // percentile on cent-scaled values; counts exact; z in doubles at
  // the end.
  private def q87RunsTest(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.5)").as("med"))
    // core factored into StatTests.runsTest (planted-answer spec)
    val flagged = ev.join(broadcast(med), Seq("event_type"))
      .filter(col("cents") =!= col("med")) // ties at the median drop (standard)
      .select(col("event_type").as("grp"), col("ts"), col("event_id"),
        (col("cents") > col("med")).cast("long").as("above"))
    graft.operators.StatTests
      .runsTest(flagged, Seq(col("ts"), col("event_id")))
      .select(col("grp").as("event_type"), col("n1"), col("n2"), col("runs"),
        round(col("mu"), 4).as("expected_runs"),
        round(col("z"), 4).as("z_stat"),
        (abs(col("z")) >= 1.96).as("nonrandom_5pct"))
      .orderBy(col("event_type"))
  }

  private val q87Sql =
    """WITH ev AS (
      | SELECT event_type, ts, event_id,
      |  CAST(round(value * 100, 0) AS BIGINT) AS cents
      | FROM events),
      |md AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
      |       FROM ev GROUP BY event_type),
      |f AS (
      | SELECT ev.event_type, ts, event_id,
      |  CASE WHEN cents > med THEN 1 ELSE 0 END AS above
      | FROM ev JOIN md ON ev.event_type = md.event_type
      | WHERE cents <> med),
      |r AS (
      | SELECT *, CASE WHEN lag(above) OVER (PARTITION BY event_type
      |    ORDER BY ts, event_id) IS DISTINCT FROM above THEN 1 ELSE 0 END
      |   AS new_run
      | FROM f),
      |a AS (
      | SELECT event_type, CAST(sum(above) AS BIGINT) AS n1,
      |  CAST(sum(1 - above) AS BIGINT) AS n2,
      |  CAST(sum(new_run) AS BIGINT) AS runs
      | FROM r GROUP BY event_type),
      |st AS (
      | SELECT *, n1 + n2 AS n,
      |  2.0 * n1 * n2 / (n1 + n2) + 1.0 AS mu
      | FROM a),
      |z AS (
      | SELECT *, (runs - mu) / sqrt((mu - 1.0) * (mu - 2.0) / (n - 1.0)) AS zs
      | FROM st)
      |SELECT event_type, n1, n2, runs, round(mu, 4) AS expected_runs,
      | round(zs, 4) AS z_stat, abs(zs) >= 1.96 AS nonrandom_5pct
      |FROM z ORDER BY event_type""".stripMargin

  // B88 — SPRT, Wald's SEQUENTIAL probability ratio test (the
  // always-valid A/B monitor — B76's fixed-horizon z-test peeked at
  // daily would inflate false positives; SPRT's boundaries make
  // continuous peeking legitimate): H0 p=0.5 vs H1 p=0.6 on per-user
  // conversion, users ordered by user_id (the deterministic
  // enrollment order). Cumulative LLR = x·ln(1.2) + (n−x)·ln(0.8)
  // with BOTH logs (and the ln(19) boundaries) shipped as shared
  // 16-digit LITERALS — no libm in the gate anywhere. The cumulative
  // conversion count rides DistributedPrefixSum (no single-partition
  // window over the enrollment order); the decision row is the
  // FIRST boundary crossing (min enrollment rank among crossers —
  // one tiny agg), plus the end-of-data LLR.
  private def q88Sprt(s: SparkSession, dir: String): DataFrame = {
    val ln12 = 0.1823215567939546 // ln(1.2)
    val ln08 = -0.2231435513142097 // ln(0.8)
    val lnA = 2.9444389791664403 // ln(19): accept H1 at alpha=beta=0.05
    val lnB = -2.9444389791664403 // ln(1/19): accept H0
    val conv = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 14L).cast("long").as("converted"))
    val ranked = graft.operators.DistributedPrefixSum
      .withRunningTotal(conv.withColumn("one", lit(1L)), col("one"), "rk",
        col("user_id"))
      .drop("one")
    val cum = graft.operators.DistributedPrefixSum
      .withRunningTotal(ranked, col("converted"), "x", col("user_id"))
      .withColumn("llr",
        col("x") * ln12 + (col("rk") - col("x")) * ln08)
      .withColumn("crossed",
        when(col("llr") >= lnA, "accept_h1")
          .when(col("llr") <= lnB, "accept_h0"))
    // a no-group agg over an empty crosser set still returns ONE row
    // (null struct) — coalesce it into an explicit 'undecided' row so
    // a small corpus that never crosses stays a loud, comparable
    // result instead of an engine-dependent empty-vs-null mismatch
    // (sf0.001 found exactly that)
    val firstCross = cum.filter(col("crossed").isNotNull)
      .agg(min(struct(col("rk"), col("x"), col("llr"), col("crossed")))
        .as("f"))
      .select(coalesce(col("f.rk"), lit(0L)).as("n_at_decision"),
        coalesce(col("f.x"), lit(0L)).as("x_at_decision"),
        coalesce(col("f.llr"), lit(0.0)).as("llr_at_decision"),
        coalesce(col("f.crossed"), lit("undecided")).as("decision"))
    val tail = cum.agg(max(col("rk")).as("n_total"),
      max(struct(col("rk"), col("llr"))).as("t"))
      .select(col("n_total"), col("t.llr").as("llr_final"))
    firstCross.crossJoin(broadcast(tail))
      .select(col("decision"), col("n_at_decision"), col("x_at_decision"),
        round(col("llr_at_decision"), 4).as("llr_at_decision"),
        col("n_total"), round(col("llr_final"), 4).as("llr_final"))
  }

  private val q88Sql =
    """WITH conv AS (
      | SELECT user_id,
      |  CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    >= 14 THEN 1 ELSE 0 END AS converted
      | FROM events GROUP BY user_id),
      |c AS (
      | SELECT user_id,
      |  row_number() OVER (ORDER BY user_id) AS rk,
      |  sum(converted) OVER (ORDER BY user_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x
      | FROM conv),
      |l AS (
      | SELECT *, x * 0.1823215567939546 + (rk - x) * -0.2231435513142097
      |   AS llr
      | FROM c),
      |cr AS (
      | SELECT *, CASE WHEN llr >= 2.9444389791664403 THEN 'accept_h1'
      |   WHEN llr <= -2.9444389791664403 THEN 'accept_h0' END AS crossed
      | FROM l),
      |fc AS (
      | SELECT coalesce(min(rk), 0) AS n_at_decision,
      |  CAST(coalesce(min_by(x, rk), 0) AS BIGINT) AS x_at_decision,
      |  coalesce(min_by(llr, rk), 0.0) AS llr_at_decision,
      |  coalesce(min_by(crossed, rk), 'undecided') AS decision
      | FROM cr WHERE crossed IS NOT NULL),
      |tl AS (
      | SELECT max(rk) AS n_total,
      |  max_by(llr, rk) AS llr_final FROM l)
      |SELECT decision, n_at_decision, x_at_decision,
      | round(llr_at_decision, 4) AS llr_at_decision,
      | n_total, round(llr_final, 4) AS llr_final
      |FROM fc CROSS JOIN tl""".stripMargin

  // B89 — POISSON BOOTSTRAP confidence interval (the resampling
  // method that actually distributes: classic bootstrap draws n rows
  // WITH replacement per replicate — a shuffle per replicate; the
  // Poisson(1) approximation gives every row an independent weight
  // per replicate, so ALL B replicates ride ONE map-side pass and
  // the shuffle carries B partial rows per partition). Weights are
  // drawn with NO floating point at all: the per-(row, replicate)
  // hash (integer quadratic mod M, J14's family with
  // replicate-varied coefficients) is compared against the SIX
  // integer thresholds ⌈M·CDF_Poisson(1)(k)⌉ — weight = #thresholds
  // passed. Replicate means are exact-integer ratios; the 95% CI is
  // the exact percentile over the 32-value replicate frame (q24's
  // percentile/quantile_cont parity pair).
  private def q89Bootstrap(s: SparkSession, dir: String): DataFrame = {
    val M = 1000003L
    val B = 32
    // ⌈M · cumP(k)⌉ for Poisson(1), k = 0..5 (≥6 beyond)
    val thr = Seq(367880L, 735759L, 919699L, 981013L, 996341L, 999407L)
    val base = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .select(col("k"), col("cents"),
        explode(sequence(lit(0), lit(B - 1))).as("r"))
      // reduce k mod M BEFORE squaring: (k² mod M) = ((k mod M)² mod M)
      // and every other term is likewise stable mod M, so the hash value
      // is identical — but k² itself overflows long once keys exceed
      // ~3×10⁹ (sf10 keys reach 9.9×10⁹). All intermediates now ≤ M².
      .withColumn("km", col("k") % M)
      .withColumn("h",
        (((col("km") * col("km")) % M) * (lit(7919L) + col("r"))
          + col("km") * (lit(104729L) + lit(13L) * col("r"))
          + lit(977L) * col("r") + 12345L) % M)
      .withColumn("w",
        thr.map(t => when(col("h") >= t, 1L).otherwise(0L)).reduce(_ + _))
    val reps = base.groupBy(col("r"))
      .agg(sum(col("w") * col("cents")).as("wsum"),
        sum(col("w")).as("wn"))
      .withColumn("mean_r", col("wsum").cast("double") / col("wn") / 100.0)
    val point = t(s, dir, "orders")
      .agg((avg(round(col("o_totalprice") * 100, 0).cast("long")) / 100.0)
        .as("point_est"))
    reps.agg(count(lit(1)).as("n_replicates"),
      expr("percentile(mean_r, 0.025)").as("ci_lo"),
      expr("percentile(mean_r, 0.975)").as("ci_hi"))
      .crossJoin(broadcast(point))
      .select(col("n_replicates"),
        round(col("point_est"), 4).as("point_est"),
        round(col("ci_lo"), 4).as("ci_lo"),
        round(col("ci_hi"), 4).as("ci_hi"),
        round(col("ci_hi") - col("ci_lo"), 4).as("ci_width"))
  }

  private val q89Sql =
    """WITH base AS (
      | SELECT o_orderkey % 1000003 AS km,
      |  CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents, r
      | FROM orders, (SELECT unnest(generate_series(0, 31)) AS r) reps),
      |h AS (
      | SELECT *, (((km * km) % 1000003) * (7919 + r)
      |   + km * (104729 + 13 * r) + 977 * r + 12345) % 1000003 AS hv
      | FROM base),
      |w AS (
      | SELECT r, cents,
      |  (CASE WHEN hv >= 367880 THEN 1 ELSE 0 END)
      |  + (CASE WHEN hv >= 735759 THEN 1 ELSE 0 END)
      |  + (CASE WHEN hv >= 919699 THEN 1 ELSE 0 END)
      |  + (CASE WHEN hv >= 981013 THEN 1 ELSE 0 END)
      |  + (CASE WHEN hv >= 996341 THEN 1 ELSE 0 END)
      |  + (CASE WHEN hv >= 999407 THEN 1 ELSE 0 END) AS w
      | FROM h),
      |reps AS (
      | SELECT r, CAST(sum(w * cents) AS DOUBLE) / sum(w) / 100.0 AS mean_r
      | FROM w GROUP BY r),
      |pt AS (
      | SELECT avg(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0
      |   AS point_est
      | FROM orders)
      |SELECT count(*) AS n_replicates,
      | round(point_est, 4) AS point_est,
      | round(quantile_cont(mean_r, 0.025), 4) AS ci_lo,
      | round(quantile_cont(mean_r, 0.975), 4) AS ci_hi,
      | round(quantile_cont(mean_r, 0.975) - quantile_cont(mean_r, 0.025), 4)
      |   AS ci_width
      |FROM reps CROSS JOIN pt GROUP BY point_est""".stripMargin

  // B90 — CUSUM CHANGE-POINT detection (did the daily event level
  // shift, and when?): daily counts per event type (one hash agg —
  // the day frame is bounded by the corpus span, so its windows are
  // safe at any event volume), centered CUSUM S_t = Σ(x_i − x̄)
  // scaled to EXACT integers (n·x_i − Σx is integer — no float drift
  // in the argmax), change-point = day of max |S|, with the max
  // excursion normalized by the total for a comparable magnitude.
  // The classic offline CUSUM estimator; a planted shift lands the
  // argmax on the shift day, a stationary series lands anywhere with
  // small relative excursion.
  private def q90Cusum(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("nd"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily.join(broadcast(tot), Seq("event_type"))
      // integer-scaled deviation: nd·x − sx  (= nd·(x − mean))
      .withColumn("dev", col("nd") * col("x") - col("sx"))
      .withColumn("s_t", sum(col("dev")).over(wCum))
    cusum.groupBy(col("event_type"))
      .agg(max(struct(abs(col("s_t")).as("a"), col("day"), col("s_t")))
        .as("m"),
        first(col("sx")).as("sx"), first(col("nd")).as("nd"))
      .select(col("event_type"),
        col("m.day").cast("date").cast("string").as("change_day"),
        (col("m.s_t") > 0).as("shift_down"),
        round(abs(col("m.s_t")).cast("double") / (col("nd") * col("sx")), 6)
          .as("rel_excursion"),
        col("nd").as("n_days"))
      .orderBy(col("event_type"))
  }

  private val q90Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
      | FROM events GROUP BY 1, 2),
      |tot AS (SELECT event_type, sum(x) AS sx, count(*) AS nd
      |        FROM daily GROUP BY 1),
      |c AS (
      | SELECT daily.event_type, day, nd * x - sx AS dev, sx, nd
      | FROM daily JOIN tot USING (event_type)),
      |s AS (
      | SELECT *, sum(dev) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t
      | FROM c),
      |r2 AS (
      | SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(s_t) DESC, day DESC) AS pick
      | FROM s),
      |m AS (
      | SELECT event_type, day AS change_day, s_t AS s_at,
      |  nd AS n_days, sx
      | FROM r2 WHERE pick = 1)
      |SELECT event_type,
      | CAST(CAST(change_day AS DATE) AS VARCHAR) AS change_day,
      | s_at > 0 AS shift_down,
      | round(CAST(abs(s_at) AS DOUBLE) / (n_days * sx), 6) AS rel_excursion,
      | n_days
      |FROM m ORDER BY event_type""".stripMargin

  // B91 — HOLT double-exponential smoothing + 7-day forecast (level +
  // trend — the minimal forecasting primitive a metrics warehouse
  // ships): α = 0.5, β = 0.25 (DYADIC smoothing constants — every
  // update is a halving/quartering, so both engines perform identical
  // IEEE ops; an 0.3 would still replay — defined-order fold — but
  // dyadics make the arithmetic exactly representable for ~26 steps).
  // The per-type daily series is bounded by the corpus span, so the
  // ordered collect is a ≤31-element array; the fold is one
  // aggregate() HOF with a struct accumulator (level, trend) — the
  // oracle walks the identical recursion in a recursive CTE (all
  // literals CAST to DOUBLE: an uncast 0.5 runs the recursion in
  // DECIMAL — the D22 trap again).
  private def q91Holt(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy(col("event_type"))
      .agg(expr("transform(sort_array(collect_list(struct(day, x))), p -> p.x)")
        .as("xs"))
      .withColumn("fit", expr(
        """aggregate(
          |  slice(xs, 3, size(xs) - 2),
          |  named_struct(
          |    'l', CAST(element_at(xs, 1) AS DOUBLE),
          |    't', CAST(element_at(xs, 2) - element_at(xs, 1) AS DOUBLE)),
          |  (acc, x) -> named_struct(
          |    'l', 0.5D * x + 0.5D * (acc.l + acc.t),
          |    't', 0.25D * ((0.5D * x + 0.5D * (acc.l + acc.t)) - acc.l)
          |         + 0.75D * acc.t))""".stripMargin))
      .select(col("event_type"), size(col("xs")).cast("long").as("n_days"),
        round(col("fit.l"), 4).as("level"),
        round(col("fit.t"), 4).as("trend"),
        round(col("fit.l") + lit(7.0) * col("fit.t"), 4).as("forecast_7d"))
      .orderBy(col("event_type"))
  }

  private val q91Sql =
    """WITH RECURSIVE daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x,
      |  row_number() OVER (PARTITION BY event_type
      |    ORDER BY date_trunc('day', ts)) AS rn
      | FROM events GROUP BY 1, 2),
      |walk(event_type, rn, lvl, tr) AS (
      | SELECT d1.event_type, 2,
      |  CAST(d1.x AS DOUBLE),
      |  CAST(d2.x - d1.x AS DOUBLE)
      | FROM daily d1 JOIN daily d2 ON d1.event_type = d2.event_type
      |  AND d1.rn = 1 AND d2.rn = 2
      | UNION ALL
      | SELECT s.event_type, s.rn,
      |  CAST(0.5 AS DOUBLE) * s.x + CAST(0.5 AS DOUBLE) * (w.lvl + w.tr),
      |  CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * s.x
      |    + CAST(0.5 AS DOUBLE) * (w.lvl + w.tr)) - w.lvl)
      |   + CAST(0.75 AS DOUBLE) * w.tr
      | FROM walk w JOIN daily s
      |  ON s.event_type = w.event_type AND s.rn = w.rn + 1),
      |n AS (SELECT event_type, max(rn) AS n_days FROM daily GROUP BY 1)
      |SELECT n.event_type, n_days,
      | round(max_by(lvl, rn), 4) AS level,
      | round(max_by(tr, rn), 4) AS trend,
      | round(max_by(lvl, rn) + 7.0 * max_by(tr, rn), 4) AS forecast_7d
      |FROM walk JOIN n ON walk.event_type = n.event_type
      |GROUP BY n.event_type, n_days ORDER BY n.event_type""".stripMargin

  // B92 — WEEKDAY SEASONALITY strength (is the series calendar-
  // driven?): per type, day-of-week mean levels and the seasonality
  // ratio = between-dow variance / total daily variance (both from
  // exact integer power sums over the bounded day frame — the
  // one-pass variance algebra of B62, never a second scan). A ratio
  // near 1 means the weekday pattern explains the series; near 0
  // means noise/trend dominates. Complements B90 (level shifts) and
  // B91 (trend) with the CALENDAR component.
  private def q92Seasonality(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val dow = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("nk"), sum(col("x")).as("sk"))
    dow.join(broadcast(tot), Seq("event_type"))
      // between-group sum of squares: Σ nk·(mean_k − mean)², scaled
      // exact: Σ (nd·sk − nk·sx)² / (nk·nd²)
      .withColumn("bg_term",
        pow(col("nd") * col("sk") - col("nk") * col("sx"), 2).cast("double")
          / (col("nk") * col("nd") * col("nd")))
      .groupBy(col("event_type"))
      .agg(first(col("nd")).as("n_days"),
        sum(col("bg_term")).as("ss_between"),
        first((col("sxx") - col("sx") * col("sx") / col("nd").cast("double")))
          .as("ss_total"))
      .select(col("event_type"), col("n_days"),
        round(col("ss_between"), 4).as("ss_between"),
        round(col("ss_total"), 4).as("ss_total"),
        round(col("ss_between") / col("ss_total"), 6).as("seasonality_ratio"))
      .orderBy(col("event_type"))
  }

  private val q92Sql =
    """WITH daily AS (
      | SELECT event_type, date_trunc('day', ts) AS day, count(*) AS x
      | FROM events GROUP BY 1, 2),
      |d2 AS (SELECT *, dayofweek(day) + 1 AS dow FROM daily),
      |tot AS (SELECT event_type, count(*) AS nd, sum(x) AS sx,
      |        sum(x * x) AS sxx FROM d2 GROUP BY 1),
      |dw AS (SELECT event_type, dow, count(*) AS nk, sum(x) AS sk
      |       FROM d2 GROUP BY 1, 2),
      |bg AS (SELECT dw.event_type,
      |   CAST(pow(nd * sk - nk * sx, 2) AS DOUBLE) / (nk * nd * nd)
      |     AS bg_term, nd, sx, sxx
      | FROM dw JOIN tot USING (event_type))
      |SELECT event_type, CAST(max(nd) AS BIGINT) AS n_days,
      | round(sum(bg_term), 4) AS ss_between,
      | round(max(sxx - CAST(sx AS DOUBLE) * sx / nd), 4) AS ss_total,
      | round(sum(bg_term) / max(sxx - CAST(sx AS DOUBLE) * sx / nd), 6)
      |   AS seasonality_ratio
      |FROM bg GROUP BY event_type ORDER BY event_type""".stripMargin

  // B93 — PARETO COVERAGE (the 80/20 question: how many customers
  // cover 80% of revenue?): per-customer cents (exact), ranked by
  // (revenue DESC, custkey) with the cumulative share riding
  // DistributedPrefixSum — no single-partition window over the
  // customer order. The answer row = first rank whose cumulative
  // share reaches each threshold (one tiny agg per threshold over
  // flags, not a sort-and-scan). Complements B74's Gini with the
  // operational "how many accounts does the team actually manage"
  // number.
  private def q93Pareto(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val ranked = graft.operators.DistributedPrefixSum
      .withRunningTotal(rev, col("cents"), "cum_cents",
        col("cents").desc, col("o_custkey"))
    val tot = ranked.agg(max(col("cum_cents")).as("tot_cents"),
      count(lit(1)).as("n_cust"))
    val flagged = ranked.crossJoin(broadcast(tot))
    val thresholds = Seq(50, 80, 90)
    val rows = thresholds.map { p =>
      flagged.filter(col("cum_cents") * 100 >= col("tot_cents") * p)
        .agg(count(lit(1)).as("n_after"))
        .crossJoin(broadcast(tot))
        .select(lit(p.toLong).as("pct_revenue"),
          (col("n_cust") - col("n_after") + 1).as("n_customers"),
          round((col("n_cust") - col("n_after") + 1).cast("double")
            / col("n_cust"), 6).as("share_of_customers"))
    }
    rows.reduce(_ unionByName _).orderBy(col("pct_revenue"))
  }

  private val q93Sql =
    """WITH rev AS (
      | SELECT o_custkey,
      |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      | FROM orders GROUP BY o_custkey),
      |r AS (
      | SELECT *, sum(cents) OVER (ORDER BY cents DESC, o_custkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      | FROM rev),
      |t AS (SELECT CAST(max(cum_cents) AS BIGINT) AS tot_cents,
      |      count(*) AS n_cust FROM r),
      |f AS (SELECT p, count(*) AS n_after
      |      FROM r, t, (SELECT unnest([50, 80, 90]) AS p) ps
      |      WHERE cum_cents * 100 >= tot_cents * p GROUP BY p)
      |SELECT CAST(p AS BIGINT) AS pct_revenue,
      | n_cust - n_after + 1 AS n_customers,
      | round(CAST(n_cust - n_after + 1 AS DOUBLE) / n_cust, 6)
      |   AS share_of_customers
      |FROM f CROSS JOIN t ORDER BY pct_revenue""".stripMargin

  // B94 — RFM SEGMENTATION (recency / frequency / monetary quintile
  // codes — the classic CRM cut): three independent DistributedNtile
  // rankings (each an exact SQL-ntile over a total order, no
  // single-partition window), label = concatenated quintile digits,
  // and the report aggregates the canonical named segments. All
  // three metrics are exact integers (days since epoch, order count,
  // cents).
  private def q94Rfm(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .withColumn("rec_days", datediff(lit("2001-09-01"), col("last_order")))
    val withR = graft.operators.DistributedNtile.withNtile(
      per, 5, "r_q", col("rec_days").asc, col("o_custkey"))
    val withF = graft.operators.DistributedNtile.withNtile(
      withR, 5, "f_q", col("freq").desc, col("o_custkey"))
    val withM = graft.operators.DistributedNtile.withNtile(
      withF, 5, "m_q", col("cents").desc, col("o_custkey"))
    val seg = when(col("r_q") === 1 && col("f_q") === 1, "champions")
      .when(col("r_q") <= 2 && col("f_q") <= 2, "loyal")
      .when(col("r_q") >= 4 && col("f_q") <= 2, "at_risk")
      .when(col("r_q") >= 4 && col("f_q") >= 4, "lost")
      .otherwise("regular")
    withM.withColumn("segment", seg)
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg(col("rec_days")), 4).as("avg_recency_days"),
        round(avg(col("freq")), 4).as("avg_frequency"),
        round(avg(col("cents")) / 100.0, 4).as("avg_monetary"))
      .orderBy(col("segment"))
  }

  private val q94Sql =
    """WITH per AS (
      | SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS freq,
      |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
      | FROM orders GROUP BY o_custkey),
      |d AS (
      | SELECT *, date_diff('day', CAST(last_order AS DATE), DATE '2001-09-01')
      |   AS rec_days
      | FROM per),
      |q AS (
      | SELECT *,
      |  ntile(5) OVER (ORDER BY rec_days ASC, o_custkey) AS r_q,
      |  ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
      |  ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m_q
      | FROM d),
      |sg AS (
      | SELECT *, CASE
      |  WHEN r_q = 1 AND f_q = 1 THEN 'champions'
      |  WHEN r_q <= 2 AND f_q <= 2 THEN 'loyal'
      |  WHEN r_q >= 4 AND f_q <= 2 THEN 'at_risk'
      |  WHEN r_q >= 4 AND f_q >= 4 THEN 'lost'
      |  ELSE 'regular' END AS segment
      | FROM q)
      |SELECT segment, count(*) AS n_customers,
      | round(avg(rec_days), 4) AS avg_recency_days,
      | round(avg(freq), 4) AS avg_frequency,
      | round(avg(cents) / 100.0, 4) AS avg_monetary
      |FROM sg GROUP BY segment ORDER BY segment""".stripMargin

  // B95 — REVENUE BRIDGE / waterfall decomposition (the board-slide
  // question: WHERE did the year-over-year change come from?): per
  // customer, 1995 vs 1996 cents full-outer joined; each customer
  // lands in exactly one bucket — new (0→x), churned (x→0),
  // expansion (up), contraction (down), flat — and the bucket deltas
  // SUM EXACTLY to the total change (exact cents, no float anywhere),
  // which the reconciles column proves in-row. One hash agg + one
  // full-outer join on the natural key; the oracle re-derives the
  // identity independently.
  private def q95Waterfall(s: SparkSession, dir: String): DataFrame = {
    def rev(yr: Int) = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts(s"$yr-01-01") &&
        col("o_orderdate") < ts(s"${yr + 1}-01-01"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
    val joined = rev(1995).select(col("o_custkey"), col("cents").as("c95"))
      .join(rev(1996).select(col("o_custkey"), col("cents").as("c96")),
        Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("c95"), lit(0L)).as("c95"),
        coalesce(col("c96"), lit(0L)).as("c96"))
      .withColumn("bucket",
        when(col("c95") === 0, "new")
          .when(col("c96") === 0, "churned")
          .when(col("c96") > col("c95"), "expansion")
          .when(col("c96") < col("c95"), "contraction")
          .otherwise("flat"))
    val per = joined.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c96") - col("c95")).as("delta_cents"))
    val tot = joined.agg(sum(col("c96") - col("c95")).as("total_delta"))
    per.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_customers"),
        round(col("delta_cents") / 100.0, 2).as("delta_revenue"),
        round(col("total_delta") / 100.0, 2).as("total_change"),
        (sum(col("delta_cents")).over(Window.partitionBy())
          === col("total_delta")).as("reconciles"))
      .orderBy(col("bucket"))
  }

  private val q95Sql =
    """WITH r95 AS (
      | SELECT o_custkey,
      |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS c95
      | FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      | GROUP BY o_custkey),
      |r96 AS (
      | SELECT o_custkey,
      |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS c96
      | FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      | GROUP BY o_custkey),
      |j AS (
      | SELECT coalesce(r95.o_custkey, r96.o_custkey) AS o_custkey,
      |  coalesce(c95, 0) AS c95, coalesce(c96, 0) AS c96
      | FROM r95 FULL OUTER JOIN r96 ON r95.o_custkey = r96.o_custkey),
      |b AS (
      | SELECT *, CASE
      |  WHEN c95 = 0 THEN 'new'
      |  WHEN c96 = 0 THEN 'churned'
      |  WHEN c96 > c95 THEN 'expansion'
      |  WHEN c96 < c95 THEN 'contraction'
      |  ELSE 'flat' END AS bucket
      | FROM j),
      |per AS (
      | SELECT bucket, count(*) AS n_customers,
      |  CAST(sum(c96 - c95) AS BIGINT) AS delta_cents
      | FROM b GROUP BY bucket),
      |tot AS (SELECT CAST(sum(c96 - c95) AS BIGINT) AS total_delta FROM b)
      |SELECT bucket, n_customers,
      | round(delta_cents / 100.0, 2) AS delta_revenue,
      | round(total_delta / 100.0, 2) AS total_change,
      | CAST(sum(delta_cents) OVER () AS BIGINT) = total_delta AS reconciles
      |FROM per CROSS JOIN tot ORDER BY bucket""".stripMargin

  // B96 — NET REVENUE RETENTION by cohort (the SaaS metric B67's
  // count retention can't answer: a cohort can keep 60% of USERS but
  // 110% of DOLLARS if survivors expand — NRR weights by purchase
  // value): cohort = first-active week, curve = purchase cents in
  // week cohort+k / cohort's week-0 purchase cents. Exact cents in
  // every numerator/denominator; one distinct pass for cohorts, one
  // purchase agg, one broadcast-sized join of per-cohort baselines.
  // NRR > 1 is a real outcome, not an error — the honest reading.
  private def q96NetRevenueRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .withColumn("wk",
        floor(expr("datediff(CAST(ts AS DATE), DATE'2024-01-01')") / 7))
    val cohorts = ev.select(col("user_id"), col("wk")).distinct()
      .groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    val spend = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("wk"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val byOffset = spend.join(cohorts, Seq("user_id"))
      .withColumn("offset", col("wk") - col("cohort"))
      .groupBy(col("cohort"), col("offset"))
      .agg(sum(col("cents")).as("cents"))
    val base = byOffset.filter(col("offset") === 0)
      .select(col("cohort"), col("cents").as("base_cents"))
    byOffset.join(broadcast(base), Seq("cohort"))
      .select(col("cohort"), col("offset"),
        round(col("cents") / 100.0, 2).as("revenue"),
        round(col("base_cents") / 100.0, 2).as("cohort_base"),
        round(col("cents").cast("double") / col("base_cents"), 6).as("nrr"))
      .orderBy(col("cohort"), col("offset"))
  }

  private val q96Sql =
    """WITH ev AS (
      | SELECT user_id, event_type, value,
      |  (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS wk
      | FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort
      |      FROM (SELECT DISTINCT user_id, wk FROM ev) GROUP BY user_id),
      |sp AS (
      | SELECT user_id, wk,
      |  sum(CAST(round(value * 100, 0) AS BIGINT)) AS cents
      | FROM ev WHERE event_type = 'purchase' GROUP BY user_id, wk),
      |o AS (
      | SELECT cohort, wk - cohort AS "offset",
      |  CAST(sum(cents) AS BIGINT) AS cents
      | FROM sp JOIN c USING (user_id) GROUP BY cohort, wk - cohort),
      |b AS (SELECT cohort, cents AS base_cents FROM o WHERE "offset" = 0)
      |SELECT o.cohort, "offset",
      | round(cents / 100.0, 2) AS revenue,
      | round(base_cents / 100.0, 2) AS cohort_base,
      | round(CAST(cents AS DOUBLE) / base_cents, 6) AS nrr
      |FROM o JOIN b ON o.cohort = b.cohort
      |ORDER BY o.cohort, "offset"""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_net_revenue_retention" -> (q96NetRevenueRetention _),
    "q95_waterfall" -> (q95Waterfall _),
    "q93_pareto" -> (q93Pareto _),
    "q94_rfm" -> (q94Rfm _),
    "q92_seasonality" -> (q92Seasonality _),
    "q91_holt" -> (q91Holt _),
    "q90_cusum" -> (q90Cusum _),
    "q89_bootstrap" -> (q89Bootstrap _),
    "q88_sprt" -> (q88Sprt _),
    "q87_runs_test" -> (q87RunsTest _),
    "q86_bounce_sessions" -> (q86BounceSessions _),
    "q84_sequence_gaps" -> (q84SequenceGaps _),
    "q85_benford" -> (q85Benford _),
    "q82_attribution" -> (q82Attribution _),
    "q81_bloom_join" -> (q81BloomJoin _),
    "q77_chisq" -> (q77Chisq _),
    "q78_mannwhitney" -> (q78MannWhitney _),
    "q79_decile_lift" -> (q79DecileLift _),
    "q80_survival" -> (q80Survival _),
    "q76_conversion_ztest" -> (q76ConversionZtest _),
    "q74_gini" -> (q74Gini _),
    "q75_twap" -> (q75Twap _),
    "q73_mad" -> (q73Mad _),
    "q70_ab_ttest" -> (q70AbTtest _),
    "q71_corr_matrix" -> (q71CorrMatrix _),
    "q72_ols" -> (q72Ols _),
    "q68_mom_change" -> (q68MomChange _),
    "q69_transitions" -> (q69Transitions _),
    "q67_retention" -> (q67Retention _),
    "q65_wau" -> (q65Wau _),
    "q66_interval_join" -> (q66IntervalJoin _),
    "q61_hierarchy" -> (q61Hierarchy _),
    "q62_moments" -> (q62Moments _),
    "q63_histogram" -> (q63Histogram _),
    "q64_mode_median" -> (q64ModeMedian _),
    "q60_merge_upsert" -> (q60MergeUpsert _),
    "q59_salted_join" -> (q59SaltedJoin _),
    "q58_decimal_agg" -> (q58DecimalAgg _),
    "q52_approx_percentile" -> (q52ApproxPercentile _),
    "q53_interpolate" -> (q53Interpolate _),
    "q54_scd2" -> (q54Scd2 _),
    "q55_funnel" -> (q55Funnel _),
    "q56_cube" -> (q56Cube _),
    "q57_json_schema" -> (q57JsonSchema _),
    "q51_date_spine" -> (q51DateSpine _),
    "q50_grouping_sets_id" -> (q50GroupingSets _),
    "q49_filter_agg" -> (q49FilterAgg _),
    "q48_bit_ops" -> (q48BitOps _),
    "q47_union_missing" -> (q47UnionMissing _),
    "q46_full_outer" -> (q46FullOuter _),
    "q45_lateral_topk" -> (q45LateralTopk _),
    "q44_range_frame" -> (q44RangeFrame _),
    "q40_exists_correlated" -> (q40ExistsCorrelated _),
    "q41_lateral_explode" -> (q41LateralExplode _),
    "q42_array_funcs" -> (q42ArrayFuncs _),
    "q43_regexp" -> (q43Regexp _),
    "q30_setops" -> (q30SetOps _),
    "q35_unpivot" -> (q35Unpivot _),
    "q36_asof_tolerance" -> (q36AsOfTolerance _),
    "q37_window_extras" -> (q37WindowExtras _),
    "q38_datetime_funcs" -> (q38DatetimeFuncs _),
    "q39_null_semantics" -> (q39NullSemantics _),
    "q32_map_ops" -> (q32MapOps _),
    "q31_asof_forward" -> (q31AsOfForward _),
    "q33_asof_nearest" -> (q33AsOfNearest _),
    "q34_asof_multikey" -> (q34AsOfMultiKey _),
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2Filter _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_broadcast_join" -> (q4Broadcast _),
    "q5_multi_join" -> (q5MultiJoin _),
    "q6_scan_agg" -> (q6ScanAgg _),
    "q7_sort_limit" -> (q7SortLimit _),
    "q8_window" -> (q8Window _),
    "q9_distinct" -> (q9Distinct _),
    "q10_semi_join" -> (q10Semi _),
    "q11_anti_join" -> (q11Anti _),
    "q12_union" -> (q12Union _),
    "q13_case_agg" -> (q13CaseAgg _),
    "q14_subquery" -> (q14Subquery _),
    "q15_having" -> (q15Having _),
    "q16_rollup" -> (q16Rollup _),
    "q17_pivot" -> (q17Pivot _),
    "q18_asof_join" -> (q18AsOf _),
    "q23_asof_native" -> (q23AsOfNative _),
    "q19_range_join" -> (q19Range _),
    "q20_time_bucket" -> (q20TimeBucket _),
    "q21_sessionize" -> (q21Sessionize _),
    "q22_grouping_sets" -> (q22Cube _),
    "q24_percentiles" -> (q24Percentiles _),
    "q25_rolling_window" -> (q25Rolling _),
    "q26_ntile" -> (q26Ntile _),
    "q27_string_funcs" -> (q27Strings _),
    "q28_collect_agg" -> (q28Collect _),
    "q29_json" -> (q29Json _))

  val oracles: Map[String, String] = Map(
    "q96_net_revenue_retention" -> q96Sql,
    "q95_waterfall" -> q95Sql,
    "q93_pareto" -> q93Sql,
    "q94_rfm" -> q94Sql,
    "q92_seasonality" -> q92Sql,
    "q91_holt" -> q91Sql,
    "q90_cusum" -> q90Sql,
    "q89_bootstrap" -> q89Sql,
    "q88_sprt" -> q88Sql,
    "q87_runs_test" -> q87Sql,
    "q86_bounce_sessions" -> q86Sql,
    "q84_sequence_gaps" -> q84Sql,
    "q85_benford" -> q85Sql,
    "q82_attribution" -> q82Sql,
    "q81_bloom_join" -> q81Sql,
    "q77_chisq" -> q77Sql,
    "q78_mannwhitney" -> q78Sql,
    "q79_decile_lift" -> q79Sql,
    "q80_survival" -> q80Sql,
    "q76_conversion_ztest" -> q76Sql,
    "q74_gini" -> q74Sql,
    "q75_twap" -> q75Sql,
    "q73_mad" -> q73Sql,
    "q70_ab_ttest" -> q70Sql,
    "q71_corr_matrix" -> q71Sql,
    "q72_ols" -> q72Sql,
    "q68_mom_change" -> q68Sql,
    "q69_transitions" -> q69Sql,
    "q67_retention" -> q67Sql,
    "q65_wau" -> q65Sql,
    "q66_interval_join" -> q66Sql,
    "q61_hierarchy" -> q61Sql,
    "q62_moments" -> q62Sql,
    "q63_histogram" -> q63Sql,
    "q64_mode_median" -> q64Sql,
    "q52_approx_percentile" -> q52Sql,
    "q53_interpolate" -> q53Sql,
    "q54_scd2" -> q54Sql,
    "q55_funnel" -> q55Sql,
    "q56_cube" -> q56Sql,
    "q57_json_schema" -> q57Sql,
    "q58_decimal_agg" -> q58Sql,
    "q59_salted_join" -> q59Sql,
    "q60_merge_upsert" -> q60Sql,
    "q51_date_spine" -> q51Sql,
    "q50_grouping_sets_id" -> q50Sql,
    "q49_filter_agg" -> q49Sql,
    "q48_bit_ops" -> q48Sql,
    "q47_union_missing" -> q47Sql,
    "q46_full_outer" -> q46Sql,
    "q45_lateral_topk" -> q45Sql,
    "q44_range_frame" -> q44Sql,
    "q40_exists_correlated" -> q40Sql,
    "q41_lateral_explode" -> q41Sql,
    "q42_array_funcs" -> q42Sql,
    "q43_regexp" -> q43Sql,
    "q30_setops" -> q30Sql,
    "q32_map_ops" -> q32Sql,
    "q35_unpivot" -> q35Sql,
    "q36_asof_tolerance" -> q36Sql,
    "q37_window_extras" -> q37Sql,
    "q38_datetime_funcs" -> q38Sql,
    "q39_null_semantics" -> q39Sql,
    "q31_asof_forward" -> q31Sql,
    "q33_asof_nearest" -> q33Sql,
    "q34_asof_multikey" -> q34Sql,
    "q1_agg" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_broadcast_join" -> q4Sql,
    "q5_multi_join" -> q5Sql,
    "q6_scan_agg" -> q6Sql,
    "q7_sort_limit" -> q7Sql,
    "q8_window" -> q8Sql,
    "q9_distinct" -> q9Sql,
    "q10_semi_join" -> q10Sql,
    "q11_anti_join" -> q11Sql,
    "q12_union" -> q12Sql,
    "q13_case_agg" -> q13Sql,
    "q14_subquery" -> q14Sql,
    "q15_having" -> q15Sql,
    "q16_rollup" -> q16Sql,
    "q17_pivot" -> q17Sql,
    "q18_asof_join" -> q18Sql,
    "q23_asof_native" -> q18Sql,
    "q19_range_join" -> q19Sql,
    "q20_time_bucket" -> q20Sql,
    "q21_sessionize" -> q21Sql,
    "q22_grouping_sets" -> q22Sql,
    "q24_percentiles" -> q24Sql,
    "q25_rolling_window" -> q25Sql,
    "q26_ntile" -> q26Sql,
    "q27_string_funcs" -> q27Sql,
    "q28_collect_agg" -> q28Sql,
    "q29_json" -> q29Sql)
}
