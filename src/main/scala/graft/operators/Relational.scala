package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import OpsCommon._

/** Relational operator demos over the driver's TPC-H-ish tables — one query
  * per operator family from SURVEY.md §2 (filters F*, aggregations A*, joins
  * J*, sorts/top-k O*, unions U*, window analogs of G1/G2).
  *
  * Scale notes (each query is the plan we'd run at 100 TB):
  *  - dimension joins are explicitly `broadcast()` (region/nation/templates
  *    are KBs — never shuffle the fact side);
  *  - aggregations are partial-agg friendly (sum/count/min/max over decimals);
  *  - top-k per group uses a window over a shuffle on the group key — the
  *    group-key shuffle is unavoidable, but rank+filter avoids a global sort;
  *  - global top-k uses orderBy+limit which Spark executes as TakeOrdered
  *    (per-partition heap + driver merge of k rows, no full sort shuffle).
  */
object Relational {

  /** q1_agg — the reference's batch rollup shape (A10 + SURVEY §2.4): pricing
    * summary per (returnflag, linestatus). Exact decimal sums ⇒ identical
    * under any partitioning. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
      |  cast(sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(18,4))) as double) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q2_filter — S3/F1-shaped predicate stack; filters + projection reach the
    * parquet scan (PushedFilters + pruned ReadSchema — verified via explain
    * in BenchReport). */
  def q2Filter(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_quantity") < 24 && col("l_returnflag") =!= "N")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
           decSum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"))
      .orderBy(col("l_returnflag"))

  val q2FilterSql: String =
    """SELECT l_returnflag, count(*) AS n_rows,
      |  cast(sum(cast(l_extendedprice * l_discount as decimal(18,4))) as double) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= timestamp '1995-01-01' AND l_shipdate < timestamp '1997-01-01'
      |  AND l_quantity < 24 AND l_returnflag <> 'N'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q3_join_broadcast — J1 graduated to relational form: fact side never
    * shuffles; both dims broadcast (the reference hoists its template registry
    * once per batch, `ultimate_batch_processor.py:22-28`). */
  def q3JoinBroadcast(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), decSum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name"))

  val q3JoinBroadcastSql: String =
    """SELECT r_name, count(*) AS n_customers,
      |  cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q4_semi_join — J3-shaped left-semi (word-set intersection expressed
    * relationally): orders having at least one returned line. */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .join(table(spark, dir, "lineitem").filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))

  val q4SemiJoinSql: String =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
      |FROM orders WHERE EXISTS (
      |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q5_anti_join — the resume primitive of ExtractJob (restart = anti-join
    * completed lineage) in relational form: customers with no large
    * (>300k) order. */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter(col("o_totalprice") > 300000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_nationkey"))

  val q5AntiJoinSql: String =
    """SELECT c_nationkey, count(*) AS n_customers
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q6_topk_window — O6 fleet-level: top-3 suppliers per nation.
    * row_number (not rank) with a total tie-break order ⇒ deterministic. */
  def q6TopkWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
    table(spark, dir, "supplier")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("s_nationkey"), col("rk"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_nationkey"), col("rk"))
  }

  val q6TopkWindowSql: String =
    """SELECT s_nationkey, rk, s_suppkey, s_name, s_acctbal FROM (
      |  SELECT *, row_number() OVER (PARTITION BY s_nationkey
      |    ORDER BY s_acctbal DESC, s_suppkey ASC) AS rk FROM supplier)
      |WHERE rk <= 3 ORDER BY s_nationkey, rk""".stripMargin

  /** q7_union — U1: vertical union of two entity tables by name. */
  def q7Union(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
      .select(lit("customer").as("kind"), col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"))
    val s = table(spark, dir, "supplier")
      .select(lit("supplier").as("kind"), col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"))
    c.unionByName(s)
      .groupBy(col("kind"), col("nationkey"))
      .agg(count(lit(1)).as("n"), decSum(col("acctbal")).as("sum_acctbal"))
      .orderBy(col("kind"), col("nationkey"))
  }

  val q7UnionSql: String =
    """SELECT kind, nationkey, count(*) AS n,
      |  cast(sum(cast(acctbal as decimal(18,2))) as double) AS sum_acctbal
      |FROM (
      |  SELECT 'customer' AS kind, c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
      |  UNION ALL
      |  SELECT 'supplier', s_nationkey, s_acctbal FROM supplier)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q8_sort_limit — O7/O5: global top-50 (TakeOrdered — per-partition heap,
    * no full sort shuffle; total order via the orderkey tie-break). */
  def q8SortLimit(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q8SortLimitSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin

  /** q9_median — C7: exact interpolated median per group (Spark `percentile`
    * ≡ DuckDB `quantile_cont`; exact sort-based ⇒ order-independent). */
  def q9Median(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("median_value"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q9MedianSql: String =
    """SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q10_window_lag — G1's gap computation (y - lag(y)) fleet-scale: per-user
    * inter-event gaps in microseconds. Integer sums ⇒ exact. */
  def q10WindowLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    table(spark, dir, "events")
      .withColumn("gap_us", unix_micros(col("ts").cast("timestamp")) - lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("gap_us")).as("sum_gap_us"), count(lit(1)).as("n_gaps"))
      .orderBy(col("user_id"))
  }

  val q10WindowLagSql: String =
    """SELECT user_id, cast(sum(gap_us) as bigint) AS sum_gap_us, count(*) AS n_gaps FROM (
      |  SELECT user_id, epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us FROM events)
      |WHERE gap_us IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin

  /** q11_sessionize — G2 (order-dependent 1-D clustering) fleet-scale:
    * 30-minute-gap sessionization per user. */
  def q11Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    table(spark, dir, "events")
      .withColumn("gap_us", unix_micros(col("ts").cast("timestamp")) - lag(unix_micros(col("ts").cast("timestamp")), 1).over(w))
      .withColumn("new_session",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val q11SessionizeSql: String =
    """SELECT user_id, cast(sum(new_session) as bigint) AS n_sessions, count(*) AS n_events FROM (
      |  SELECT user_id, CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_session FROM (
      |    SELECT user_id, epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us FROM events))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q12_time_window — tumbling 1-hour windows (batch analog of the
    * streaming windowed agg in graft.streaming). */
  def q12TimeWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum(col("value"), 6).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  val q12TimeWindowSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
      |  cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin


  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter" -> (q2Filter _),
    "q3_join_broadcast" -> (q3JoinBroadcast _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_topk_window" -> (q6TopkWindow _),
    "q7_union" -> (q7Union _),
    "q8_sort_limit" -> (q8SortLimit _),
    "q9_median" -> (q9Median _),
    "q10_window_lag" -> (q10WindowLag _),
    "q11_sessionize" -> (q11Sessionize _),
    "q12_time_window" -> (q12TimeWindow _))

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q2_filter" -> q2FilterSql,
    "q3_join_broadcast" -> q3JoinBroadcastSql,
    "q4_semi_join" -> q4SemiJoinSql,
    "q5_anti_join" -> q5AntiJoinSql,
    "q6_topk_window" -> q6TopkWindowSql,
    "q7_union" -> q7UnionSql,
    "q8_sort_limit" -> q8SortLimitSql,
    "q9_median" -> q9MedianSql,
    "q10_window_lag" -> q10WindowLagSql,
    "q11_sessionize" -> q11SessionizeSql,
    "q12_time_window" -> q12TimeWindowSql)
}
