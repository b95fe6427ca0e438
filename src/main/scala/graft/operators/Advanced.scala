package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import OpsCommon._

/** Operators beyond the reference's own surface that a corpus/feature
  * pipeline needs: temporal as-of join, OLAP rollup, JSON column extraction.
  *
  * The as-of join is the canonical "operator Spark lacks" case from the
  * build brief; per the preference order it is COMPOSED from existing ops
  * (union + partitioned window + last(ignoreNulls)) rather than a custom
  * SparkPlan: one shuffle on the join key, sort within partitions, no
  * range-explosion — the same dataflow kdb/Flink use for as-of, and it
  * scales as a plain window (skewed keys salt like any hot key).
  */
object Advanced {

  /** Orders deduped to one row per (custkey, orderdate) — max orderkey wins —
    * so the as-of match is uniquely defined under timestamp ties. */
  private def ordersDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_totalprice"))
  }

  /** q31_asof_join — for each event, the customer's most recent order at or
    * before the event time; rolled up per event_type. Implementation: tag
    * and union both streams, one window per customer ordered by
    * (time, tag) — orders sort before events at equal time, giving `>=`
    * as-of semantics — then `last(ignoreNulls)` carries the latest order
    * forward onto each event row. */
  def q31AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id").as("custkey"), col("ts").as("time"),
        lit(1).as("tag"), col("event_type"),
        lit(null).cast("double").as("o_totalprice_in"))
    val od = ordersDedup(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_orderdate").as("time"),
        lit(0).as("tag"), lit(null).cast("string").as("event_type"),
        col("o_totalprice").as("o_totalprice_in"))
    val w = Window.partitionBy(col("custkey"))
      .orderBy(col("time").asc, col("tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(od)
      .withColumn("matched_price", last(col("o_totalprice_in"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count(col("matched_price")).as("n_matched"),
           decSum(col("matched_price")).as("sum_matched_price"))
      .orderBy(col("event_type"))
  }

  val q31AsofJoinSql: String =
    """WITH od AS (
      |  SELECT o_custkey, o_orderdate, o_totalprice FROM (
      |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |      ORDER BY o_orderkey DESC) AS rn FROM orders) WHERE rn = 1)
      |SELECT event_type, count(*) AS n_events,
      |  count(o.o_totalprice) AS n_matched,
      |  cast(sum(cast(o.o_totalprice as decimal(18,2))) as double) AS sum_matched_price
      |FROM events e ASOF LEFT JOIN od o
      |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q32_rollup — OLAP rollup over (status, priority) with subtotal and
    * grand-total rows (the fleet-report shape of A9/A10). */
  def q32Rollup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val q32RollupSql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q33_json — JSON column extraction (`events.props` = {"k": N}):
    * path-extract, cast, aggregate. */
  def q33Json(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
           sum(col("k")).cast("long").as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q33JsonSql: String =
    """SELECT event_type,
      |  count(cast(json_extract_string(props, '$.k') as int)) AS n_with_k,
      |  cast(sum(cast(json_extract_string(props, '$.k') as int)) as bigint) AS sum_k,
      |  cast(max(cast(json_extract_string(props, '$.k') as int)) as int) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** q40_cube — full CUBE over (returnflag, linestatus): all four grouping
    * combinations in one pass (Spark expands grouping sets before the
    * partial aggregate, so it remains a single two-phase agg — no extra
    * shuffles vs a plain groupBy). `grouping_id` disambiguates data-nulls
    * from total-rows, the standard OLAP contract. */
  def q40Cube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity")).cast("long").as("sum_qty"),
           decSum(col("l_extendedprice")).as("sum_price"),
           grouping_id().as("gid"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q40CubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  cast(sum(l_quantity) as bigint) AS sum_qty,
      |  cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price,
      |  cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as bigint) AS gid
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_asof_join" -> (q31AsofJoin _),
    "q32_rollup" -> (q32Rollup _),
    "q33_json" -> (q33Json _),
    "q40_cube" -> (q40Cube _))

  def oracles: Map[String, String] = Map(
    "q31_asof_join" -> q31AsofJoinSql,
    "q32_rollup" -> q32RollupSql,
    "q33_json" -> q33JsonSql,
    "q40_cube" -> q40CubeSql)
}
