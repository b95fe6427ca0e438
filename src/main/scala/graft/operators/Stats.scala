package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import OpsCommon._

/** Corpus-statistics operators: histogramming, order-independent moment
  * statistics, and vocabulary building — the profiling passes run over a
  * training corpus before/after filtering.
  *
  * The moments query is the template for ANY floating statistic at cluster
  * scale: plain `corr()`/`stddev()` sum doubles in partition order and is
  * not bit-reproducible across runs; summing exact decimals and deriving
  * the statistic from the moments at the end gives the same bits at any
  * partitioning — which is also what makes it oracle-checkable.
  */
object Stats {

  /** q34_histogram — fixed-width histogram of order totals (width 50k,
    * 0-anchored): integer bucket arithmetic, deterministic. */
  def q34Histogram(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .withColumn("bucket", floor(col("o_totalprice") / 50000.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           decSum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("bucket"))

  val q34HistogramSql: String =
    """SELECT cast(floor(o_totalprice / 50000.0) as bigint) AS bucket,
      |  count(*) AS n,
      |  cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** q35_moments — Pearson correlation of (quantity, extendedprice) per
    * returnflag, derived from EXACT decimal moment sums (n, Σx, Σy, Σxy,
    * Σx², Σy²) so the result is identical under any partitioning. */
  def q35Moments(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        decSum(x, 2).as("sum_x"),
        decSum(y, 2).as("sum_y"),
        decSum(x * y, 4).as("sum_xy"),
        decSum(x * x, 4).as("sum_x2"),
        decSum(y * y, 4).as("sum_y2"))
      .withColumn("corr_xy", round(
        (col("n") * col("sum_xy") - col("sum_x") * col("sum_y")) /
          (sqrt(col("n") * col("sum_x2") - col("sum_x") * col("sum_x")) *
           sqrt(col("n") * col("sum_y2") - col("sum_y") * col("sum_y"))), 6))
      .orderBy(col("l_returnflag"))
  }

  val q35MomentsSql: String =
    """SELECT l_returnflag, n, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
      |  round((n * sum_xy - sum_x * sum_y) /
      |        (sqrt(n * sum_x2 - sum_x * sum_x) *
      |         sqrt(n * sum_y2 - sum_y * sum_y)), 6) AS corr_xy
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_x,
      |    cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_y,
      |    cast(sum(cast(l_quantity * l_extendedprice as decimal(18,4))) as double) AS sum_xy,
      |    cast(sum(cast(l_quantity * l_quantity as decimal(18,4))) as double) AS sum_x2,
      |    cast(sum(cast(l_extendedprice * l_extendedprice as decimal(18,4))) as double) AS sum_y2
      |  FROM lineitem GROUP BY 1)
      |ORDER BY l_returnflag""".stripMargin

  /** q36_term_freq — vocabulary building: top-20 tokens over all documents
    * by total occurrences (tie-break alphabetical) — explode → partial-agg
    * count → global top-k. */
  def q36TermFreq(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc)
      .limit(20)

  val q36TermFreqSql: String =
    """SELECT tok, count(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |WHERE tok <> '' GROUP BY 1 ORDER BY n DESC, tok ASC LIMIT 20""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_histogram" -> (q34Histogram _),
    "q35_moments" -> (q35Moments _),
    "q36_term_freq" -> (q36TermFreq _))

  def oracles: Map[String, String] = Map(
    "q34_histogram" -> q34HistogramSql,
    "q35_moments" -> q35MomentsSql,
    "q36_term_freq" -> q36TermFreqSql)
}
