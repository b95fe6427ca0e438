package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared building blocks for the operator catalog ([[graft.SparkEntry]]).
  *
  * Every oracle-checked query must produce BIT-IDENTICAL values in Spark and
  * in DuckDB (the driver hash-compares). The rules encoded here:
  *
  *  - integer arithmetic wherever possible (counts, token positions, hashes);
  *  - money/measure sums go through `DECIMAL` (exact, order-independent) and
  *    are cast to double only at the very end;
  *  - per-row double arithmetic (cosine similarity, ratios) is written as a
  *    left-to-right fold so both engines execute the same IEEE op sequence;
  *  - cross-engine hashing uses md5 (identical bytes in, identical hex out) —
  *    never engine-native hash functions (xxhash64 vs duckdb hash differ).
  */
object OpsCommon {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** 31-bit positive hash derived from md5 — the one hash function both
    * engines can compute identically. DuckDB mirror:
    * `(('0x' || substr(md5(x),1,15))::BIGINT % 2147483648)`. */
  def hash31(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long") % 2147483648L

  /** DuckDB SQL fragment mirroring [[hash31]]. */
  def hash31Sql(x: String): String =
    s"(('0x' || substr(md5($x),1,15))::BIGINT % 2147483648)"

  /** Exact decimal sum of a double column, surfaced as double.
    * Order-independent (decimal addition is exact) ⇒ safe under any
    * partitioning; identical in DuckDB as
    * `(sum(cast(x as decimal(18,s))))::DOUBLE`. */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  def decSumSql(x: String, scale: Int = 2): String =
    s"cast(sum(cast($x as decimal(18,$scale))) as double)"

  /** Whitespace-token array. Both engines split on the literal single space
    * and keep empty tokens; corpus text is single-spaced so semantics agree. */
  def tokens(textCol: Column): Column = split(textCol, " ")

  /** Word-trigram shingles (distinct) of a token array column, 1-based
    * element_at on both engines. Returns an array column; empty when <3
    * tokens. */
  def triShingles(ts: Column): Column =
    when(size(ts) >= 3,
      array_distinct(transform(sequence(lit(1), size(ts) - 2), i =>
        concat_ws(" ", element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB mirror of [[triShingles]] given a token-list expression. */
  def triShinglesSql(ts: String): String =
    s"(case when len($ts) >= 3 then list_distinct(list_transform(range(1, len($ts) - 1), " +
      s"i -> $ts[i] || ' ' || $ts[i+1] || ' ' || $ts[i+2])) else [] end)"

  /** Non-overlapping substring occurrence count (Python `str.count`
    * semantics — both engines implement replace() as non-overlapping
    * left-to-right). Mirrors the reference's keyword scoring
    * (`template.py:294`). */
  def substrCount(hay: Column, needle: String): Column =
    ((length(hay) - length(call_function("replace", hay, lit(needle), lit("")))) / needle.length).cast("int")

  def substrCountSql(hay: String, needle: String): String =
    s"cast((length($hay) - length(replace($hay, '$needle', ''))) / ${needle.length} as int)"

  /** Cast a float-array column to double before any arithmetic so both
    * engines run identical IEEE double op sequences. */
  def asDoubles(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Left-to-right squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity, rounded to 4 decimals (identical fold order on both
    * engines makes the raw doubles bit-equal in practice; rounding guards the
    * last ulp). */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b))), 4)

  /** DuckDB mirrors (list_zip yields structs indexed x[1]/x[2]). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> x[1]*x[2]))"
  def norm2Sql(a: String): String =
    s"list_sum(list_transform($a, x -> x*x))"
  def cosineSql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${norm2Sql(a)}) * sqrt(${norm2Sql(b)})), 4)"
}
