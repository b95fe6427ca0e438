package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator catalog (one entry per implemented operator
  * family from SURVEY.md §2 plus the training-data-pipeline additions);
  * `oracleSql` carries the DuckDB-equivalent SQL for every query whose
  * semantics ANSI SQL can express — extraction/fuzzy/multimodal queries are
  * rows-only here and byte-gated in `sbt test` instead.
  */
object SparkEntry {

  /** Flagship: the extraction engine end-to-end on a deterministic synthetic
    * corpus — route → parse → slice → quality rollup. Driver smoke-checks
    * rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    ExtractOps.q25ExtractRollup(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      EmbeddingOps.queries ++ ExtractOps.queries ++ Advanced.queries ++ Stats.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      EmbeddingOps.oracles ++ ExtractOps.oracles ++ Advanced.oracles ++ Stats.oracles
}
