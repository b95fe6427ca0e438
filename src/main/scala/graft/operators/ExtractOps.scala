package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel._
import graft.spark.ExtractPipeline

/** Queries exercising the extraction engine itself plus the non-SQL-
  * expressible operators (Ratcliff-Obershelp fuzzy match, multimodal decode).
  * These have no DuckDB oracle — the driver records a rows-only check; their
  * real correctness gate is `sbt -batch test` byte-equality
  * (ExtractE2ESpec/GoldenParitySpec) per the north rule.
  *
  * The extraction inputs are the deterministic synthetic corpus
  * ([[graft.kernel.Corpus]]) — a pure function of (seed, index), so results
  * are identical across runs, partitionings, and parallelism levels.
  */
object ExtractOps {

  val VerifyPages = 1500L

  private def extracted(spark: SparkSession): DataFrame =
    ExtractPipeline.extractDf(ExtractPipeline.pages(spark, VerifyPages).toDF())

  /** q25_extract_rollup — the flagship fleet rollup: per (route, vendor)
    * doc counts, item counts, failure counts, mean quality (A2–A8 rolled up
    * with built-in aggs — SURVEY §2.4 fleet mappings). */
  def q25ExtractRollup(spark: SparkSession, dir: String): DataFrame =
    extracted(spark)
      .groupBy(col("route"), col("vendor"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("nItems")).cast("long").as("sum_items"),
           sum(when(col("failure") =!= "", 1L).otherwise(0L)).as("n_failures"),
           round(avg(col("quality.overallScore")), 2).as("avg_quality"),
           sum(length(col("extractedText"))).cast("long").as("sum_text_chars"))
      .orderBy(col("route"), col("vendor"))

  /** q26_extract_text_hash — the byte-identity artifact surfaced as a query:
    * url → md5(extractedText), first 200 urls. Any kernel drift flips these
    * hashes run-over-run (the in-repo analog of the north rule's
    * byte-identical-text pass rate). */
  def q26ExtractTextHash(spark: SparkSession, dir: String): DataFrame =
    extracted(spark)
      .select(col("url"), md5(col("extractedText").cast("binary")).as("text_md5"),
        length(col("extractedText")).as("n_chars"), col("route"))
      .orderBy(col("url"))
      .limit(200)

  /** q27_extract_expr — same extraction through the Catalyst `Expression`
    * surface (column API, SURVEY §2.11) instead of the typed mapPartitions:
    * proves both integration points agree. */
  def q27ExtractExpr(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExtractDocExpr
    val pages = ExtractPipeline.pages(spark, 300L).toDF()
    pages.select(
      ExtractDocExpr.extractDoc(col("url"), col("html"), col("text"), col("lang")).as("doc"))
      .select(col("doc.url").as("url"), col("doc.route").as("route"),
        col("doc.vendor").as("vendor"), col("doc.failure").as("failure"),
        length(col("doc.extractedText")).as("n_chars"))
      .groupBy(col("route"), col("vendor"), col("failure"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"))
      .orderBy(col("route"), col("vendor"), col("failure"))
  }

  /** q28_fuzzy_match — J2: Ratcliff-Obershelp fuzzy template lookup
    * (difflib-parity expression [[graft.functions.SimRatio]], SURVEY §7.4) as
    * a similarity theta-join: misspelled vendor strings scored against the
    * (broadcast) registry, `difflib.get_close_matches(n=1, cutoff=0.8)`
    * semantics reproduced relationally — filter ratio ≥ 0.8, per-probe argmax
    * with difflib's nlargest tie-break (higher ratio, then lexicographically
    * larger vendor). No UDF: the plan is crossJoin(broadcast) → expression →
    * partitioned window, which at a 10^6-probe batch scales as
    * |probes|×|registry| narrow work with the registry broadcast. */
  def q28FuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.SimRatio
    import org.apache.spark.sql.expressions.Window
    val vendors = Vendor.builtinTemplates.keys.toVector.sorted.toDF("vendor")
    val probes = Seq("newark", "newrak", "nework", "sysco", "syscoo", "scysco",
      "test", "tets", "driscoll", "amazn").toDF("probe")
    // difflib scores ratio(possibility, word) — argument order preserved
    val scored = probes.crossJoin(broadcast(vendors))
      .withColumn("r", SimRatio.column(col("vendor"), col("probe")))
      .filter(col("r") >= 0.8)
    val w = Window.partitionBy(col("probe")).orderBy(col("r").desc, col("vendor").desc)
    val best = scored
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("probe"), col("vendor").as("matched"),
        (floor(SimRatio.column(col("probe"), col("vendor")) * 1e6) / 1e6).as("ratio"))
    probes.join(best, Seq("probe"), "left")
      .na.fill("", Seq("matched")).na.fill(0.0, Seq("ratio"))
      .orderBy(col("probe"))
  }

  /** q28 oracle: expected rows computed by CPython difflib itself (same
    * probes/registry; `difflib.get_close_matches(p, vendors, 1, 0.8)` +
    * `floor(SequenceMatcher(None, p, m).ratio()*1e6)/1e6`) — a literal
    * cross-engine gate for an operator ANSI SQL cannot express. */
  val q28FuzzyMatchSql: String =
    """SELECT probe, matched, ratio FROM (VALUES
      |  ('amazn', '', 0.0),
      |  ('driscoll', '', 0.0),
      |  ('newark', 'newark', 1.0),
      |  ('nework', 'newark', 0.833333),
      |  ('newrak', 'newark', 0.833333),
      |  ('scysco', 'sysco', 0.90909),
      |  ('sysco', 'sysco', 1.0),
      |  ('syscoo', 'sysco', 0.90909),
      |  ('test', 'test', 1.0),
      |  ('tets', '', 0.0)) AS t(probe, matched, ratio)
      |ORDER BY probe""".stripMargin

  /** q29_multimodal — multimodal decode plumbing: binary media column →
    * typed Dataset map (Scala analog of a mapInPandas decode batch) → typed
    * metadata/features → rollup. Decode itself is the documented stub
    * ([[graft.kernel.Multimodal.decode]]); schema/partitioning/batching are
    * real. */
  def q29Multimodal(spark: SparkSession, dir: String): DataFrame = {
    implicit val enc = Encoders.product[Multimodal.MediaMeta]
    val metas = spark.range(0, 2000, 1, 8)
      .map(i => Multimodal.decode(i, Multimodal.blob(i)))
    metas.toDF()
      .groupBy(col("format"), col("channels"))
      .agg(count(lit(1)).as("n"),
           sum(col("nBytes")).cast("long").as("sum_bytes"),
           max(col("width")).as("max_w"), max(col("height")).as("max_h"),
           sum(when(col("failure") =!= "", 1L).otherwise(0L)).as("n_failures"))
      .orderBy(col("format"), col("channels"))
  }

  /** q30_explode_pages — S12 (multi-page split) as posexplode: documents
    * exploded into per-“page” text chunks of 20 tokens, counted per source.
    * The generator-shaped operator from SURVEY §2.11. */
  def q30ExplodePages(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    OpsCommon.table(spark, dir, "documents")
      .withColumn("chunks",
        transform(sequence(lit(0), ((size(toks) - 1) / 20).cast("int")), i =>
          concat_ws(" ", slice(toks, i * 20 + 1, lit(20)))))
      .select(col("doc_id"), col("source"), posexplode(col("chunks")).as(Seq("page_no", "chunk")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
           countDistinct(col("doc_id")).as("n_docs"),
           max(col("page_no")).as("max_page_no"))
      .orderBy(col("source"))
  }

  /** Oracle for q30 (pure SQL shape — chunk arithmetic mirrors 1-based
    * list_slice). */
  val q30ExplodePagesSql: String =
    """SELECT source, count(*) AS n_chunks, count(distinct doc_id) AS n_docs,
      |  cast(max(page_no) as int) AS max_page_no
      |FROM (
      |  SELECT doc_id, source, unnest(range(0, (len(string_split(text,' ')) - 1) // 20 + 1)) AS page_no
      |  FROM documents)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_extract_rollup" -> (q25ExtractRollup _),
    "q26_extract_text_hash" -> (q26ExtractTextHash _),
    "q27_extract_expr" -> (q27ExtractExpr _),
    "q28_fuzzy_match" -> (q28FuzzyMatch _),
    "q29_multimodal" -> (q29Multimodal _),
    "q30_explode_pages" -> (q30ExplodePages _))

  def oracles: Map[String, String] = Map(
    "q28_fuzzy_match" -> q28FuzzyMatchSql,
    "q30_explode_pages" -> q30ExplodePagesSql)
}
