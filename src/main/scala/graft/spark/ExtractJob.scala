package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import graft.kernel._

/** The production job: scan → pre-filter → salted repartition → kernel map →
  * write(docs + per-bucket lineage), resumable.
  *
  * Scale design (the north rule's explicit obligations):
  *
  *  - '''Partitioning/skew''': documents vary ~100× in size (one giant per
  *    ~1000 docs in the corpus, mirroring the 2.8MB DRISCOLL pdf amid 110KB
  *    pages). AQE balances shuffle sizes, not map CPU, so the job explicitly
  *    repartitions on a composite key `(bucket, salt)` where
  *    `salt = xxhash64(url) % saltsPerBucket`: docs spread uniformly across
  *    `numPartitions ≈ 4×cores` small tasks (bounding the giant-doc tail via
  *    scheduler-level LPT), while co-grouping each output bucket into few
  *    tasks (bounding small-file count: ≤ saltsPerBucket files per bucket).
  *
  *  - '''Exactly-once resumability''': output parquet is partitioned by
  *    `bucket = xxhash64(url) pmod nBuckets` (deterministic, input-only).
  *    Lineage rows (runId, bucket, docs, bytes, failures) are appended ONLY
  *    after the data write commits; `partitionOverwriteMode=dynamic` means a
  *    re-run replaces exactly the buckets it recomputes. Restart = anti-join
  *    input buckets against committed lineage — no dup, no loss, verified by
  *    the kill/rerun spec.
  *
  *  - '''Metrics''': docs/bytes/failure-taxonomy via `LongAccumulator`s
  *    (cheap, no extra action) + per-bucket lineage rows (durable).
  *
  * At 10^12 docs this layout holds: nBuckets scales to O(10^5) (lineage stays
  * tiny), numPartitions to O(cores×4); nothing here collects data to the
  * driver except the bucket-id set (bounded by nBuckets).
  */
object ExtractJob {

  final case class Lineage(runId: String, bucket: Long, docs: Long, bytes: Long,
                           failures: Long, emptyDocs: Long, status: String)

  final case class Metrics(docs: Long, bytes: Long, okDocs: Long, failedDocs: Long,
                           emptyDocs: Long, wallSec: Double, docsPerSec: Double,
                           mbPerSec: Double)

  final class Counters(spark: SparkSession) extends Serializable {
    val docs: LongAccumulator = spark.sparkContext.longAccumulator("graft.docs")
    val bytes: LongAccumulator = spark.sparkContext.longAccumulator("graft.bytes")
    val failed: LongAccumulator = spark.sparkContext.longAccumulator("graft.failed")
    val empty: LongAccumulator = spark.sparkContext.longAccumulator("graft.emptyExtraction")
  }

  /** Deterministic checkpoint unit: which output bucket a url belongs to.
    * Input-only function ⇒ stable across runs and cluster sizes. */
  def withBucket(pages: DataFrame, nBuckets: Int): DataFrame =
    pages.withColumn("bucket", pmod(xxhash64(col("url")), lit(nBuckets.toLong)))

  /** Salted repartition: uniform CPU spread + bounded files per bucket. */
  def saltedRepartition(df: DataFrame, numPartitions: Int, nBuckets: Int): DataFrame = {
    val saltsPerBucket = math.max(1, numPartitions / nBuckets)
    df.repartition(numPartitions, col("bucket"),
      pmod(xxhash64(col("url"), lit("salt")), lit(saltsPerBucket.toLong)))
  }

  def run(spark: SparkSession,
          pages: DataFrame,
          outDir: String,
          runId: String,
          nBuckets: Int = 64,
          numPartitions: Int = 0,
          resume: Boolean = false,
          templates: Map[String, Template] = Vendor.builtinTemplates): Metrics = {
    import spark.implicits._
    import ExtractPipeline.docEnc

    val t0 = System.nanoTime()
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism * 4
    val docsPath = s"$outDir/docs"
    val lineagePath = s"$outDir/lineage"

    val bucketed = withBucket(pages, nBuckets)

    // resume: drop buckets already committed (bucket-id set is ≤ nBuckets —
    // safe to collect at any data scale)
    val pending =
      if (resume && fileExists(spark, lineagePath)) {
        val done = spark.read.parquet(lineagePath)
          .filter($"status" === "ok")
          .select("bucket").distinct().as[Long].collect().toSet
        if (done.isEmpty) bucketed
        else bucketed.filter(!$"bucket".isin(done.toSeq: _*))
      } else bucketed

    val counters = new Counters(spark)
    val templatesBc = spark.sparkContext.broadcast(templates)

    val prepared = saltedRepartition(pending, parts, nBuckets)

    // kernel map, carrying the bucket through for the partitioned write
    val extracted: DataFrame = prepared
      .select($"url", $"warc_ts", $"html", $"text", $"lang", $"bucket")
      .mapPartitions { rows =>
        val tpl = templatesBc.value
        rows.map { r =>
          val doc = Extractor.extract(
            r.getString(0), r.getAs[Array[Byte]](2), r.getString(3), r.getString(4), tpl)
          counters.docs.add(1)
          counters.bytes.add(doc.nBytes)
          if (doc.failure.nonEmpty) counters.failed.add(1)
          else if (doc.nItems == 0) counters.empty.add(1)
          (r.getLong(5), doc)
        }
      }(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong, docEnc))
      .toDF("bucket", "doc")
      .select($"doc.*", $"bucket")

    // idempotent per-bucket overwrite: a recomputed bucket fully replaces its
    // directory; untouched buckets stay
    extracted.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(docsPath)

    // lineage from the WRITTEN data (cheap columnar count scan — no kernel
    // recompute), appended only after the docs commit
    val written = spark.read.parquet(docsPath)
    val pendingBuckets = pending.select("bucket").distinct().as[Long].collect().toSet
    if (pendingBuckets.nonEmpty) {
      written.filter($"bucket".isin(pendingBuckets.toSeq: _*))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("docs"), sum($"nBytes").as("bytes"),
          sum(when($"failure" =!= "", 1L).otherwise(0L)).as("failures"),
          sum(when($"failure" === "" && $"nItems" === 0, 1L).otherwise(0L)).as("emptyDocs"))
        .withColumn("runId", lit(runId))
        .withColumn("status", lit("ok"))
        .select("runId", "bucket", "docs", "bytes", "failures", "emptyDocs", "status")
        .write.mode(SaveMode.Append).parquet(lineagePath)
    }

    val wall = (System.nanoTime() - t0) / 1e9
    val d = counters.docs.value
    val b = counters.bytes.value
    Metrics(d, b, d - counters.failed.value, counters.failed.value,
      counters.empty.value, wall, d / wall, b / 1e6 / wall)
  }

  private def fileExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
