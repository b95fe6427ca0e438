package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Storage abstraction for the extraction job's two tables (docs + lineage).
  *
  * The north rule targets Iceberg tables; no Iceberg runtime jar ships in
  * `/opt/spark/jars` (verified — SURVEY.md §1.3), so the local backend is
  * Parquet laid out Iceberg-shaped: bucket-partitioned data directories with
  * idempotent per-partition replacement, plus an append-only lineage table
  * playing the role of snapshot metadata. A real Iceberg catalog is a
  * drop-in: implement this trait with `writeTo(table).overwritePartitions()`
  * / `append()` and the job logic above it is unchanged.
  */
trait TableIO {
  /** Idempotent bucket-partitioned write: recomputed buckets fully replace
    * their partition; untouched buckets stay. */
  def writeDocs(docs: DataFrame): Unit
  /** Append-only commit log (written only AFTER the docs commit). */
  def appendLineage(lineage: DataFrame): Unit
  def readDocs(spark: SparkSession): DataFrame
  def lineageExists(spark: SparkSession): Boolean
  def readLineage(spark: SparkSession): DataFrame
}

/** Parquet-backed TableIO (the sandbox backend). */
final class ParquetTableIO(outDir: String) extends TableIO {
  val docsPath = s"$outDir/docs"
  val lineagePath = s"$outDir/lineage"

  override def writeDocs(docs: DataFrame): Unit =
    docs.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(docsPath)

  override def appendLineage(lineage: DataFrame): Unit =
    lineage.write.mode(SaveMode.Append).parquet(lineagePath)

  override def readDocs(spark: SparkSession): DataFrame =
    spark.read.parquet(docsPath)

  override def lineageExists(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(lineagePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  override def readLineage(spark: SparkSession): DataFrame =
    spark.read.parquet(lineagePath)
}
