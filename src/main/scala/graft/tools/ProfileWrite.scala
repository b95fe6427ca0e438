package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, ExtractPipeline}

/** Repeated timing of the full job vs a flat-write variant to separate
  * partitioned-write cost from VM noise.
  * sbt -batch "runMain graft.tools.ProfileWrite [threads] [nDocs] [reps]" */
object ProfileWrite {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 16
    val n = if (args.length > 1) args(1).toLong else 24000L
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ExtractPipeline.extract(ExtractPipeline.pages(spark, 512),
      ExtractPipeline.broadcastTemplates(spark)).foreach(_ => ())

    for (r <- 1 to reps) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_pw").toString
      var t0 = System.nanoTime()
      ExtractPipeline.extractDf(
          ExtractPipeline.pages(spark, n).toDF().repartition(threads * 4, col("url")))
        .write.mode("overwrite").parquet(s"$tmp/flat")
      val flat = (System.nanoTime() - t0) / 1e9

      // job steps inline
      t0 = System.nanoTime()
      val bucketed = ExtractJob.withBucket(ExtractPipeline.pages(spark, n).toDF(), 64)
      val prepared = ExtractJob.saltedRepartition(bucketed, threads * 4, 64)
      val extracted = ExtractPipeline.extractDf(prepared)
        .withColumn("bucket", org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(col("url")), org.apache.spark.sql.functions.lit(64L)))
      extracted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").parquet(s"$tmp/job/docs")
      val wWrite = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val written = spark.read.parquet(s"$tmp/job/docs")
      written.groupBy(col("bucket"))
        .agg(count(lit(1)).as("docs"), sum(col("nBytes")).as("bytes"))
        .write.mode("overwrite").parquet(s"$tmp/job/lineage")
      val wLineage = (System.nanoTime() - t0) / 1e9
      println(f"[rep$r] flat=$flat%6.2fs  jobWrite=$wWrite%6.2fs  lineage=$wLineage%6.2fs")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    spark.stop()
  }
}
