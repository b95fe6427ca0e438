package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractJob, ExtractPipeline}

/** Stage-by-stage cost decomposition of the extraction job at local[N].
  * sbt -batch "runMain graft.tools.ProfileJob [threads] [nDocs]" */
object ProfileJob {
  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 16
    val n = if (args.length > 1) args(1).toLong else 24000L
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bc = ExtractPipeline.broadcastTemplates(spark)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[stage] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  (${n / ((System.nanoTime() - t0) / 1e9)}%8.0f docs/s)")
    }

    // warmup
    ExtractPipeline.extract(ExtractPipeline.pages(spark, 512), bc).foreach(_ => ())

    time("generate only (foreach nop)") {
      ExtractPipeline.pages(spark, n).foreach(_ => ())
    }
    time("generate + kernel (foreach nop)") {
      ExtractPipeline.pages(spark, n).mapPartitions { it =>
        val t = bc.value
        it.map(p => graft.kernel.Extractor.extract(p.url, p.html, p.text, p.lang, t))
      }(ExtractPipeline.docEnc).foreach(_ => ())
    }
    time("gen + kernel + typed encode (agg)") {
      ExtractPipeline.extract(ExtractPipeline.pages(spark, n), bc)
        .agg(sum(length(col("extractedText")))).collect()
    }
    time("gen + kernel + expr encode (agg)") {
      ExtractPipeline.extractDf(ExtractPipeline.pages(spark, n).toDF())
        .agg(sum(length(col("extractedText")))).collect()
    }
    time("gen + shuffle (no kernel, foreach)") {
      ExtractPipeline.pages(spark, n).toDF()
        .repartition(threads * 4, col("url")).foreach(_ => ())
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString
    time("gen + shuffle + expr + flat write") {
      ExtractPipeline.extractDf(
          ExtractPipeline.pages(spark, n).toDF().repartition(threads * 4, col("url")))
        .write.mode("overwrite").parquet(s"$tmp/flat")
    }
    time("full job (shuffle+write+lineage)") {
      ExtractJob.run(spark, ExtractPipeline.pages(spark, n).toDF(), s"$tmp/out",
        "prof", nBuckets = 64, numPartitions = threads * 4)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
