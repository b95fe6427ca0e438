package graft.tools

import org.apache.spark.sql.SparkSession
import graft.spark.{ExtractJob, ExtractPipeline}

/** Fine-grained window sampler for the N→4N scaling pair: materializes the
  * bench corpus once, then loops (1-thread, 4-thread) extraction cycles
  * printing one line per rep. A full `Bench` scaling attempt spans 25+
  * minutes — on a VM whose noise windows last minutes to hours, that is a
  * coarse sampler; this prints a rate every ~1–3 minutes so a clean window
  * is visible (and usable as a committed floor) the moment it opens.
  * sbt -batch "runMain graft.tools.ScalingProbe [docs] [cycles] [levels]"
  * where [levels] is a comma list of thread counts (default "1,4"). */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 600000L
    val cycles = if (args.length > 1) args(1).toInt else 12
    val levels = (if (args.length > 2) args(2) else "1,4")
      .split(",").toSeq.map(_.trim.toInt)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sprobe").toString
    val corpus = s"$tmp/corpus"
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try ExtractPipeline.pages(s, nDocs, numPartitions = 64)
        .write.mode("overwrite").parquet(corpus)
      finally s.stop()
    }
    for (c <- 1 to cycles; threads <- levels) {
      // pin the whole JVM to `threads` cores for the rep, exactly like
      // Bench.extractOnce — probe samples must be floor-comparable
      val pinned = graft.CpuPin.pin(threads)
      try {
        val spark = SparkSession.builder().master(s"local[$threads]")
          .config("spark.sql.shuffle.partitions", threads * 4)
          .config("spark.ui.enabled", "false").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        try {
          ExtractPipeline.extractDf(ExtractPipeline.pages(
              spark, 1000L * threads, numPartitions = threads * 4).toDF())
            .foreach(_ => ())
          val m = ExtractJob.run(spark, spark.read.parquet(corpus),
            s"$tmp/out$threads-$c", runId = s"probe-$threads-$c",
            nBuckets = 32, numPartitions = threads * 4)
          println(f"[probe] cycle=$c threads=$threads pinned=$pinned " +
            f"wall=${m.wallSec}%.2fs rate=${m.docsPerSec}%.0f docs/s " +
            s"ts=${java.time.Instant.now}")
        } finally spark.stop()
      } finally if (pinned) graft.CpuPin.unpin()
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }
}
