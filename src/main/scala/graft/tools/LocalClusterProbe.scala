package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: does `local-cluster[n, cores, mem]` (separate executor JVMs, the
  * multi-executor evidence mode for the north rule's N-vs-4N criterion) work
  * in this sandbox? */
object LocalClusterProbe {
  def main(args: Array[String]): Unit = {
    val classDirs = System.getProperty("java.class.path")
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,2048]")
      .appName("graft-lc-probe")
      .config("spark.executor.memory", "2g")
      .config("spark.executor.extraClassPath", classDirs)
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000L
    val t0 = System.nanoTime()
    val df = graft.spark.ExtractPipeline.extractDf(
      graft.spark.ExtractPipeline.pages(spark, n).toDF())
    val cnt = df.count()
    val execs = spark.sparkContext.getExecutorMemoryStatus.keySet
    println(f"[probe] docs=$cnt in ${(System.nanoTime()-t0)/1e9}%.1f sec; executors=${execs.size} -> $execs")
    spark.stop()
  }
}
