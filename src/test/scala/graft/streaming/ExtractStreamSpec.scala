package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.spark.{ExtractPipeline, SparkTestBase}
import graft.kernel.Corpus

/** Streaming surface gate: incremental exactly-once extraction over a file
  * stream, and the watermarked windowed rollup. */
class ExtractStreamSpec extends SparkTestBase {

  private def writePages(dir: String, from: Long, until: Long): Unit = {
    import ExtractPipeline.pageRowEnc
    val rows = (from until until).map(i => Corpus.page(i))
    spark.createDataset(rows).coalesce(1)
      .write.mode("append").parquet(dir)
  }

  test("file-stream extraction is incremental and exactly-once across restarts") {
    val base = Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    writePages(in, 0, 120)
    ExtractStream.run(spark, in, out, ckpt).awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 120)

    // second batch lands; restart from the same checkpoint — only the new
    // file is processed, nothing reprocessed or lost
    writePages(in, 120, 200)
    ExtractStream.run(spark, in, out, ckpt).awaitTermination()
    val docs = spark.read.parquet(out)
    assert(docs.count() == 200)
    assert(docs.select("url").distinct().count() == 200)

    // a third run with no new input is a no-op
    ExtractStream.run(spark, in, out, ckpt).awaitTermination()
    assert(spark.read.parquet(out).count() == 200)

    // extracted text matches the single-threaded kernel oracle byte-for-byte
    val got = docs.select("url", "extractedText").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val expect = (0L until 200L).map { i =>
      val p = Corpus.page(i)
      p.url -> graft.kernel.Extractor.extract(p.url, p.html, p.text, p.lang).extractedText
    }
    expect.foreach { case (u, t) => assert(got(u) == t, s"byte drift at $u") }
  }

  test("watermarked windowed rollup aggregates routes per event-time window") {
    import ExtractPipeline.pageRowEnc
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Corpus.PageRow]
    mem.addData((0L until 400L).map(i => Corpus.page(i)))
    val q = ExtractStream.windowedRollup(mem.toDF())
      .writeStream.format("memory").queryName("rollup")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("rollup").collect()
    assert(rows.nonEmpty)
    val routes = rows.map(_.getString(1)).toSet
    assert(routes.subsetOf(Set("html", "native", "scanned")))
    // corpus stamps 1 page/second ⇒ 400 pages ≈ 7 one-minute windows
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs == 400L)
  }
}
