package graft.spark

import java.nio.file.Files
import graft.kernel._

/** The north-rule correctness gate: byte-identical extracted text per url —
  * the distributed job (local[4], salted repartition, whatever task order the
  * scheduler picks) must reproduce EXACTLY what the single-threaded kernel
  * produces on the driver for every document, plus exactly-once resumability
  * after a simulated partial failure. */
class ExtractE2ESpec extends SparkTestBase {

  private val N = 600

  /** Oracle: single-threaded kernel run — the same pure function, no Spark. */
  private lazy val oracle: Map[String, ExtractedDoc] =
    Corpus.rows(N).map(p => p.url -> Extractor.extract(p.url, p.html, p.text, p.lang)).toMap

  test("distributed extraction is byte-identical to the single-threaded oracle") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_e2e_spec").toString
    val pages = ExtractPipeline.pages(spark, N, numPartitions = 7).toDF()
    val metrics = ExtractJob.run(spark, pages, out, runId = "t1", nBuckets = 8)
    assert(metrics.docs == N)

    val docs = spark.read.parquet(s"$out/docs")
      .select("url", "extractedText", "route", "vendor", "failure", "nItems")
      .collect()
    assert(docs.length == N)
    var htmlN = 0; var pdfN = 0
    docs.foreach { r =>
      val url = r.getString(0)
      val o = oracle(url)
      assert(r.getString(1) == o.extractedText, s"extractedText mismatch for $url")
      assert(r.getString(2) == o.route, s"route mismatch for $url")
      assert(r.getString(3) == o.vendor, s"vendor mismatch for $url")
      assert(r.getString(4) == o.failure, s"failure mismatch for $url")
      assert(r.getInt(5) == o.nItems, s"nItems mismatch for $url")
      if (o.route == "html") htmlN += 1 else pdfN += 1
    }
    // the corpus must actually exercise both payload kinds
    assert(htmlN > 100 && pdfN > 100, s"degenerate corpus: html=$htmlN pdf=$pdfN")
  }

  test("cells, spans and quality survive the parquet round-trip") {
    import spark.implicits._
    import ExtractPipeline._
    val pages = ExtractPipeline.pages(spark, 60)
    val docs = ExtractPipeline.extract(pages, ExtractPipeline.broadcastTemplates(spark))
      .collect()
    docs.foreach { d =>
      val o = oracle.get(d.url)
      // oracle covers first N urls; all 60 are within N
      assert(o.isDefined && d == o.get, s"full ExtractedDoc mismatch for ${d.url}")
    }
  }

  test("resume after simulated partial failure: no duplicates, no losses") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_resume_spec").toString
    val pages = ExtractPipeline.pages(spark, 300, numPartitions = 5).toDF()

    // full run, then simulate a crash that lost buckets 2 and 5: remove their
    // data dirs and their lineage rows (as if they never committed)
    ExtractJob.run(spark, pages, out, runId = "r1", nBuckets = 8)
    val lineage1 = spark.read.parquet(s"$out/lineage").collect()
    assert(lineage1.length == 8)

    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$out/docs/bucket=2")).deleteRecursively()
    new Directory(new java.io.File(s"$out/docs/bucket=5")).deleteRecursively()
    val keptLineage = spark.read.parquet(s"$out/lineage")
      .filter(!$"bucket".isin(2L, 5L))
    val tmpLineage = s"$out/lineage_tmp"
    keptLineage.write.parquet(tmpLineage)
    new Directory(new java.io.File(s"$out/lineage")).deleteRecursively()
    new java.io.File(tmpLineage).renameTo(new java.io.File(s"$out/lineage"))

    // resume: must recompute exactly the two lost buckets
    val m2 = ExtractJob.run(spark, pages, out, runId = "r2", nBuckets = 8, resume = true)
    assert(m2.docs > 0 && m2.docs < 300, s"resume recomputed ${m2.docs} docs")

    val docs = spark.read.parquet(s"$out/docs").select("url").as[String].collect()
    assert(docs.length == 300, s"expected 300 docs after resume, got ${docs.length}")
    assert(docs.distinct.length == 300, "duplicate urls after resume")
    // and the recomputed docs are still byte-identical
    val d2 = spark.read.parquet(s"$out/docs")
      .filter($"bucket".isin(2L, 5L)).select("url", "extractedText").collect()
    d2.foreach { r => assert(r.getString(1) == oracle(r.getString(0)).extractedText) }
  }

  test("extract_doc rejects wrong input types at analysis time") {
    import spark.implicits._
    // an int html column must fail in the analyzer (AnalysisException), not
    // as a per-row ClassCastException at runtime
    val bad = Seq(("u", 1, "t", "en")).toDF("url", "html", "text", "lang")
    bad.createOrReplaceTempView("bad_pages_spec")
    val e = intercept[Exception] {
      spark.sql("SELECT extract_doc(url, html, text, lang) FROM bad_pages_spec").collect()
    }
    assert(e.getMessage.contains("extract_doc argument 1 (html)"), e.getMessage)

    // a STRING html column is accepted (markup stored as text)
    val strHtml = Seq(("https://t/s", "<p>hi</p>", "", "en")).toDF("url", "html", "text", "lang")
    strHtml.createOrReplaceTempView("str_pages_spec")
    val rows = spark.sql(
      "SELECT extract_doc(url, html, text, lang).extractedText FROM str_pages_spec")
      .as[String].collect()
    assert(rows.sameElements(Array("hi")))

    // NULL literals pass analysis and eval (text/lang default to "")
    val viaNull = spark.sql(
      "SELECT extract_doc(url, html, NULL, NULL).extractedText FROM str_pages_spec")
      .as[String].collect()
    assert(viaNull.sameElements(Array("hi")))
  }

  test("extract_doc SQL expression agrees with the typed path") {
    import spark.implicits._
    val pages = ExtractPipeline.pages(spark, 40).toDF()
    pages.createOrReplaceTempView("pages_sql_spec")
    val viaSql = spark.sql(
      """SELECT url, extract_doc(url, html, text, lang).extractedText AS t
        |FROM pages_sql_spec""".stripMargin)
      .as[(String, String)].collect().toMap
    viaSql.foreach { case (url, t) => assert(t == oracle(url).extractedText, url) }
    assert(viaSql.size == 40)
  }

  test("extract_pages and sim_ratio are SQL-callable via GraftExtensions") {
    import spark.implicits._
    val pages = ExtractPipeline.pages(spark, 40).toDF()
    pages.createOrReplaceTempView("pages_ext_spec")
    // extract_pages: page 1's text equals the whole-document extraction for
    // every non-failed doc (the same invariant the kernel spec pins)
    val firstPages = spark.sql(
      """SELECT url, pg.text AS t FROM pages_ext_spec
        |LATERAL VIEW explode(extract_pages(url, html, text, lang)) AS pg
        |WHERE pg.page = 1""".stripMargin)
      .as[(String, String)].collect().toMap
    assert(firstPages.nonEmpty)
    firstPages.foreach { case (url, t) => assert(t == oracle(url).extractedText, url) }
    // sim_ratio: difflib-pinned value usable straight from SQL
    val r = spark.sql("SELECT sim_ratio('newark', 'newrak')").head().getDouble(0)
    assert(math.abs(r - 0.8333333333333334) < 1e-12, r.toString)
  }

  test("extract_doc with a password try-list opens real-password documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val msg = "Dock 7 manifest: 1482 units cleared for Tuesday"
    val pdf = PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(1700, 1200, Seq(PdfLite.Run(100, 100, 12, msg)))),
      aes = true, userPw = "s3cret")
    // pre-extracted text >100 chars routes the doc native (detectRoute)
    val df = Seq(("pdf://locked", pdf, (msg + " ") * 3, "en"))
      .toDF("url", "html", "text", "lang")
    def run(pws: Seq[String]): (String, String) = {
      val d = df.select(graft.functions.ExtractDocExpr.extractDoc(
        col("url"), col("html"), col("text"), col("lang"),
        Vendor.builtinTemplates, pws).as("doc"))
        .select("doc.extractedText", "doc.route").head()
      (d.getString(0), d.getString(1))
    }
    assert(!run(Nil)._1.contains("manifest"), "opened without a password")
    val (txt, route) = run(Seq("wrong", "s3cret"))
    assert(route == "native" && txt.contains("Dock 7 manifest"), s"$route/$txt")
  }
}
