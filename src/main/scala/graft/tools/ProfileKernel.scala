package graft.tools

import graft.kernel._

/** Single-threaded kernel profiler: per-route docs/s and stage split.
  * sbt -batch "runMain graft.tools.ProfileKernel [nDocs]" */
object ProfileKernel {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val pages = (0L until n.toLong).map(Corpus.page(_)).toVector
    // warmup
    pages.take(500).foreach(p => Extractor.extract(p.url, p.html, p.text, p.lang))

    val byRoute = scala.collection.mutable.Map[String, (Long, Long, Long)]() // ns, docs, bytes
    val t0 = System.nanoTime()
    for (p <- pages) {
      val s = System.nanoTime()
      val d = Extractor.extract(p.url, p.html, p.text, p.lang)
      val dt = System.nanoTime() - s
      val (a, b, c) = byRoute.getOrElse(d.route, (0L, 0L, 0L))
      byRoute(d.route) = (a + dt, b + 1, c + p.html.length)
    }
    val total = (System.nanoTime() - t0) / 1e9
    println(f"[profile] total: $n docs in $total%.2fs = ${n / total}%.0f docs/s single-thread")
    byRoute.toSeq.sortBy(_._1).foreach { case (r, (ns, docs, bytes)) =>
      println(f"[profile]   $r%-8s docs=$docs%6d  ms/doc=${ns / 1e6 / docs}%7.3f  MB=${bytes / 1e6}%8.2f  share=${ns / 1e9 / total * 100}%5.1f%%")
    }

    // stage split on the html route (dominant by count)
    val htmlPages = pages.filter(p => !PdfLite.isPdf(p.html)).take(2000)
    var tParse = 0L; var tRest = 0L
    for (p <- htmlPages) {
      val s0 = System.nanoTime()
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      val root = Html.parse(html)
      tParse += System.nanoTime() - s0
      val s1 = System.nanoTime()
      Html.extract(html)
      tRest += System.nanoTime() - s1
    }
    println(f"[profile] html: parse-only=${tParse / 1e6 / htmlPages.size}%.3f ms/doc, full-extract=${tRest / 1e6 / htmlPages.size}%.3f ms/doc over ${htmlPages.size} docs")

    // sub-stage split for the pdf routes
    val pdfPages = pages.filter(p => PdfLite.isPdf(p.html)).take(2000)
    var tP = 0L; var tV = 0L; var tS = 0L; var tQ = 0L
    val slicer = new Slicer(defaultRowThreshold = Extractor.PipelineRowThreshold)
    val checker = new QualityChecker()
    val templates = Vendor.builtinTemplates
    val kw = templates.keys.toVector.sorted.map(v => v -> Vector(v))
    for (p <- pdfPages) {
      var s = System.nanoTime()
      val parsed = PdfLite.parse(p.html)
      tP += System.nanoTime() - s
      s = System.nanoTime()
      val vendor = Vendor.detectVendor(parsed.items, kw)
      tV += System.nanoTime() - s
      val tpl = vendor.flatMap(v => Vendor.getTemplate(v, templates))
      s = System.nanoTime()
      val cells = tpl.map(t => slicer.sliceToTable(parsed.items, t.tableBox, t.columns, page = Some(1)))
      tS += System.nanoTime() - s
      s = System.nanoTime()
      cells.foreach(c => checker.checkExtraction(c, parsed.items))
      tQ += System.nanoTime() - s
    }
    val nn = pdfPages.size
    println(f"[profile] pdf stages ms/doc: parse=${tP / 1e6 / nn}%.3f vendor=${tV / 1e6 / nn}%.3f slice=${tS / 1e6 / nn}%.3f quality=${tQ / 1e6 / nn}%.3f")

    // raw-thread scaling (no Spark): each thread runs the full gen+extract
    // chain over its own index range; measures kernel allocation contention
    for (threads <- Seq(1, 2, 4, 8, 16)) {
      val per = n / threads
      val t1 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => {
          var i = t.toLong * per
          val end = i + per
          while (i < end) {
            val p = Corpus.page(i)
            Extractor.extract(p.url, p.html, p.text, p.lang)
            i += 1
          }
        })
        th.start(); th
      }
      ts.foreach(_.join())
      val wall = (System.nanoTime() - t1) / 1e9
      val rate = threads * per / wall
      println(f"[profile] raw-threads=$threads%2d  ${rate}%8.0f docs/s  (${rate / threads}%7.0f /thread)")
    }
  }
}
