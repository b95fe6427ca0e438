package graft.tools

import graft.kernel._

/** Smoke driver: exercises the kernel end-to-end through its public API from
  * the command line (`sbt "runMain graft.tools.Drive"`). Not part of the
  * driver contract; kept as a quick manual-verification surface. */
object Drive {
  def main(args: Array[String]): Unit = {
    val pdfPage = Corpus.rows(200).find(_.url.contains("/pdf/")).get
    val htmlPage = Corpus.rows(200).find(_.url.contains("/html/")).get
    val d1 = Extractor.extract(pdfPage.url, pdfPage.html, pdfPage.text, pdfPage.lang)
    val d2 = Extractor.extract(htmlPage.url, htmlPage.html, htmlPage.text, htmlPage.lang)
    println(s"PDF url=${d1.url}")
    println(s"PDF route=${d1.route} vendor=${d1.vendor} failure='${d1.failure}' items=${d1.nItems}")
    println(s"PDF cells=${d1.cells.length}x${if (d1.cells.nonEmpty) d1.cells.head.length else 0} score=${d1.quality.overallScore}")
    println("PDF text>>>"); println(d1.extractedText.take(400)); println("<<<")
    println(s"HTML route=${d2.route} nItems=${d2.nItems} failure='${d2.failure}'")
    println("HTML text>>>"); println(d2.extractedText.take(400)); println("<<<")
    val sc = Corpus.rows(2000).find(_.text == "").get
    val d3 = Extractor.extract(sc.url, sc.html, sc.text, sc.lang)
    println(s"SCANNED route=${d3.route} conf=${d3.routeConfidence} items=${d3.nItems} score=${d3.quality.overallScore}")
    println(s"SCANNED text>>>"); println(d3.extractedText.take(300)); println("<<<")
    println("GARBAGE failure='" + Extractor.extract("u1", Array[Byte](1, 2, 3, 60, 61), "", "en").failure +
      "' htmlishRoute=" + Extractor.extract("u1", "<html>".getBytes, "", "en").route)
    println("EMPTY failure='" + Extractor.extract("u2", Array.emptyByteArray, "", "en").failure + "'")
    val trunc = Extractor.extract("u3", "%PDF-1.4\n1 0 obj << stre".getBytes, "x" * 200, "en")
    println(s"TRUNCPDF failure='${trunc.failure}' route=${trunc.route} text='${trunc.extractedText}'")
    val a = Corpus.page(7); val b = Corpus.page(7)
    println("DET gen=" + java.util.Arrays.equals(a.html, b.html) +
      " extract=" + (Extractor.extract(a.url, a.html, a.text, a.lang) ==
                     Extractor.extract(b.url, b.html, b.text, b.lang)))
    val g = Corpus.page(999)
    println(s"GIANT bytes=${g.html.length} vs normal=${a.html.length} " +
      s"extractLen=${Extractor.extract(g.url, g.html, g.text, g.lang).extractedText.length}")
  }
}
