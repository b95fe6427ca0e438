package graft.tools

import graft.kernel._

/** Tight parse-only loop for JFR profiling (temporary scaffolding). */
object HotLoop {
  def main(args: Array[String]): Unit = {
    val which = if (args.nonEmpty) args(0) else "pdf"
    val secs = if (args.length > 1) args(1).toInt else 30
    val pages = (0L until 8000L).map(Corpus.page(_))
    var sink = 0L
    val t0 = System.nanoTime()
    if (which == "pdf") {
      val pdfs = pages.filter(p => PdfLite.isPdf(p.html)).map(_.html).toArray
      while ((System.nanoTime() - t0) < secs * 1e9) {
        var k = 0
        while (k < pdfs.length) { sink += PdfLite.parse(pdfs(k)).items.length; k += 1 }
      }
    } else {
      val htmls = pages.filterNot(p => PdfLite.isPdf(p.html))
        .map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8)).toArray
      while ((System.nanoTime() - t0) < secs * 1e9) {
        var k = 0
        while (k < htmls.length) { sink += Html.extract(htmls(k)).mainText.length; k += 1 }
      }
    }
    println(s"sink=$sink")
  }
}
