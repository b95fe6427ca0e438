package graft.tools

import graft.kernel._

/** Sub-stage profiler for the two payload parsers — answers "where inside
  * PdfLite.parse / Html.extract does the time go" so kernel optimization is
  * measurement-driven (single-threaded: stable on this VM, see BASELINE.md).
  * sbt -batch "runMain graft.tools.ProfileParse [nDocs]" */
object ProfileParse {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 6000
    val pages = (0L until n.toLong).map(Corpus.page(_)).toVector
    val pdfs = pages.filter(p => PdfLite.isPdf(p.html))
    val htmls = pages.filterNot(p => PdfLite.isPdf(p.html))
      .map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))

    // warmup
    pdfs.take(300).foreach(p => PdfLite.parse(p.html))
    htmls.take(300).foreach(Html.extract)

    def time[A](reps: Int)(f: => A): Double = {
      var best = Long.MaxValue
      var r = 0
      while (r < reps) {
        val t0 = System.nanoTime(); f
        best = math.min(best, System.nanoTime() - t0); r += 1
      }
      best / 1e6
    }

    // ---- PDF: full parse vs parse-minus-interpret (structure only) ----
    val tFull = time(3) { pdfs.foreach(p => PdfLite.parse(p.html)) }
    val tStruct = time(3) { pdfs.foreach(p => PdfLite.parseStructureOnly(p.html)) }
    println(f"[pp] pdf docs=${pdfs.size}: full=${tFull / pdfs.size}%.4f ms/doc, structure-only=${tStruct / pdfs.size}%.4f ms/doc, interpret+tokenize=${(tFull - tStruct) / pdfs.size}%.4f ms/doc")

    // ---- HTML: parse vs select vs serialize vs items ----
    val roots = htmls.map(Html.parse)
    val tParse = time(3) { htmls.foreach(Html.parse) }
    val tSelect = time(3) { roots.foreach(Html.selectMain) }
    val mains = roots.map(r => Html.selectMain(r).getOrElse(r))
    val tSer = time(3) { mains.foreach(Html.serialize) }
    val tAll = time(3) { htmls.foreach(Html.extract) }
    println(f"[pp] html docs=${htmls.size}: extract=${tAll / htmls.size}%.4f parse=${tParse / htmls.size}%.4f select=${tSelect / htmls.size}%.4f serialize=${tSer / htmls.size}%.4f rest=${(tAll - tParse - tSelect - tSer) / htmls.size}%.4f ms/doc")
  }
}
