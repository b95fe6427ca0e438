package graft.tools
import graft.kernel._
/** Best-of-reps single-thread full-extract throughput (window-noise-robust). */
object ExtractBest {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 4000
    val pages = (0L until n.toLong).map(Corpus.page(_)).toVector
    pages.take(800).foreach(p => Extractor.extract(p.url, p.html, p.text, p.lang))
    var best = Long.MaxValue
    for (_ <- 1 to 5) {
      val t0 = System.nanoTime()
      pages.foreach(p => Extractor.extract(p.url, p.html, p.text, p.lang))
      best = math.min(best, System.nanoTime() - t0)
    }
    println(f"[eb] $n docs best=${best / 1e9}%.3fs = ${n / (best / 1e9)}%.0f docs/s single-thread")
  }
}
