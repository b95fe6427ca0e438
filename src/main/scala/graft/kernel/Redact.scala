package graft.kernel

/** PII-style pattern redaction over extracted text — the scrub step a
  * training-data pipeline runs after extraction (prices, dates, account
  * numbers here; the corpus carries all three in both PDF and HTML routes).
  * This kernel form is the single-threaded oracle twin of the distributed
  * `regexp_replace`/`regexp_count` query (`ExtractOps.q47Redact`): the
  * golden generator records its output so DuckDB can verify the Spark run
  * by hash — two independent call paths over the same published semantics.
  *
  * Replacement ORDER is part of the contract (price → date → account), so
  * both sides must apply the same sequence; the patterns are disjoint in
  * the corpus but order still pins the semantics for arbitrary input.
  */
object Redact {

  /** `(kind, java-regex, replacement)` — the shared contract. Keep in sync
    * with [[graft.operators.ExtractOps.q47Redact]] (same literals). */
  val Rules: Seq[(String, String, String)] = Seq(
    ("price", """\$\d+\.\d{2}""", "[PRICE]"),
    ("date", """\b\d{1,2}/\d{1,2}/\d{4}\b""", "[DATE]"),
    ("acct", """\baccount \d{4,6}\b""", "[ACCT]"))

  private val compiled = Rules.map { case (k, re, rep) =>
    (k, java.util.regex.Pattern.compile(re), rep)
  }

  final case class Redacted(text: String, nPrice: Int, nDate: Int, nAcct: Int)

  def apply(text: String): Redacted = {
    var t = text
    val counts = new Array[Int](compiled.length)
    var i = 0
    while (i < compiled.length) {
      val m = compiled(i)._2.matcher(t)
      val sb = new java.lang.StringBuilder
      var n = 0
      while (m.find()) { n += 1; m.appendReplacement(sb, compiled(i)._3) }
      m.appendTail(sb)
      counts(i) = n
      t = sb.toString
      i += 1
    }
    Redacted(t, counts(0), counts(1), counts(2))
  }
}
