package graft.kernel

/** S10 — CSV fallback-sink rendering, byte-parity with the reference's
  * degraded save path `df.to_csv(output_path, index=False, header=False)`
  * (`table_slicer.py:159-162`, pandas on Linux, i.e. Python `csv.writer`
  * with QUOTE_MINIMAL and `lineterminator='\n'`):
  *
  *  - a field is quoted iff it contains the delimiter `,`, the quote char
  *    `"`, or the line terminator `\n` — NOT a bare `\r` (csv.writer only
  *    quotes characters of the configured terminator), quotes double inside;
  *  - every row (including the last) is `\n`-terminated; the empty grid
  *    renders as the empty string;
  *  - pandas frames are rectangular: ragged input pads right with empty
  *    cells to the widest row (missing values render empty);
  *  - a row whose ONLY field is empty renders as `""` (csv.writer writes a
  *    quoted empty so the line isn't mistaken for a blank record) — the
  *    single-column/empty-cell corner the golden battery pins.
  *
  * Parity is gated against CSV strings produced by the reference's own
  * pandas (tools/gen_golden.py → csv_cases → CsvParitySpec), the same
  * cross-implementation pattern as the difflib ratio battery.
  */
object Csv {

  private def needsQuote(s: String, singleCol: Boolean): Boolean = {
    if (singleCol && s.isEmpty) return true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ',' || c == '"' || c == '\n') return true
      i += 1
    }
    false
  }

  private def appendField(sb: StringBuilder, s: String, singleCol: Boolean): Unit =
    if (needsQuote(s, singleCol)) {
      sb.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') sb.append("\"\"") else sb.append(c)
        i += 1
      }
      sb.append('"')
    } else sb.append(s)

  /** Render a grid exactly as the reference sink would. */
  def render(grid: Seq[Seq[String]]): String = {
    if (grid.isEmpty) return ""
    val nCols = grid.iterator.map(_.length).max
    val singleCol = nCols == 1
    val sb = new StringBuilder
    grid.foreach { row =>
      var i = 0
      while (i < nCols) {
        if (i > 0) sb.append(',')
        appendField(sb, if (i < row.length) row(i) else "", singleCol)
        i += 1
      }
      sb.append('\n')
    }
    sb.toString
  }
}
