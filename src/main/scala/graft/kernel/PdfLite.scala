package graft.kernel

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** PDF-lite: a minimal, uncompressed PDF content-stream dialect that the
  * corpus generator writes and the extraction kernel parses — the sandbox
  * stand-in for the reference's native-PDF text walk (S4,
  * `smart_extract.py:64-97`: block→line→span → TextItems with int-truncated
  * bboxes, confidence 100).
  *
  * Supported operators: `BT ET Tf Td TD Tm T* Tj` over literal `(...)`
  * strings. No external binaries (Poppler/Tesseract are environment effects
  * the reference shells out to; here layout parsing is deterministic).
  *
  * Geometry contract: monospace metric `charWidth = 0.6 × fontSize`,
  * `height = fontSize`, top-left conversion `yTop = pageH − yPdf − fontSize`
  * (PyMuPDF-style), int truncation per `smart_extract.py:87-91`. Writer and
  * parser share the metric, so round-trips are exact for integer coordinates.
  */
object PdfLite {

  val CharWidthFactor = 0.6

  /** One positioned text run, in TOP-LEFT page coordinates (integers only —
    * keeps the decimal round-trip exact). */
  final case class Run(x: Int, y: Int, size: Int, text: String)

  // ---------- writer ----------

  private def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Serialize runs into a single-page PDF-lite binary. `scanned = true` adds
    * an image XObject marker so the router's detect analog
    * (`smart_extract.py:30-62`: images + no meaningful text ⇒ scanned) has
    * something to sniff. Runs on the same y share a line: the first run of a
    * line is positioned absolutely (Tm), subsequent runs relatively (Td) —
    * exercising both parser paths. */
  def write(pageW: Int, pageH: Int, runs: Seq[Run], scanned: Boolean = false): Array[Byte] = {
    val content = new java.lang.StringBuilder
    content.append("BT\n")
    var curSize = -1
    var lineY = Int.MinValue
    var curX = 0; var curY = 0
    for (r <- runs) {
      if (r.size != curSize) {
        content.append(s"/F1 ${r.size} Tf\n")
        curSize = r.size
      }
      val yPdf = pageH - r.y - r.size
      if (r.y != lineY) {
        content.append(s"1 0 0 1 ${r.x} $yPdf Tm\n")
        lineY = r.y; curX = r.x; curY = yPdf
      } else {
        content.append(s"${r.x - curX} ${yPdf - curY} Td\n")
        curX = r.x; curY = yPdf
      }
      content.append(s"(${escape(r.text)}) Tj\n")
    }
    content.append("ET\n")
    val stream = content.toString

    val sb = new java.lang.StringBuilder
    sb.append("%PDF-1.4\n")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    sb.append(s"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 $pageW $pageH] " +
      "/Contents 4 0 R >> endobj\n")
    sb.append(s"4 0 obj << /Length ${stream.length} >> stream\n")
    sb.append(stream)
    sb.append("\nendstream endobj\n")
    if (scanned)
      sb.append("5 0 obj << /Type /XObject /Subtype /Image /Width 800 /Height 1100 >> endobj\n")
    sb.append("%%EOF\n")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  // ---------- parser ----------

  final case class Parsed(items: Vector[TextItem], pageW: Int, pageH: Int, hasImage: Boolean)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  /** Page-tree walk + content-stream interpretation → positioned TextItems.
    * Tolerant: unknown operators are skipped; a malformed stream yields the
    * items recovered so far (failure isolation happens per document upstream). */
  def parse(bytes: Array[Byte]): Parsed = {
    val s = new String(bytes, StandardCharsets.UTF_8)

    // MediaBox
    var pageW = 612; var pageH = 792
    val mbIdx = s.indexOf("/MediaBox")
    if (mbIdx >= 0) {
      val open = s.indexOf('[', mbIdx)
      val close = s.indexOf(']', open)
      if (open >= 0 && close > open) {
        val nums = s.substring(open + 1, close).trim.split("\\s+")
        if (nums.length == 4) {
          try { pageW = nums(2).toDouble.toInt; pageH = nums(3).toDouble.toInt }
          catch { case _: NumberFormatException => }
        }
      }
    }
    val hasImage = s.contains("/Subtype /Image")

    val items = Vector.newBuilder[TextItem]
    var searchFrom = 0
    var streamIdx = s.indexOf("stream", searchFrom)
    while (streamIdx >= 0) {
      val contentStart = {
        var k = streamIdx + "stream".length
        if (k < s.length && s.charAt(k) == '\r') k += 1
        if (k < s.length && s.charAt(k) == '\n') k += 1
        k
      }
      val endIdx = s.indexOf("endstream", contentStart)
      val content = s.substring(contentStart, if (endIdx < 0) s.length else endIdx)
      interpret(content, pageH, items)
      searchFrom = (if (endIdx < 0) s.length else endIdx + "endstream".length)
      streamIdx = s.indexOf("stream", searchFrom)
    }
    Parsed(items.result(), pageW, pageH, hasImage)
  }

  /** Content-stream text state machine (PDF 32000-1 §9.4 subset). */
  private def interpret(content: String, pageH: Int,
                        out: mutable.Builder[TextItem, Vector[TextItem]]): Unit = {
    val toks = tokenize(content)
    var fontSize = 12.0
    var leading = 0.0
    var tmx = 0.0; var tmy = 0.0   // current text position (PDF coords)
    var lmx = 0.0; var lmy = 0.0   // line-start position
    val operands = mutable.ArrayBuffer.empty[Tok]

    def num(t: Tok): Double = t match { case TNum(v) => v; case _ => 0.0 }

    for (tok <- toks) tok match {
      case TOp("BT") =>
        tmx = 0; tmy = 0; lmx = 0; lmy = 0; operands.clear()
      case TOp("ET") => operands.clear()
      case TOp("Tf") =>
        if (operands.nonEmpty) fontSize = num(operands.last)
        operands.clear()
      case TOp("Td") | TOp("TD") =>
        if (operands.length >= 2) {
          val tx = num(operands(operands.length - 2))
          val ty = num(operands(operands.length - 1))
          lmx += tx; lmy += ty; tmx = lmx; tmy = lmy
          if (tok == TOp("TD")) leading = -ty
        }
        operands.clear()
      case TOp("Tm") =>
        if (operands.length >= 6) {
          tmx = num(operands(operands.length - 2))
          tmy = num(operands(operands.length - 1))
          lmx = tmx; lmy = tmy
        }
        operands.clear()
      case TOp("T*") =>
        lmy -= leading; tmx = lmx; tmy = lmy; operands.clear()
      case TOp("Tj") =>
        operands.lastOption match {
          case Some(TStr(raw)) =>
            val text = Py.strip(raw)
            val width = raw.length * CharWidthFactor * fontSize
            if (text.nonEmpty) {
              // mirror smart_extract.py:85-93: int truncation, conf 100
              val yTop = pageH - tmy - fontSize
              out += TextItem(text, 1, tmx.toInt, yTop.toInt,
                width.toInt, fontSize.toInt, 100)
            }
            tmx += width
          case _ =>
        }
        operands.clear()
      case TOp(_) => operands.clear() // unknown operator: drop operands
      case t => operands += t
    }
  }

  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TName(s: String) extends Tok
  private final case class TOp(s: String) extends Tok

  private def tokenize(content: String): Vector[Tok] = {
    val toks = Vector.newBuilder[Tok]
    var i = 0
    val n = content.length
    while (i < n) {
      val c = content.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val sb = new java.lang.StringBuilder
        i += 1
        var depth = 1
        while (i < n && depth > 0) {
          val ch = content.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            content.charAt(i + 1) match {
              case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
              case 't' => sb.append('\t'); case other => sb.append(other)
            }
            i += 2
          } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        toks += TStr(sb.toString)
      } else if (c == '/') {
        val start = i + 1
        i += 1
        while (i < n && !content.charAt(i).isWhitespace && content.charAt(i) != '/' &&
               content.charAt(i) != '(' && content.charAt(i) != '[') i += 1
        toks += TName(content.substring(start, i))
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.')) i += 1
        try toks += TNum(content.substring(start, i).toDouble)
        catch { case _: NumberFormatException => }
      } else if (c == '[' || c == ']') {
        i += 1 // arrays: operands pass through (TJ unsupported by design)
      } else {
        val start = i
        while (i < n && !content.charAt(i).isWhitespace &&
               content.charAt(i) != '(' && content.charAt(i) != '/' &&
               content.charAt(i) != '[') i += 1
        if (i > start) toks += TOp(content.substring(start, i))
        else i += 1
      }
    }
    toks.result()
  }
}
