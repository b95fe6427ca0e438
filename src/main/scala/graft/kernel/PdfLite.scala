package graft.kernel

import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** PDF-lite: a deterministic PDF subset that the corpus generator writes and
  * the extraction kernel parses — the sandbox stand-in for the reference's
  * native-PDF text walk (S4, `smart_extract.py:64-97`: block→line→span →
  * TextItems with int-truncated bboxes, confidence 100).
  *
  * Parser coverage (PDF 32000-1 subsets):
  *  - object structure `N G obj … endobj`, page tree `/Type /Pages` →
  *    `/Kids [...]` → `/Type /Page` (ordered, per-page `/MediaBox` with
  *    inheritance from the Pages node), `/Contents` single ref or array;
  *  - content streams, optionally `/Filter /FlateDecode` compressed
  *    (`java.util.zip.Inflater` — zlib is public knowledge; output capped at
  *    [[InflateCap]] as decompression-bomb defense);
  *  - text operators `BT ET Tf Td TD Tm T* Tj TJ` over literal `(...)` and
  *    hex `<...>` strings; `TJ` arrays apply the standard kerning advance
  *    `tx = −n/1000 × fontSize`;
  *  - tolerant everywhere: unknown operators are skipped, malformed streams
  *    yield the items recovered so far, files with no recognizable page tree
  *    fall back to "every stream is page 1" (failure isolation happens per
  *    document upstream).
  *
  * Geometry contract: monospace metric `charWidth = 0.6 × fontSize`,
  * `height = fontSize`, top-left conversion `yTop = pageH − yPdf − fontSize`
  * (PyMuPDF-style), int truncation per `smart_extract.py:87-91`. Writer and
  * parser share the metric, so round-trips are exact for integer coordinates.
  *
  * All structural scanning happens over an ISO-8859-1 view of the bytes
  * (lossless 1:1 byte↔char), so compressed binary regions survive the string
  * operations untouched.
  */
object PdfLite {

  val CharWidthFactor = 0.6

  /** Decompressed-stream size cap: a 100 MB input (Extractor.MaxBytes) may
    * not inflate past this — past it the stream is truncated, not fatal. */
  val InflateCap: Int = 32 * 1024 * 1024

  /** One positioned text run, in TOP-LEFT page coordinates (integers only —
    * keeps the decimal round-trip exact). */
  final case class Run(x: Int, y: Int, size: Int, text: String)

  /** One page of a document to serialize. */
  final case class PageSpec(pageW: Int, pageH: Int, runs: Seq[Run])

  private val Latin1 = StandardCharsets.ISO_8859_1

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

  private def hexString(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length * 2 + 2)
    sb.append('<')
    s.foreach(c => sb.append(f"${c.toInt & 0xff}%02X"))
    sb.append('>')
    sb.toString
  }

  /** Per-page content stream. Runs on the same y share a line: the first run
    * of a line is positioned absolutely (Tm), subsequent runs relatively (Td)
    * — exercising both parser paths. `tjEvery`/`hexEvery` (0 = never) emit
    * every k-th run as a kerned `TJ` array (words separated by −600 kerning ≡
    * one space width under the monospace metric) / as a hex string — so the
    * corpus itself exercises those parser paths. */
  private def pageContent(p: PageSpec, tjEvery: Int, hexEvery: Int): String = {
    val content = new java.lang.StringBuilder
    content.append("BT\n")
    var curSize = -1
    var lineY = Int.MinValue
    var curX = 0; var curY = 0
    for ((r, idx) <- p.runs.zipWithIndex) {
      if (r.size != curSize) {
        content.append(s"/F1 ${r.size} Tf\n")
        curSize = r.size
      }
      val yPdf = p.pageH - r.y - r.size
      if (r.y != lineY) {
        content.append(s"1 0 0 1 ${r.x} $yPdf Tm\n")
        lineY = r.y; curX = r.x; curY = yPdf
      } else {
        content.append(s"${r.x - curX} ${yPdf - curY} Td\n")
        curX = r.x; curY = yPdf
      }
      val asTj = tjEvery > 0 && idx % tjEvery == tjEvery - 1 && r.text.contains(' ')
      val asHex = hexEvery > 0 && idx % hexEvery == hexEvery - 1
      if (asTj) {
        // kerned array: words advance by exactly one space width each
        val words = r.text.split(" ", -1)
        content.append(words.map { w =>
          if (asHex) hexString(w) else s"(${escape(w)})"
        }.mkString("[ ", " -600 ", " ] TJ\n"))
      } else if (asHex) {
        content.append(s"${hexString(r.text)} Tj\n")
      } else {
        content.append(s"(${escape(r.text)}) Tj\n")
      }
    }
    content.append("ET\n")
    content.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Serialize a multi-page document. `scanned = true` adds an image XObject
    * marker so the router's detect analog (`smart_extract.py:30-62`: images +
    * no meaningful text ⇒ scanned) has something to sniff; `compress` Flate-
    * encodes every content stream. */
  def writeDoc(pages: Seq[PageSpec], scanned: Boolean = false,
               compress: Boolean = false, tjEvery: Int = 0,
               hexEvery: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def put(s: String): Unit = out.write(s.getBytes(Latin1))
    val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    put("%PDF-1.4\n")
    put("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    put(s"2 0 obj << /Type /Pages /Kids [$kids] /Count ${pages.length} >> endobj\n")
    for ((p, i) <- pages.zipWithIndex) {
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      put(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 ${p.pageW} ${p.pageH}] /Contents $contObj 0 R >> endobj\n")
      val raw = pageContent(p, tjEvery, hexEvery).getBytes(Latin1)
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      put(s"$contObj 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data)
      put("\nendstream endobj\n")
    }
    if (scanned)
      put(s"${3 + 2 * pages.length} 0 obj << /Type /XObject /Subtype /Image " +
        "/Width 800 /Height 1100 >> endobj\n")
    put("%%EOF\n")
    out.toByteArray
  }

  /** Single-page legacy surface (uncompressed, literal strings). */
  def write(pageW: Int, pageH: Int, runs: Seq[Run], scanned: Boolean = false): Array[Byte] =
    writeDoc(Seq(PageSpec(pageW, pageH, runs)), scanned = scanned)

  // ---------- parser ----------

  final case class Parsed(items: Vector[TextItem], pageW: Int, pageH: Int,
                          hasImage: Boolean, nPages: Int = 1)

  def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'

  private final case class PdfObj(num: Int, dict: String,
                                  streamStart: Int, streamEnd: Int) {
    def hasStream: Boolean = streamStart >= 0
  }

  /** Locate `N G obj` working BACKWARD from an `obj` keyword hit: generation
    * digits, whitespace, object digits. Returns (objNum, matchStart) or null.
    * (A regex `\d+\s+\d+\s+obj` re-attempts at every digit of the
    * coordinate-dense content — this scan touches each byte once.) */
  private def objHeaderBefore(s: String, objIdx: Int): (Int, Int) = {
    var k = objIdx - 1
    if (k < 0 || !s.charAt(k).isWhitespace) return null
    while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
    val genEnd = k
    while (k >= 0 && s.charAt(k).isDigit) k -= 1
    if (k == genEnd || k < 0 || !s.charAt(k).isWhitespace) return null
    while (k >= 0 && s.charAt(k).isWhitespace) k -= 1
    val numEnd = k
    while (k >= 0 && s.charAt(k).isDigit) k -= 1
    if (k == numEnd) return null
    val numStart = k + 1
    if (numEnd - numStart > 8) return null // absurd object number: not a header
    try (s.substring(numStart, numEnd + 1).toInt, numStart)
    catch { case _: NumberFormatException => null }
  }

  /** Scan the object skeleton: number, dict text, raw stream byte range.
    * A cursor skips matches that fall INSIDE a previous object's stream —
    * compressed binary data can spell "N 0 obj" by accident. */
  private def scanObjects(s: String): Vector[PdfObj] = {
    val out = Vector.newBuilder[PdfObj]
    var cursor = 0
    var objIdx = s.indexOf("obj")
    while (objIdx >= 0) {
      val boundaryOk = objIdx + 3 >= s.length ||
        { val c = s.charAt(objIdx + 3); !c.isLetterOrDigit }
      val hdr = if (boundaryOk) objHeaderBefore(s, objIdx) else null
      val num = if (hdr == null) -1 else hdr._1
      if (num >= 0 && hdr._2 >= cursor) {
        val bodyStart = objIdx + 3
        val endObj = s.indexOf("endobj", bodyStart)
        val bodyEnd = if (endObj < 0) s.length else endObj
        val streamKw = s.indexOf("stream", bodyStart)
        if (streamKw >= 0 && streamKw < bodyEnd) {
          var k = streamKw + "stream".length
          if (k < s.length && s.charAt(k) == '\r') k += 1
          if (k < s.length && s.charAt(k) == '\n') k += 1
          // `endstream` may sit past the `endobj` guess when the binary
          // stream itself contains the bytes "endobj" — trust endstream
          val endStream = s.indexOf("endstream", k)
          val se = if (endStream < 0) bodyEnd else endStream
          out += PdfObj(num, s.substring(bodyStart, streamKw), k, se)
          cursor = se
        } else {
          out += PdfObj(num, s.substring(bodyStart, bodyEnd), -1, -1)
          cursor = bodyStart
        }
      }
      objIdx = s.indexOf("obj", objIdx + 3)
    }
    out.result()
  }

  /** `/Name <num> 0 R` single reference. */
  private def refOf(dict: String, name: String): Option[Int] = {
    val i = dict.indexOf(name)
    if (i < 0) return None
    val tail = dict.substring(i + name.length).trim
    val m = java.util.regex.Pattern.compile("^(\\d+)\\s+\\d+\\s+R").matcher(tail)
    if (m.find()) Some(m.group(1).toInt) else None
  }

  /** `/Name [n 0 R n 0 R …]` reference array (also accepts a single ref). */
  private def refsOf(dict: String, name: String): Vector[Int] = {
    val i = dict.indexOf(name)
    if (i < 0) return Vector.empty
    val tail = dict.substring(i + name.length).trim
    if (tail.startsWith("[")) {
      val close = tail.indexOf(']')
      val inner = if (close < 0) tail.substring(1) else tail.substring(1, close)
      val m = java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+R").matcher(inner)
      val out = Vector.newBuilder[Int]
      while (m.find()) out += m.group(1).toInt
      out.result()
    } else refOf(dict, name).toVector
  }

  /** `[a b c d]` after /MediaBox → (w, h). */
  private def mediaBoxOf(dict: String): Option[(Int, Int)] = {
    val i = dict.indexOf("/MediaBox")
    if (i < 0) return None
    val open = dict.indexOf('[', i)
    val close = if (open < 0) -1 else dict.indexOf(']', open)
    if (open < 0 || close < 0) return None
    val nums = dict.substring(open + 1, close).trim.split("\\s+")
    if (nums.length != 4) return None
    try Some((nums(2).toDouble.toInt, nums(3).toDouble.toInt))
    catch { case _: NumberFormatException => None }
  }

  private def inflate(s: String, from: Int, until: Int): String = {
    val n = math.max(0, until - from)
    val in = new Array[Byte](n)
    var i = 0
    while (i < n) { in(i) = s.charAt(from + i).toByte; i += 1 }
    val inf = new java.util.zip.Inflater()
    inf.setInput(in)
    val out = new java.io.ByteArrayOutputStream(math.min(InflateCap, n * 4 + 64))
    val buf = new Array[Byte](8192)
    try {
      var done = false
      while (!done && out.size < InflateCap) {
        val k = inf.inflate(buf)
        if (k > 0) out.write(buf, 0, math.min(k, InflateCap - out.size))
        else done = true
      }
    } catch { case _: java.util.zip.DataFormatException => /* keep partial */ }
    finally inf.end()
    new String(out.toByteArray, Latin1)
  }

  /** Page-tree walk + content-stream interpretation → positioned TextItems
    * (with 1-based page numbers). Tolerant: unknown operators are skipped; a
    * malformed stream yields the items recovered so far; no recognizable page
    * tree ⇒ every stream interpreted as page 1 (round-1 dialect and garbage
    * both land here). */
  def parse(bytes: Array[Byte]): Parsed = {
    val s = new String(bytes, Latin1)
    val hasImage = s.contains("/Subtype /Image")
    val objs = scanObjects(s)
    // first definition wins: a spurious in-stream "N 0 obj" must not shadow
    // the real object N
    val byNum = objs.foldLeft(Map.empty[Int, PdfObj]) { (m, o) =>
      if (m.contains(o.num)) m else m.updated(o.num, o)
    }

    // page order: depth-first /Kids descent from the root Pages node
    // (intermediate /Type /Pages nodes recurse — real page trees nest);
    // fallback to all /Type /Page objects in file order. Cycle-safe via a
    // visited set, depth-capped defensively.
    def isPagesNode(o: PdfObj): Boolean = o.dict.contains("/Type /Pages")
    def isPageLeaf(o: PdfObj): Boolean =
      o.dict.contains("/Type /Page") && !isPagesNode(o)
    val pagesNode = objs.find(isPagesNode)
    // each leaf is paired with the nearest ancestor's /MediaBox (PDF
    // inheritance: a Page without its own box uses the closest Pages box)
    val kidPages: Vector[(PdfObj, Option[(Int, Int)])] = {
      val seen = mutable.Set.empty[Int]
      def descend(o: PdfObj, depth: Int,
                  inh: Option[(Int, Int)]): Vector[(PdfObj, Option[(Int, Int)])] =
        if (depth > 32 || !seen.add(o.num)) Vector.empty
        else if (isPageLeaf(o)) Vector((o, inh))
        else if (isPagesNode(o)) {
          val here = mediaBoxOf(o.dict).orElse(inh)
          refsOf(o.dict, "/Kids").flatMap(byNum.get).flatMap(descend(_, depth + 1, here))
        } else Vector.empty
      pagesNode.toVector.flatMap(descend(_, 0, None))
    }
    val rootBox = pagesNode.flatMap(p => mediaBoxOf(p.dict))
    val pageObjs: Vector[(PdfObj, Option[(Int, Int)])] =
      if (kidPages.nonEmpty) kidPages
      else objs.filter(isPageLeaf).map(o => (o, rootBox))

    val items = Vector.newBuilder[TextItem]
    var firstW = 612; var firstH = 792

    def contentOf(o: PdfObj): String =
      if (!o.hasStream) ""
      else if (o.dict.contains("/FlateDecode")) inflate(s, o.streamStart, o.streamEnd)
      else s.substring(o.streamStart, o.streamEnd)

    if (pageObjs.nonEmpty) {
      for (((p, inh), idx) <- pageObjs.zipWithIndex) {
        val (w, h) = mediaBoxOf(p.dict).orElse(inh).getOrElse((612, 792))
        if (idx == 0) { firstW = w; firstH = h }
        val contents = refsOf(p.dict, "/Contents").flatMap(byNum.get)
        for (c <- contents) interpret(contentOf(c), h, idx + 1, items)
      }
      Parsed(items.result(), firstW, firstH, hasImage, pageObjs.length)
    } else {
      // fallback: no page tree — treat every stream as page 1 content
      val (w, h) = objs.iterator.flatMap(o => mediaBoxOf(o.dict)).nextOption()
        .orElse(Option(s).flatMap(mediaBoxOf)).getOrElse((612, 792))
      var any = false
      for (o <- objs if o.hasStream) { any = true; interpret(contentOf(o), h, 1, items) }
      if (!any) {
        // degenerate: raw "stream … endstream" spans with no object skeleton
        var from = 0
        var k = s.indexOf("stream", from)
        while (k >= 0) {
          var cs = k + "stream".length
          if (cs < s.length && s.charAt(cs) == '\r') cs += 1
          if (cs < s.length && s.charAt(cs) == '\n') cs += 1
          val e = s.indexOf("endstream", cs)
          interpret(s.substring(cs, if (e < 0) s.length else e), h, 1, items)
          from = if (e < 0) s.length else e + "endstream".length
          k = s.indexOf("stream", from)
        }
      }
      Parsed(items.result(), w, h, hasImage, 1)
    }
  }

  /** Content-stream text state machine (PDF 32000-1 §9.4 subset). */
  private def interpret(content: String, pageH: Int, pageNum: Int,
                        out: mutable.Builder[TextItem, Vector[TextItem]]): Unit = {
    val toks = tokenize(content)
    var fontSize = 12.0
    var leading = 0.0
    var tmx = 0.0; var tmy = 0.0   // current text position (PDF coords)
    var lmx = 0.0; var lmy = 0.0   // line-start position
    val operands = mutable.ArrayBuffer.empty[Tok]

    def num(t: Tok): Double = t match { case TNum(v) => v; case _ => 0.0 }

    def emit(raw: String): Unit = {
      val text = Py.strip(raw)
      val width = raw.length * CharWidthFactor * fontSize
      if (text.nonEmpty) {
        // mirror smart_extract.py:85-93: int truncation, conf 100
        val yTop = pageH - tmy - fontSize
        out += TextItem(text, pageNum, tmx.toInt, yTop.toInt,
          width.toInt, fontSize.toInt, 100)
      }
      tmx += width
    }

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
          case Some(TStr(raw)) => emit(raw)
          case _ =>
        }
        operands.clear()
      case TOp("TJ") =>
        operands.lastOption match {
          case Some(TArr(elems)) =>
            for (e <- elems) e match {
              case TStr(raw) => emit(raw)
              case TNum(n) => tmx -= n / 1000.0 * fontSize // standard kerning advance
              case _ =>
            }
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
  private final case class TArr(elems: Vector[Tok]) extends Tok
  private final case class TOp(s: String) extends Tok

  private def tokenize(content: String): Vector[Tok] = {
    var i = 0
    val n = content.length

    def literalString(): TStr = { // caller consumed '('
      val sb = new java.lang.StringBuilder
      var depth = 1
      while (i < n && depth > 0) {
        val ch = content.charAt(i)
        if (ch == '\\' && i + 1 < n) {
          content.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case '\n' => i += 2 // line continuation (PDF 32000-1 §7.3.4.2)
            case '\r' => // \<CR> or \<CRLF> continuation
              i += 2
              if (i < n && content.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' => // octal \d, \dd or \ddd
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < n && content.charAt(i) >= '0' &&
                     content.charAt(i) <= '7') {
                v = (v << 3) | (content.charAt(i) - '0'); i += 1; k += 1
              }
              sb.append((v & 0xff).toChar)
            case other => sb.append(other); i += 2
          }
        } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
        else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
        else { sb.append(ch); i += 1 }
      }
      TStr(sb.toString)
    }

    def hexStringTok(): TStr = { // caller consumed '<'
      val sb = new java.lang.StringBuilder
      var hi = -1
      var done = false
      while (i < n && !done) {
        val ch = content.charAt(i)
        if (ch == '>') { done = true; i += 1 }
        else {
          val d = Character.digit(ch, 16)
          if (d >= 0) {
            if (hi < 0) hi = d
            else { sb.append(((hi << 4) | d).toChar); hi = -1 }
          }
          i += 1 // non-hex chars (whitespace) skipped per spec
        }
      }
      if (hi >= 0) sb.append((hi << 4).toChar) // odd final digit: low nibble 0
      TStr(sb.toString)
    }

    val MaxArrayNesting = 32

    // iterative skip-paths (a stream of '- - -' NFE hits or stray ']'s must
    // not grow the call stack — recursion here is only per ARRAY NESTING
    // level, which is depth-capped)
    def one(depth: Int): Option[Tok] = {
      while (true) {
        while (i < n && content.charAt(i).isWhitespace) i += 1
        if (i >= n) return None
        val c = content.charAt(i)
        if (c == '(') { i += 1; return Some(literalString()) }
        else if (c == '<') {
          if (i + 1 < n && content.charAt(i + 1) == '<') { i += 2; return Some(TOp("<<")) }
          else { i += 1; return Some(hexStringTok()) }
        } else if (c == '>') {
          if (i + 1 < n && content.charAt(i + 1) == '>') { i += 2; return Some(TOp(">>")) }
          else i += 1 // stray '>': skip, keep scanning
        } else if (c == '/') {
          val start = i + 1
          i += 1
          while (i < n && !content.charAt(i).isWhitespace && content.charAt(i) != '/' &&
                 content.charAt(i) != '(' && content.charAt(i) != '[' &&
                 content.charAt(i) != '<' && content.charAt(i) != ']') i += 1
          return Some(TName(content.substring(start, i)))
        } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
          val start = i
          i += 1
          while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.')) i += 1
          try return Some(TNum(content.substring(start, i).toDouble))
          catch { case _: NumberFormatException => } // not a number: skip, keep scanning
        } else if (c == '[') {
          i += 1
          if (depth < MaxArrayNesting) {
            val elems = Vector.newBuilder[Tok]
            var done = false
            while (!done) {
              // peek for closing bracket
              while (i < n && content.charAt(i).isWhitespace) i += 1
              if (i >= n) done = true
              else if (content.charAt(i) == ']') { i += 1; done = true }
              else one(depth + 1) match {
                case Some(t) => elems += t
                case None => done = true
              }
            }
            return Some(TArr(elems.result()))
          } // past the nesting cap: drop the bracket, keep scanning
        } else if (c == ']') i += 1 // stray ']': skip
        else {
          val start = i
          while (i < n && !content.charAt(i).isWhitespace &&
                 content.charAt(i) != '(' && content.charAt(i) != '/' &&
                 content.charAt(i) != '[' && content.charAt(i) != '<' &&
                 content.charAt(i) != ']') i += 1
          if (i > start) return Some(TOp(content.substring(start, i)))
          else i += 1
        }
      }
      None // unreachable
    }

    val toks = Vector.newBuilder[Tok]
    var t = one(0)
    while (t.isDefined) { toks += t.get; t = one(0) }
    toks.result()
  }
}
