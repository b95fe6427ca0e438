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
  *  - classic cross-reference tables (§7.5.4): `startxref` → newest table →
  *    `/Prev` chain, newest-section-wins — incremental updates resolve to
  *    the live object definition, and the trailer `/Root` selects the
  *    authoritative page tree;
  *  - object streams (§7.5.7): `/Type /ObjStm` containers are inflated and
  *    their embedded dict-only objects (Catalog/Pages/Page nodes in real
  *    files) recovered by scan, no xref stream required;
  *  - content streams, optionally `/Filter /FlateDecode` compressed
  *    (`java.util.zip.Inflater` — zlib is public knowledge; output capped at
  *    [[InflateCap]] as decompression-bomb defense);
  *  - text operators `BT ET Tf Td TD Tm T* Tj TJ` over literal `(...)` and
  *    hex `<...>` strings; `TJ` arrays apply the standard kerning advance
  *    `tx = −n/1000 × fontSize`;
  *  - simple font encodings: `/Resources → /Font → /Encoding
  *    /WinAnsiEncoding` re-reads shown strings as windows-1252 (smart
  *    quotes, dashes, € in 0x80–0x9F), tracked per Tf font;
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

  /** Writer text-encoding contract (ADVICE r02): the serialized byte per char
    * is the char's code point under the doc's DECLARED encoding — Latin-1 by
    * default, windows-1252 when the doc declares `/WinAnsiEncoding`. A char
    * the encoding cannot represent becomes a literal '?' HERE, explicitly and
    * deterministically, instead of corrupting silently inside
    * `getBytes(ISO_8859_1)` downstream. */
  private def encodeText(t: String, winAnsi: Boolean): String =
    if (winAnsi) new String(t.getBytes("windows-1252"), Latin1)
    else t.map(c => if (c > 0xff) '?' else c)

  /** Per-page content stream. Runs on the same y share a line: the first run
    * of a line is positioned absolutely (Tm), subsequent runs relatively (Td)
    * — exercising both parser paths. `tjEvery`/`hexEvery` (0 = never) emit
    * every k-th run as a kerned `TJ` array (words separated by −600 kerning ≡
    * one space width under the monospace metric) / as a hex string — so the
    * corpus itself exercises those parser paths. */
  private def pageContent(p: PageSpec, tjEvery: Int, hexEvery: Int,
                          winAnsi: Boolean = false): String = {
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
      val enc = encodeText(r.text, winAnsi)
      val asTj = tjEvery > 0 && idx % tjEvery == tjEvery - 1 && enc.contains(' ')
      val asHex = hexEvery > 0 && idx % hexEvery == hexEvery - 1
      if (asTj) {
        // kerned array: words advance by exactly one space width each
        val words = enc.split(" ", -1)
        content.append(words.map { w =>
          if (asHex) hexString(w) else s"(${escape(w)})"
        }.mkString("[ ", " -600 ", " ] TJ\n"))
      } else if (asHex) {
        content.append(s"${hexString(enc)} Tj\n")
      } else {
        content.append(s"(${escape(enc)}) Tj\n")
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
    * encodes every content stream.
    *
    * Real-world dialect flags:
    *  - `xref` appends a classic cross-reference table + trailer + startxref
    *    (PDF 32000-1 §7.5.4) with true byte offsets;
    *  - `objStm` moves the structural dicts (Catalog/Pages/Page) into one
    *    Flate-compressed object stream (§7.5.7) — content streams stay
    *    top-level (streams cannot nest in an ObjStm). In a classic xref the
    *    in-ObjStm objects are marked free (only xref STREAMS can type-2
    *    reference them); the parser recovers them by ObjStm expansion;
    *  - `winAnsi` declares `/Encoding /WinAnsiEncoding` on the page font and
    *    serializes text through windows-1252, so cp1252-only chars (smart
    *    quotes, em dash, €) round-trip as single bytes. */
  def writeDoc(pages: Seq[PageSpec], scanned: Boolean = false,
               compress: Boolean = false, tjEvery: Int = 0,
               hexEvery: Int = 0, xref: Boolean = false,
               objStm: Boolean = false, winAnsi: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    def put(s: String): Unit = out.write(s.getBytes(Latin1))
    val offsets = mutable.Map.empty[Int, Int] // top-level obj num → byte offset
    def beginObj(num: Int): Unit = offsets(num) = out.size

    val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val imageObjNum = 3 + 2 * pages.length
    val fontObjNum = imageObjNum + (if (scanned) 1 else 0)
    val objStmNum = fontObjNum + (if (winAnsi) 1 else 0)
    val resources =
      if (winAnsi) s" /Resources << /Font << /F1 $fontObjNum 0 R >> >>" else ""
    def catalogDict = "<< /Type /Catalog /Pages 2 0 R >>"
    def pagesDict = s"<< /Type /Pages /Kids [$kids] /Count ${pages.length} >>"
    def pageDict(i: Int, p: PageSpec) =
      s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 ${p.pageW} ${p.pageH}] " +
        s"/Contents ${4 + 2 * i} 0 R$resources >>"

    put("%PDF-1.4\n")
    if (objStm) {
      val bodies = Seq(1 -> catalogDict, 2 -> pagesDict) ++
        pages.zipWithIndex.map { case (p, i) => (3 + 2 * i) -> pageDict(i, p) }
      val sb = new java.lang.StringBuilder
      val offs = bodies.map { case (_, b) =>
        val o = sb.length; sb.append(b).append('\n'); o }
      val header = bodies.zip(offs)
        .map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
      val data = deflate((header + sb).getBytes(Latin1))
      beginObj(objStmNum)
      put(s"$objStmNum 0 obj << /Type /ObjStm /N ${bodies.length} " +
        s"/First ${header.length} /Length ${data.length} /Filter /FlateDecode >> stream\n")
      out.write(data)
      put("\nendstream endobj\n")
    } else {
      beginObj(1); put(s"1 0 obj $catalogDict endobj\n")
      beginObj(2); put(s"2 0 obj $pagesDict endobj\n")
    }
    for ((p, i) <- pages.zipWithIndex) {
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      if (!objStm) {
        beginObj(pageObj)
        put(s"$pageObj 0 obj ${pageDict(i, p)} endobj\n")
      }
      val raw = pageContent(p, tjEvery, hexEvery, winAnsi).getBytes(Latin1)
      val data = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      beginObj(contObj)
      put(s"$contObj 0 obj << /Length ${data.length}$filter >> stream\n")
      out.write(data)
      put("\nendstream endobj\n")
    }
    if (scanned) {
      beginObj(imageObjNum)
      put(s"$imageObjNum 0 obj << /Type /XObject /Subtype /Image " +
        "/Width 800 /Height 1100 >> endobj\n")
    }
    if (winAnsi) {
      beginObj(fontObjNum)
      put(s"$fontObjNum 0 obj << /Type /Font /Subtype /Type1 " +
        "/BaseFont /Helvetica /Encoding /WinAnsiEncoding >> endobj\n")
    }
    if (xref) {
      val size = (offsets.keys.max max objStmNum) + 1
      val xrefOff = out.size
      put("xref\n")
      put(s"0 $size\n")
      put("0000000000 65535 f \n")
      for (n <- 1 until size) offsets.get(n) match {
        case Some(o) => put(f"$o%010d 00000 n \n")
        case None => put("0000000000 65535 f \n")
      }
      put(s"trailer << /Size $size /Root 1 0 R >>\nstartxref\n$xrefOff\n")
    }
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

  /** Decoded text of an object's stream ("" when none). */
  private def streamText(s: String, o: PdfObj): String =
    if (!o.hasStream) ""
    else if (o.dict.contains("/FlateDecode")) inflate(s, o.streamStart, o.streamEnd)
    else s.substring(o.streamStart, o.streamEnd)

  /** `/Name 123` integer value. */
  private def intAfter(dict: String, name: String): Option[Int] = {
    val i = dict.indexOf(name)
    if (i < 0) return None
    val m = java.util.regex.Pattern.compile("^\\s+(\\d+)")
      .matcher(dict.substring(i + name.length))
    if (m.find()) Some(m.group(1).toInt) else None
  }

  /** Balanced `<< … >>` dict text starting at/after `from` (None if absent
    * or unbalanced within a sanity window). */
  private def dictSpan(s: String, from: Int): Option[String] = {
    val open = s.indexOf("<<", from)
    if (open < 0) return None
    var depth = 0
    var k = open
    while (k < s.length - 1) {
      if (s.charAt(k) == '<' && s.charAt(k + 1) == '<') { depth += 1; k += 2 }
      else if (s.charAt(k) == '>' && s.charAt(k + 1) == '>') {
        depth -= 1; k += 2
        if (depth == 0) return Some(s.substring(open, k))
      } else k += 1
    }
    None
  }

  /** Parse the object whose header sits at byte offset `off` (as recorded in
    * a classic xref table): `N G obj` then either a plain dict body or a
    * stream with the usual endstream/endobj recovery. */
  private def objAt(s: String, off: Int): Option[PdfObj] = {
    if (off < 0 || off >= s.length) return None
    val m = java.util.regex.Pattern.compile("\\G\\s*(\\d+)\\s+\\d+\\s+obj")
      .matcher(s)
    m.region(off, math.min(s.length, off + 64))
    if (!m.lookingAt()) return None
    val num = try m.group(1).toInt catch { case _: NumberFormatException => return None }
    val bodyStart = m.end()
    val endObj = s.indexOf("endobj", bodyStart)
    val bodyEnd = if (endObj < 0) s.length else endObj
    val streamKw = s.indexOf("stream", bodyStart)
    if (streamKw >= 0 && streamKw < bodyEnd) {
      var k = streamKw + "stream".length
      if (k < s.length && s.charAt(k) == '\r') k += 1
      if (k < s.length && s.charAt(k) == '\n') k += 1
      val endStream = s.indexOf("endstream", k)
      val se = if (endStream < 0) bodyEnd else endStream
      Some(PdfObj(num, s.substring(bodyStart, streamKw), k, se))
    } else Some(PdfObj(num, s.substring(bodyStart, bodyEnd), -1, -1))
  }

  /** Classic cross-reference chain (PDF 32000-1 §7.5.4): follow `startxref`
    * to the newest table, then `/Prev` links to older ones. Returns the
    * objNum → byte-offset map with NEWEST-section-wins semantics — this is
    * what makes incremental updates (same object number redefined later in
    * the file) resolve to the live definition — plus the newest trailer dict.
    * Malformed tables yield whatever parsed (the linear object scan remains
    * the fallback). */
  private def parseXrefChain(s: String): (Map[Int, Int], Option[String]) = {
    val sx = s.lastIndexOf("startxref")
    if (sx < 0) return (Map.empty, None)
    val offM = java.util.regex.Pattern.compile("\\G\\s*(\\d+)").matcher(s)
    offM.region(sx + "startxref".length, math.min(s.length, sx + 64))
    if (!offM.lookingAt()) return (Map.empty, None)
    val resolved = mutable.Map.empty[Int, Int]
    var trailerDict: Option[String] = None
    val seen = mutable.Set.empty[Int]
    var cur = try offM.group(1).toInt catch { case _: NumberFormatException => -1 }
    val entryPat = java.util.regex.Pattern.compile("\\G\\s*(\\d{10})\\s+(\\d{5})\\s+([nf])")
    val subPat = java.util.regex.Pattern.compile("\\G\\s*(\\d+)\\s+(\\d+)")
    while (cur >= 0 && cur < s.length && seen.add(cur)) {
      var next = -1
      val xm = java.util.regex.Pattern.compile("\\G\\s*xref").matcher(s)
      xm.region(cur, math.min(s.length, cur + 32))
      if (xm.lookingAt()) {
        var pos = xm.end()
        var more = true
        while (more) {
          val sm = subPat.matcher(s)
          sm.region(pos, math.min(s.length, pos + 64))
          if (sm.lookingAt()) {
            val start = sm.group(1).toInt
            val count = sm.group(2).toInt
            pos = sm.end()
            var k = 0
            var ok = true
            while (k < count && ok) {
              val em = entryPat.matcher(s)
              em.region(pos, math.min(s.length, pos + 64))
              if (em.lookingAt()) {
                if (em.group(3) == "n") {
                  val num = start + k
                  if (!resolved.contains(num)) resolved(num) = em.group(1).toInt
                }
                pos = em.end(); k += 1
              } else { ok = false; more = false }
            }
          } else more = false
        }
        val tr = s.indexOf("trailer", pos)
        if (tr >= 0) dictSpan(s, tr).foreach { d =>
          if (trailerDict.isEmpty) trailerDict = Some(d)
          next = intAfter(d, "/Prev").getOrElse(-1)
        }
      }
      cur = next
    }
    (resolved.toMap, trailerDict)
  }

  /** Expand `/Type /ObjStm` object streams (PDF 32000-1 §7.5.7): inflate,
    * read the N (objnum, relative-offset) header pairs, slice out each
    * embedded dict-only object. Scan-based (no xref stream needed) — the
    * recovered objects never shadow a top-level definition. */
  private def expandObjStms(objs: Iterable[PdfObj], s: String): Vector[PdfObj] = {
    val out = Vector.newBuilder[PdfObj]
    for (o <- objs if o.hasStream && o.dict.contains("/ObjStm")) {
      val data = streamText(s, o)
      val first = intAfter(o.dict, "/First").getOrElse(-1)
      val n = intAfter(o.dict, "/N").getOrElse(0)
      if (first > 0 && first <= data.length && n > 0 && n <= 10000) {
        val header = data.substring(0, first).trim.split("\\s+")
        if (header.length >= 2 * n) {
          val pairs = (0 until n).flatMap { k =>
            try Some((header(2 * k).toInt, header(2 * k + 1).toInt))
            catch { case _: NumberFormatException => None }
          }
          for (((num, rel), k) <- pairs.zipWithIndex) {
            val from = first + rel
            val until = if (k + 1 < pairs.length) math.min(data.length, first + pairs(k + 1)._2)
                        else data.length
            if (from >= 0 && from <= until && until <= data.length)
              out += PdfObj(num, data.substring(from, until), -1, -1)
          }
        }
      }
    }
    out.result()
  }

  /** Per-font encodings for a page: resolve `/Resources` (inline dict or
    * reference, page-level else inherited), then `/Font << /Fi N 0 R … >>`,
    * then each font object's `/Encoding`. Only the encodings the interpreter
    * distinguishes are reported (WinAnsi vs default). */
  private def fontEncodings(pageDict: String, inherited: Option[String],
                            byNum: Map[Int, PdfObj]): Map[String, String] = {
    def resourcesText(dict: String): Option[String] = {
      val i = dict.indexOf("/Resources")
      if (i < 0) None
      else refOf(dict.substring(i), "/Resources") match {
        case Some(r) => byNum.get(r).map(_.dict)
        case None => dictSpan(dict, i + "/Resources".length)
      }
    }
    val res = resourcesText(pageDict).orElse(inherited.flatMap(resourcesText))
    res.flatMap { r =>
      val fi = r.indexOf("/Font")
      if (fi < 0) None
      else dictSpan(r, fi + "/Font".length).map { fonts =>
        val m = java.util.regex.Pattern
          .compile("/(\\w+)\\s+(\\d+)\\s+\\d+\\s+R").matcher(fonts)
        val out = Map.newBuilder[String, String]
        while (m.find()) {
          val enc = byNum.get(m.group(2).toInt)
            .map(_.dict).getOrElse("")
          if (enc.contains("/WinAnsiEncoding")) out += m.group(1) -> "WinAnsi"
        }
        out.result()
      }
    }.getOrElse(Map.empty)
  }

  /** windows-1252 view of a raw byte-per-char string — applied when the
    * current font declares `/WinAnsiEncoding` (maps 0x80–0x9F to smart
    * quotes, dashes, €, …; the rest coincides with Latin-1). */
  private def winAnsiText(raw: String): String = {
    var needs = false
    var k = 0
    while (k < raw.length && !needs) {
      val c = raw.charAt(k)
      if (c >= 0x80 && c <= 0x9f) needs = true
      k += 1
    }
    if (!needs) raw
    else {
      val bytes = new Array[Byte](raw.length)
      var j = 0
      while (j < raw.length) { bytes(j) = (raw.charAt(j) & 0xff).toByte; j += 1 }
      new String(bytes, "windows-1252")
    }
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
    // resolution order (PDF semantics):
    //  1. linear scan, first definition wins — a spurious in-stream
    //     "N 0 obj" must not shadow the real object N;
    //  2. classic xref chain OVERRIDES the scan — incremental updates
    //     redefine an object later in the file and the newest xref section
    //     is authoritative;
    //  3. /ObjStm-embedded objects fill in numbers nothing top-level defines.
    val (xrefMap, trailerDict) = parseXrefChain(s)
    val linearByNum = objs.foldLeft(Map.empty[Int, PdfObj]) { (m, o) =>
      if (m.contains(o.num)) m else m.updated(o.num, o)
    }
    val xrefByNum = xrefMap.flatMap { case (num, off) =>
      objAt(s, off).filter(_.num == num).map(num -> _)
    }
    val topLevel = linearByNum ++ xrefByNum
    // ObjStm containers are themselves top-level objects, so the linear scan
    // always finds them (in file order — deterministic expansion)
    val embedded = expandObjStms(objs, s)
    val byNum = embedded.foldLeft(topLevel) { (m, o) =>
      if (m.contains(o.num)) m else m.updated(o.num, o)
    }

    // page order: depth-first /Kids descent from the root Pages node
    // (intermediate /Type /Pages nodes recurse — real page trees nest);
    // root preferably via trailer /Root → Catalog → /Pages (the xref-era
    // authoritative path), else the first Pages node in file/ObjStm order;
    // fallback to all /Type /Page objects in file order. Cycle-safe via a
    // visited set, depth-capped defensively.
    def isPagesNode(o: PdfObj): Boolean = o.dict.contains("/Type /Pages")
    def isPageLeaf(o: PdfObj): Boolean =
      o.dict.contains("/Type /Page") && !isPagesNode(o)
    val pagesNode = trailerDict
      .flatMap(refOf(_, "/Root")).flatMap(byNum.get)
      .flatMap(cat => refOf(cat.dict, "/Pages")).flatMap(byNum.get)
      .filter(isPagesNode)
      .orElse((objs ++ embedded).find(isPagesNode))
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

    def contentOf(o: PdfObj): String = streamText(s, o)

    if (pageObjs.nonEmpty) {
      for (((p, inh), idx) <- pageObjs.zipWithIndex) {
        val (w, h) = mediaBoxOf(p.dict).orElse(inh).getOrElse((612, 792))
        if (idx == 0) { firstW = w; firstH = h }
        val encs = fontEncodings(p.dict, pagesNode.map(_.dict), byNum)
        val contents = refsOf(p.dict, "/Contents").flatMap(byNum.get)
        for (c <- contents) interpret(contentOf(c), h, idx + 1, items, encs)
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

  /** Content-stream text state machine (PDF 32000-1 §9.4 subset). `encs`
    * maps font resource names (Tf's first operand) to their declared
    * encoding; strings shown under a `/WinAnsiEncoding` font are re-read as
    * windows-1252 before emission. */
  private def interpret(content: String, pageH: Int, pageNum: Int,
                        out: mutable.Builder[TextItem, Vector[TextItem]],
                        encs: Map[String, String] = Map.empty): Unit = {
    val toks = tokenize(content)
    var fontSize = 12.0
    var winAnsi = false
    var leading = 0.0
    var tmx = 0.0; var tmy = 0.0   // current text position (PDF coords)
    var lmx = 0.0; var lmy = 0.0   // line-start position
    val operands = mutable.ArrayBuffer.empty[Tok]

    def num(t: Tok): Double = t match { case TNum(v) => v; case _ => 0.0 }

    def emit(raw: String): Unit = {
      val decoded = if (winAnsi) winAnsiText(raw) else raw
      val text = Py.strip(decoded)
      val width = decoded.length * CharWidthFactor * fontSize
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
        if (operands.length >= 2) operands(operands.length - 2) match {
          case TName(f) => winAnsi = encs.get(f).contains("WinAnsi")
          case _ =>
        }
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
