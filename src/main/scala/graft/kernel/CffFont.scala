package graft.kernel

/** Minimal CFF / Type1C writer + reader — PDF realism tier 10 (VERDICT r04
  * "next round" #5): after TrueType, the compact font format is the most
  * common embedded font program real-world writers emit (`/FontFile3`,
  * `/Subtype /Type1C` — the reference ingests them via PyMuPDF,
  * `smart_extract.py:64-97`). A simple font with NO `/Encoding` and NO
  * `/ToUnicode` publishes its byte-code → text mapping only through the
  * font program: code → GID via the CFF Encoding, GID → SID via the
  * charset, SID → glyph name via the standard strings + String INDEX,
  * glyph name → Unicode via the AGL subset ([[Glyphs]]) — the exact mirror
  * of the [[TrueTypeFont]] cmap+post chain.
  *
  * Structures follow Adobe Tech Note #5176 (public spec): INDEX = count ·
  * offSize · offsets · data; DICT = operand bytes then 1-byte ops (charset
  * 15, Encoding 16, CharStrings 17, Private 18). The writer emits a
  * structurally honest font (real INDEXes, format-0 Encoding/charset, a
  * minimal Private DICT, Type-2 `endchar` charstrings); the reader handles
  * charset formats 0/1/2, Encoding formats 0/1 plus the Standard-Encoding
  * default, and is total — malformed bytes produce an empty map, never a
  * throw. Standard-string SIDs 0–95 (the ASCII block) resolve by name;
  * higher predefined SIDs (96–390, the accented/ligature tail) are treated
  * as unknown — the writer never emits them (non-ASCII names get custom
  * SIDs), and a real font using them loses only those glyphs. */
object CffFont {

  /** Adobe standard strings 0–95 (CFF spec Appendix A, the ASCII block). */
  private val StdStrings: Array[String] = Array(
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash",
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater", "question",
    "at", "A", "B", "C", "D", "E", "F", "G", "H", "I", "J", "K", "L", "M",
    "N", "O", "P", "Q", "R", "S", "T", "U", "V", "W", "X", "Y", "Z",
    "bracketleft", "backslash", "bracketright", "asciicircum", "underscore",
    "quoteleft", "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l",
    "m", "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "braceleft", "bar", "braceright", "asciitilde")

  private val StdSidByName: Map[String, Int] =
    StdStrings.zipWithIndex.toMap

  /** StandardEncoding code → glyph name for the ASCII block (CFF spec
    * Appendix B / PDF 32000-1 D.2) — the Encoding default. */
  private val StandardEncoding: Map[Int, String] =
    (0x20 to 0x7e).map { code =>
      // ASCII maps 1:1 onto SIDs 1..95 in standard-string order
      code -> StdStrings(code - 0x20 + 1)
    }.toMap

  // ---------- byte building ----------

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream(512)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def u24(v: Int): Unit = { out.write((v >>> 16) & 0xff); u16(v) }
    def u32(v: Int): Unit = { out.write((v >>> 24) & 0xff); u24(v) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def size: Int = out.size()
    def toBytes: Array[Byte] = out.toByteArray
  }

  /** INDEX with 1-byte offSize (all our payloads are tiny). */
  private def index(items: Seq[Array[Byte]]): Array[Byte] = {
    val b = new Buf
    b.u16(items.length)
    if (items.nonEmpty) {
      val total = items.map(_.length).sum
      val offSize = if (total + 1 <= 0xff) 1 else if (total + 1 <= 0xffff) 2 else 3
      b.u8(offSize)
      var off = 1
      def putOff(v: Int): Unit = offSize match {
        case 1 => b.u8(v)
        case 2 => b.u16(v)
        case _ => b.u24(v)
      }
      putOff(off)
      for (it <- items) { off += it.length; putOff(off) }
      items.foreach(b.bytes)
    }
    b.toBytes
  }

  /** 5-byte fixed integer operand (op 29), so DICT sizes don't depend on
    * operand magnitude and offsets can be planned in one pass. */
  private def dictInt(b: Buf, v: Int): Unit = { b.u8(29); b.u32(v) }

  // ---------- writer ----------

  /** Build a Type1C font whose Encoding maps each byte code to a glyph
    * named after its Unicode char ([[Glyphs.nameOf]]).
    * `codes` = (byte code, unicode char), codes distinct, 0 < code < 256. */
  def build(codes: Seq[(Int, Char)]): Array[Byte] = {
    val sorted = codes.sortBy(_._1)
    val names = sorted.map { case (_, ch) => Glyphs.nameOf(ch) }
    // SID per glyph: standard where possible, else a custom string
    val customs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val sids = names.map { nm =>
      StdSidByName.getOrElse(nm, customs.getOrElseUpdate(nm, 391 + customs.size))
    }
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

    val header = { val b = new Buf; b.u8(1); b.u8(0); b.u8(4); b.u8(1); b.toBytes }
    val nameIdx = index(Seq("GraftSynthCff".getBytes(latin1)))
    val stringIdx = index(customs.keys.toSeq.map(_.getBytes(latin1)))
    val gsubrIdx = index(Nil)
    // Top DICT: charset(15) Encoding(16) CharStrings(17) Private(18) with
    // 5-byte operands → 6+6+6+11 = 29 bytes, so the Top DICT INDEX is fixed
    // at 2+1+2+29 = 34 bytes and offsets close in one pass
    val topDictLen = 29
    val topDictIdxLen = 2 + 1 + 2 + topDictLen
    val preamble = header.length + nameIdx.length + topDictIdxLen +
      stringIdx.length + gsubrIdx.length

    val encoding = { // format 0
      val b = new Buf; b.u8(0); b.u8(sorted.length)
      sorted.foreach { case (code, _) => b.u8(code) }
      b.toBytes
    }
    val charset = { // format 0: SIDs for glyphs 1..n (.notdef implicit)
      val b = new Buf; b.u8(0)
      sids.foreach(b.u16)
      b.toBytes
    }
    val endchar = Array(0x0e.toByte)
    val charStrings = index(Seq.fill(sorted.length + 1)(endchar)) // +.notdef
    val privDict = { // defaultWidthX 0 (20), nominalWidthX 0 (21)
      val b = new Buf
      dictInt(b, 0); b.u8(20)
      dictInt(b, 0); b.u8(21)
      b.toBytes
    }

    val encodingOff = preamble
    val charsetOff = encodingOff + encoding.length
    val charStringsOff = charsetOff + charset.length
    val privateOff = charStringsOff + charStrings.length

    val topDict = {
      val b = new Buf
      dictInt(b, charsetOff); b.u8(15)
      dictInt(b, encodingOff); b.u8(16)
      dictInt(b, charStringsOff); b.u8(17)
      dictInt(b, privDict.length); dictInt(b, privateOff); b.u8(18)
      require(b.size == topDictLen, s"top dict ${b.size} != $topDictLen")
      b.toBytes
    }
    val topDictIdx = index(Seq(topDict))
    require(topDictIdx.length == topDictIdxLen)

    val out = new Buf
    out.bytes(header); out.bytes(nameIdx); out.bytes(topDictIdx)
    out.bytes(stringIdx); out.bytes(gsubrIdx)
    out.bytes(encoding); out.bytes(charset); out.bytes(charStrings)
    out.bytes(privDict)
    out.toBytes
  }

  // ---------- reader ----------

  private final class Rd(val b: Array[Byte]) {
    def u8(p: Int): Int = b(p) & 0xff
    def u16(p: Int): Int = (u8(p) << 8) | u8(p + 1)
    def num(p: Int, size: Int): Int = {
      var v = 0
      var k = 0
      while (k < size) { v = (v << 8) | u8(p + k); k += 1 }
      v
    }
  }

  /** INDEX at `pos` → (items, end position). */
  private def readIndex(r: Rd, pos: Int): (Vector[Array[Byte]], Int) = {
    val count = r.u16(pos)
    if (count == 0) return (Vector.empty, pos + 2)
    val offSize = r.u8(pos + 2)
    require(offSize >= 1 && offSize <= 4, "bad offSize")
    val offBase = pos + 3
    val dataBase = offBase + (count + 1) * offSize - 1
    val offs = (0 to count).map(i => r.num(offBase + i * offSize, offSize))
    val items = (0 until count).map { i =>
      java.util.Arrays.copyOfRange(r.b, dataBase + offs(i), dataBase + offs(i + 1))
    }.toVector
    (items, dataBase + offs(count))
  }

  /** Top DICT integer operands for ops charset(15)/Encoding(16)/
    * CharStrings(17). */
  private def readTopDict(dict: Array[Byte]): Map[Int, Int] = {
    val out = Map.newBuilder[Int, Int]
    var operands = List.empty[Int]
    var i = 0
    while (i < dict.length) {
      val b0 = dict(i) & 0xff
      if (b0 <= 21) { // operator
        val op = if (b0 == 12) { i += 1; 1200 + (dict(i) & 0xff) } else b0
        if (operands.nonEmpty && (op == 15 || op == 16 || op == 17))
          out += op -> operands.head
        operands = Nil
        i += 1
      } else if (b0 == 28) { operands = ((dict(i + 1) << 8 | (dict(i + 2) & 0xff)).toShort.toInt) :: operands; i += 3 }
      else if (b0 == 29) { operands = ((dict(i + 1) & 0xff) << 24 | (dict(i + 2) & 0xff) << 16 | (dict(i + 3) & 0xff) << 8 | (dict(i + 4) & 0xff)) :: operands; i += 5 }
      else if (b0 == 30) { // real number: nibbles until 0xf terminator
        i += 1
        var done = false
        while (i < dict.length && !done) {
          val v = dict(i) & 0xff
          if ((v & 0x0f) == 0x0f || (v >> 4) == 0x0f) done = true
          i += 1
        }
        operands = 0 :: operands
      }
      else if (b0 >= 32 && b0 <= 246) { operands = (b0 - 139) :: operands; i += 1 }
      else if (b0 >= 247 && b0 <= 250) { operands = ((b0 - 247) * 256 + (dict(i + 1) & 0xff) + 108) :: operands; i += 2 }
      else if (b0 >= 251 && b0 <= 254) { operands = (-(b0 - 251) * 256 - (dict(i + 1) & 0xff) - 108) :: operands; i += 2 }
      else i += 1
    }
    out.result()
  }

  /** code → Unicode char via Encoding → charset → strings → [[Glyphs]].
    * Total: anything malformed yields an empty map. */
  def codeMap(bytes: Array[Byte]): Map[Int, Char] = {
    try {
      val r = new Rd(bytes)
      if (bytes.length < 4 || r.u8(0) != 1) return Map.empty
      val hdrSize = r.u8(2)
      val (_, afterName) = readIndex(r, hdrSize)
      val (topDicts, afterTop) = readIndex(r, afterName)
      if (topDicts.isEmpty) return Map.empty
      val top = readTopDict(topDicts.head)
      val (strings, _) = readIndex(r, afterTop)
      val csOff = top.getOrElse(17, -1)
      if (csOff <= 0 || csOff >= bytes.length) return Map.empty
      val (charStrings, _) = readIndex(r, csOff)
      val nGlyphs = charStrings.length
      if (nGlyphs <= 1) return Map.empty

      def sidName(sid: Int): Option[String] =
        if (sid < StdStrings.length) Some(StdStrings(sid))
        else if (sid >= 391 && sid - 391 < strings.length)
          Some(new String(strings(sid - 391), java.nio.charset.StandardCharsets.ISO_8859_1))
        else None

      // charset → SID per glyph (glyph 0 = .notdef, SID 0)
      val charsetOff = top.getOrElse(15, 0)
      val sids = new Array[Int](nGlyphs)
      if (charsetOff > 2 && charsetOff < bytes.length) {
        r.u8(charsetOff) match {
          case 0 =>
            for (g <- 1 until nGlyphs)
              sids(g) = r.u16(charsetOff + 1 + (g - 1) * 2)
          case f @ (1 | 2) =>
            var g = 1
            var p = charsetOff + 1
            val step = if (f == 1) 3 else 4
            while (g < nGlyphs && p + step <= bytes.length) {
              val first = r.u16(p)
              val nLeft = if (f == 1) r.u8(p + 2) else r.u16(p + 2)
              var k = 0
              while (k <= nLeft && g < nGlyphs) {
                sids(g) = first + k; g += 1; k += 1
              }
              p += step
            }
          case _ => // ISOAdobe default: identity SIDs
            for (g <- 1 until nGlyphs) sids(g) = g
        }
      } else for (g <- 1 until nGlyphs) sids(g) = g // charset 0 = ISOAdobe

      val out = Map.newBuilder[Int, Char]
      val encOff = top.getOrElse(16, 0)
      if (encOff > 1 && encOff < bytes.length) {
        (r.u8(encOff) & 0x7f) match {
          case 0 =>
            val n = r.u8(encOff + 1)
            for (i <- 0 until math.min(n, nGlyphs - 1)) {
              val code = r.u8(encOff + 2 + i)
              sidName(sids(i + 1)).flatMap(Glyphs.charOf)
                .foreach(ch => out += code -> ch)
            }
          case 1 =>
            val nRanges = r.u8(encOff + 1)
            var gid = 1
            for (k <- 0 until nRanges) {
              val first = r.u8(encOff + 2 + k * 2)
              val nLeft = r.u8(encOff + 3 + k * 2)
              for (d <- 0 to nLeft if gid < nGlyphs) {
                sidName(sids(gid)).flatMap(Glyphs.charOf)
                  .foreach(ch => out += (first + d) -> ch)
                gid += 1
              }
            }
          case _ =>
        }
      } else {
        // Standard-Encoding default: code → name → the glyph carrying it
        val byName = (1 until nGlyphs).flatMap(g =>
          sidName(sids(g)).map(_ -> g)).toMap
        for ((code, nm) <- StandardEncoding if byName.contains(nm))
          Glyphs.charOf(nm).foreach(ch => out += code -> ch)
      }
      out.result()
    } catch { case _: Exception => Map.empty }
  }
}
