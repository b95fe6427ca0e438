package graft.kernel

/** Minimal TrueType (sfnt) writer + reader for the embedded-font-program
  * extraction path: a symbolic `/Subtype /TrueType` font with NO `/Encoding`
  * and NO `/ToUnicode` publishes its byte-code → text mapping ONLY through
  * the embedded `/FontFile2` program — byte code → glyph id via the `cmap`
  * table ((3,0) symbolic at 0xF000+code, the Microsoft convention), glyph
  * id → glyph name via the `post` table (format 2.0), glyph name → Unicode
  * via the AGL subset + `uniXXXX` ([[Glyphs]]). This is the fallback chain
  * real readers (Poppler, PyMuPDF — the reference's ingest path,
  * `smart_extract.py:64-97`) walk for subset fonts that ship no CMap.
  *
  * The writer emits a structurally honest sfnt: table directory with real
  * checksums, `head` (magic 0x5F0F3CF5), `maxp`, `cmap` format 4 with
  * proper segment arrays, `post` 2.0 with pascal-string names. The reader
  * is total: malformed bytes produce an empty map, never a throw.
  */
object TrueTypeFont {

  // ---------- byte building ----------

  private final class Buf {
    val out = new java.io.ByteArrayOutputStream(512)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def toBytes: Array[Byte] = out.toByteArray
  }

  private def checksum(b: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < b.length) {
      var w = 0L
      var k = 0
      while (k < 4) {
        w = (w << 8) | (if (i + k < b.length) b(i + k) & 0xff else 0)
        k += 1
      }
      sum = (sum + w) & 0xffffffffL
      i += 4
    }
    sum
  }

  // ---------- writer ----------

  /** Build a font whose `cmap` (3,0) maps 0xF000|code → GID and whose
    * `post` names each GID after its Unicode char ([[Glyphs.nameOf]]).
    * `codes` = (byte code, unicode char), codes distinct, 0 < code < 256. */
  def build(codes: Seq[(Int, Char)]): Array[Byte] = {
    val sorted = codes.sortBy(_._1)
    val n = sorted.length

    // cmap format 4 over contiguous 0xF000|code runs (GIDs follow code
    // order, so each code run is also a GID run -> idRangeOffset 0)
    val keys = sorted.map { case (c, _) => 0xf000 | c }
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (start, end, gidStart)
    var i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && keys(j + 1) == keys(j) + 1) j += 1
      runs += ((keys(i), keys(j), i + 1)) // GID 0 = .notdef
      i = j + 1
    }
    val segCount = runs.length + 1 // + the required 0xFFFF terminator
    val sub = new Buf
    sub.u16(4) // format
    sub.u16(16 + segCount * 8) // length (no glyphIdArray)
    sub.u16(0) // language
    sub.u16(segCount * 2)
    val sr = { var p = 1; while (p * 2 <= segCount) p *= 2; p * 2 }
    sub.u16(sr)
    sub.u16((math.log(sr / 2.0) / math.log(2)).toInt)
    sub.u16(segCount * 2 - sr)
    runs.foreach { case (_, e, _) => sub.u16(e) }; sub.u16(0xffff)
    sub.u16(0) // reservedPad
    runs.foreach { case (s, _, _) => sub.u16(s) }; sub.u16(0xffff)
    runs.foreach { case (s, _, g) => sub.u16((g - s) & 0xffff) }; sub.u16(1)
    runs.foreach(_ => sub.u16(0)); sub.u16(0)
    val cmap = new Buf
    cmap.u16(0); cmap.u16(1) // version, one encoding record
    cmap.u16(3); cmap.u16(0); cmap.u32(12) // (3,0) symbolic at offset 12
    cmap.bytes(sub.toBytes)

    // post format 2.0: GID 0 -> standard .notdef, GID k -> custom name k-1
    val post = new Buf
    post.u32(0x00020000L); post.u32(0) // version, italicAngle
    post.u16(0); post.u16(0) // underline pos/thickness
    post.u32(0) // isFixedPitch
    post.u32(0); post.u32(0); post.u32(0); post.u32(0) // memory hints
    post.u16(n + 1)
    post.u16(0) // .notdef
    (1 to n).foreach(k => post.u16(258 + (k - 1)))
    sorted.foreach { case (_, ch) =>
      val name = Glyphs.nameOf(ch).getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      post.u8(name.length); post.bytes(name)
    }

    val head = new Buf
    head.u32(0x00010000L); head.u32(0) // version, fontRevision
    head.u32(0) // checkSumAdjustment (left 0 — readers here don't verify)
    head.u32(0x5f0f3cf5L) // magicNumber
    head.u16(0); head.u16(1000) // flags, unitsPerEm
    (0 until 16).foreach(_ => head.u8(0)) // created + modified
    head.u16(0); head.u16(0); head.u16(1000); head.u16(1000) // bbox
    head.u16(0); head.u16(8) // macStyle, lowestRecPPEM
    head.u16(2); head.u16(0); head.u16(0) // direction, locFormat, glyphFormat

    val maxp = new Buf
    maxp.u32(0x00005000L); maxp.u16(n + 1)

    val tables = Seq( // ascending tag order, per spec
      "cmap" -> cmap.toBytes, "head" -> head.toBytes,
      "maxp" -> maxp.toBytes, "post" -> post.toBytes)
    val f = new Buf
    f.u32(0x00010000L)
    f.u16(tables.length)
    val esr = { var p = 1; while (p * 2 <= tables.length) p *= 2; p * 16 }
    f.u16(esr); f.u16((math.log(esr / 16.0) / math.log(2)).toInt)
    f.u16(tables.length * 16 - esr)
    var off = 12 + tables.length * 16
    tables.foreach { case (tag, data) =>
      tag.foreach(c => f.u8(c))
      f.u32(checksum(data)); f.u32(off); f.u32(data.length)
      off += (data.length + 3) & ~3
    }
    tables.foreach { case (_, data) =>
      f.bytes(data)
      (data.length until ((data.length + 3) & ~3)).foreach(_ => f.u8(0))
    }
    f.toBytes
  }

  // ---------- reader ----------

  /** Byte-code → Unicode map recovered from an embedded TrueType program:
    * `cmap` (prefers (3,0) symbolic, falls back to (3,1)/(0,x)) composed
    * with `post` 2.0 glyph names through [[Glyphs.charOf]]. Codes are tried
    * both as 0xF000|code and bare. Empty map on any malformed structure. */
  def codeMap(ttf: Array[Byte]): Map[Int, Char] = try {
    def u16(at: Int): Int =
      if (at < 0 || at + 2 > ttf.length) throw new IndexOutOfBoundsException
      else ((ttf(at) & 0xff) << 8) | (ttf(at + 1) & 0xff)
    def u32(at: Int): Long =
      if (at < 0 || at + 4 > ttf.length) throw new IndexOutOfBoundsException
      else ((u16(at).toLong << 16) | u16(at + 2)) & 0xffffffffL

    val numTables = u16(4)
    if (numTables <= 0 || numTables > 64) return Map.empty
    var cmapAt = -1
    var postAt = -1
    for (t <- 0 until numTables) {
      val e = 12 + t * 16
      val tag = new String(ttf, e, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val off = u32(e + 8).toInt
      if (tag == "cmap") cmapAt = off
      if (tag == "post") postAt = off
    }
    if (cmapAt < 0 || postAt < 0) return Map.empty

    // pick a cmap subtable: (3,0) > (3,1) > anything
    val nEnc = u16(cmapAt + 2)
    var subAt = -1
    var bestRank = -1
    for (k <- 0 until math.min(nEnc, 32)) {
      val r = cmapAt + 4 + k * 8
      val plat = u16(r); val enc = u16(r + 2)
      val rank =
        if (plat == 3 && enc == 0) 3
        else if (plat == 3 && enc == 1) 2
        else 1
      if (rank > bestRank) { bestRank = rank; subAt = cmapAt + u32(r + 4).toInt }
    }
    if (subAt < 0 || u16(subAt) != 4) return Map.empty
    val segX2 = u16(subAt + 6)
    val segs = segX2 / 2
    if (segs <= 0 || segs > 8192) return Map.empty
    val endAt = subAt + 14
    val startAt = endAt + segX2 + 2
    val deltaAt = startAt + segX2
    val rangeAt = deltaAt + segX2
    def gidOf(c: Int): Int = {
      var k = 0
      while (k < segs && u16(endAt + 2 * k) < c) k += 1
      if (k >= segs) return 0
      val start = u16(startAt + 2 * k)
      if (c < start) return 0
      val ro = u16(rangeAt + 2 * k)
      if (ro == 0) (c + u16(deltaAt + 2 * k)) & 0xffff
      else {
        val g = u16(rangeAt + 2 * k + ro + 2 * (c - start))
        if (g == 0) 0 else (g + u16(deltaAt + 2 * k)) & 0xffff
      }
    }

    // post 2.0 names
    if (u32(postAt) != 0x00020000L) return Map.empty
    val nGlyphs = u16(postAt + 32)
    if (nGlyphs <= 0 || nGlyphs > 65535) return Map.empty
    val idxAt = postAt + 34
    var nameAt = idxAt + 2 * nGlyphs
    val custom = scala.collection.mutable.ArrayBuffer[String]()
    while (nameAt < ttf.length && custom.length < nGlyphs) {
      val len = ttf(nameAt) & 0xff
      if (nameAt + 1 + len > ttf.length) nameAt = ttf.length
      else {
        custom += new String(ttf, nameAt + 1, len,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        nameAt += 1 + len
      }
    }
    def nameOf(gid: Int): Option[String] = {
      if (gid >= nGlyphs) return None
      val idx = u16(idxAt + 2 * gid)
      if (idx < 258) None // standard Mac names not carried (subset scope)
      else custom.lift(idx - 258)
    }

    val out = Map.newBuilder[Int, Char]
    for (code <- 1 until 256) {
      var g = gidOf(0xf000 | code)
      if (g == 0) g = gidOf(code)
      if (g != 0)
        nameOf(g).flatMap(Glyphs.charOf).foreach(ch => out += code -> ch)
    }
    out.result()
  } catch { case scala.util.control.NonFatal(_) => Map.empty }
}
