package graft.kernel

/** JBIG2 (ITU-T T.88) generic-region codec for `/JBIG2Decode` image
  * XObjects — the last bilevel compression a real crawl's scanned PDFs
  * carry after G4 (the reference ingests such files through PyMuPDF's
  * rasterizer, `smart_extract.py:64-97`; here, as with `/DCTDecode` and
  * `/CCITTFaxDecode`, the router's image sniff must DECODE the payload
  * before a text-free page may promote to the high-confidence scanned
  * route).
  *
  * Scope: the embedded-in-PDF segment organization (T.88 Annex H / PDF 32000
  * §7.4.7) with a page-information segment and one immediate lossless
  * generic region segment, arithmetic-coded (MMR=0) with GBTEMPLATE=0 at the
  * nominal adaptive-pixel positions and TPGDON off — the shape the common
  * encoders emit for full-page masks. The MQ arithmetic coder implements
  * T.88 Annex E exactly (state table E.1, software-conventions decoder,
  * byte-stuffing encoder with FLUSH), shared by both directions.
  *
  * Raster convention matches [[CcittG4]]: 1 byte per pixel, 0 = white,
  * 1 = black (JBIG2 codes 1 = black natively).
  *
  * Decode is total: any malformed payload (bad segment framing, non-generic
  * region, MMR or unsupported template, absurd dimensions) returns None,
  * never throws — a corrupt stream must not kill an executor, it must route
  * the document into the failure taxonomy.
  */
object Jbig2 {

  final case class Image(raster: Array[Byte], w: Int, h: Int)

  // ---------- MQ coder state table (T.88 Table E.1) ----------
  // columns: Qe, NMPS, NLPS, SWITCH
  private val QeTab: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // ---------- MQ decoder (T.88 E.3, software conventions) ----------

  private final class MqDecoder(data: Array[Byte], from: Int, until: Int) {
    private var bp = from
    private var c = 0L
    private var ct = 0
    private var a = 0L
    // INITDEC
    c = (byteAt(bp).toLong << 16)
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000L

    private def byteAt(i: Int): Int = if (i < until) data(i) & 0xFF else 0xFF

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00L; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    /** DECODE one bit under context state (i, mps); returns (bit, i', mps'). */
    def decode(i: Int, mps: Int): (Int, Int, Int) = {
      val qe = QeTab(i).toLong
      a -= qe
      var d = 0
      var ni = i
      var nmps = mps
      if (((c >>> 16) & 0xFFFFL) < qe) {
        // LPS exchange path
        if (a < qe) { d = mps; ni = Nmps(i) }
        else {
          d = 1 - mps
          if (Switch(i) == 1) nmps = 1 - mps
          ni = Nlps(i)
        }
        a = qe
        renorm()
      } else {
        c -= qe << 16
        if ((a & 0x8000L) == 0) {
          // MPS exchange path
          if (a < qe) {
            d = 1 - mps
            if (Switch(i) == 1) nmps = 1 - mps
            ni = Nlps(i)
          } else { d = mps; ni = Nmps(i) }
          renorm()
        } else d = mps
      }
      (d, ni, nmps)
    }

    private def renorm(): Unit = {
      do {
        if (ct == 0) byteIn()
        a <<= 1; c <<= 1; ct -= 1
        c &= 0xFFFFFFFFL
      } while ((a & 0x8000L) == 0)
    }
  }

  // ---------- MQ encoder (T.88 E.2) ----------

  private final class MqEncoder {
    private val out = new java.io.ByteArrayOutputStream(256)
    private var a = 0x8000L
    private var c = 0L
    private var ct = 12
    private var b = -1 // the byte pending at BP; -1 = none yet (BP = BPST-1)

    /** ENCODE one bit under context state (i, mps); returns (i', mps'). */
    def encode(d: Int, i: Int, mps: Int): (Int, Int) = {
      val qe = QeTab(i).toLong
      if (d == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000L) == 0) {
          if (a < qe) a = qe else c += qe
          val ni = Nmps(i)
          renorm()
          (ni, mps)
        } else { c += qe; (i, mps) }
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        val nmps = if (Switch(i) == 1) 1 - mps else mps
        val ni = Nlps(i)
        renorm()
        (ni, nmps)
      }
    }

    private def renorm(): Unit = {
      do {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      } while ((a & 0x8000L) == 0)
    }

    private def byteOut(): Unit = {
      if (b == 0xFF) {
        emit(); b = ((c >>> 20) & 0xFF).toInt; c &= 0xFFFFFL; ct = 7
      } else if (c < 0x8000000L) {
        emit(); b = ((c >>> 19) & 0xFF).toInt; c &= 0x7FFFFL; ct = 8
      } else {
        b += 1
        if (b == 0xFF) {
          c &= 0x7FFFFFFL
          emit(); b = ((c >>> 20) & 0xFF).toInt; c &= 0xFFFFFL; ct = 7
        } else {
          emit(); b = ((c >>> 19) & 0xFF).toInt; c &= 0x7FFFFL; ct = 8
        }
      }
    }

    private def emit(): Unit = if (b >= 0) out.write(b)

    def flush(): Array[Byte] = {
      // SETBITS
      val tempC = (c + a - 1) & 0xFFFF0000L
      c = if (tempC < c) tempC + 0x8000L else tempC
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      emit()
      // trailing 0xFF bytes are implicit per E.2.8; drop the marker bytes
      val raw = out.toByteArray
      var end = raw.length
      while (end > 0 && raw(end - 1) == 0xFF.toByte) end -= 1
      java.util.Arrays.copyOf(raw, end)
    }
  }

  // ---------- generic region, GBTEMPLATE 0, nominal AT, TPGDON off ----------
  //
  // Context (16 bits) concatenates, MSB first: row y-2 at x-2..x+2 (AT4 at
  // -2 and AT3 at +2 sit at their nominal positions, making the row
  // contiguous), row y-1 at x-3..x+3 (AT2 at -3, AT1 at +3), row y at
  // x-4..x-1. Out-of-bounds pixels read 0 (T.88 6.2.5.2).

  private def context(raster: Array[Byte], w: Int, h: Int, x: Int, y: Int): Int = {
    @inline def px(xx: Int, yy: Int): Int =
      if (xx < 0 || xx >= w || yy < 0) 0 else raster(yy * w + xx)
    var ctx = 0
    var dx = -2
    while (dx <= 2) { ctx = (ctx << 1) | px(x + dx, y - 2); dx += 1 }
    dx = -3
    while (dx <= 3) { ctx = (ctx << 1) | px(x + dx, y - 1); dx += 1 }
    dx = -4
    while (dx <= -1) { ctx = (ctx << 1) | px(x + dx, y); dx += 1 }
    ctx
  }

  /** Decode an arithmetic generic region body into a raster. None when the
    * dimensions are absurd (caller validates framing). */
  private def decodeGeneric(data: Array[Byte], from: Int, until: Int,
                            w: Int, h: Int): Option[Image] = {
    if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16) ||
        w.toLong * h > (64L << 20)) return None
    val raster = new Array[Byte](w * h)
    val dec = new MqDecoder(data, from, until)
    val stI = new Array[Byte](1 << 16)
    val stMps = new Array[Byte](1 << 16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val ctx = context(raster, w, h, x, y)
        val (bit, ni, nmps) = dec.decode(stI(ctx), stMps(ctx))
        stI(ctx) = ni.toByte
        stMps(ctx) = nmps.toByte
        raster(y * w + x) = bit.toByte
        x += 1
      }
      y += 1
    }
    Some(Image(raster, w, h))
  }

  /** Encode a raster as an arithmetic generic region body. */
  private def encodeGeneric(img: Image): Array[Byte] = {
    val enc = new MqEncoder
    val stI = new Array[Byte](1 << 16)
    val stMps = new Array[Byte](1 << 16)
    var y = 0
    while (y < img.h) {
      var x = 0
      while (x < img.w) {
        val ctx = context(img.raster, img.w, img.h, x, y)
        val (ni, nmps) = enc.encode(img.raster(y * img.w + x), stI(ctx), stMps(ctx))
        stI(ctx) = ni.toByte
        stMps(ctx) = nmps.toByte
        x += 1
      }
      y += 1
    }
    enc.flush()
  }

  // ---------- embedded segment framing (T.88 §7.2, PDF organization) ----------

  private def u32(b: java.io.ByteArrayOutputStream, v: Long): Unit = {
    b.write(((v >>> 24) & 0xFF).toInt); b.write(((v >>> 16) & 0xFF).toInt)
    b.write(((v >>> 8) & 0xFF).toInt); b.write((v & 0xFF).toInt)
  }

  /** One segment header: number, type, zero referred segments, page 1,
    * explicit data length. */
  private def segmentHeader(b: java.io.ByteArrayOutputStream, num: Int,
                            segType: Int, dataLen: Int): Unit = {
    u32(b, num.toLong)
    b.write(segType & 0x3F) // flags: page-assoc 1 byte, no deferred
    b.write(0)              // referred-to count 0, retention 0
    b.write(1)              // page association
    u32(b, dataLen.toLong)
  }

  /** Encode a raster as the embedded-PDF JBIG2 stream: page info segment +
    * one immediate lossless generic region (arith, template 0, nominal AT). */
  def encode(img: Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    // page information (type 48): w, h, xres, yres, flags, striping
    val page = new java.io.ByteArrayOutputStream(19)
    u32(page, img.w.toLong); u32(page, img.h.toLong)
    u32(page, 0L); u32(page, 0L)
    page.write(0x01) // page is eventually lossless
    page.write(0); page.write(0) // no striping
    segmentHeader(out, 0, 48, page.size())
    page.writeTo(out)
    // immediate lossless generic region (type 39)
    val body = encodeGeneric(img)
    val reg = new java.io.ByteArrayOutputStream(64 + body.length)
    u32(reg, img.w.toLong); u32(reg, img.h.toLong) // region w, h
    u32(reg, 0L); u32(reg, 0L)                     // region x, y
    reg.write(0)                                   // comb operator OR
    reg.write(0)                                   // flags: MMR=0, GB0, no TPGDON
    // AT pixels, nominal for template 0: (3,-1) (-3,-1) (2,-2) (-2,-2)
    reg.write(3); reg.write(0xFF); reg.write(0xFD); reg.write(0xFF)
    reg.write(2); reg.write(0xFE); reg.write(0xFE); reg.write(0xFE)
    reg.write(body, 0, body.length)
    segmentHeader(out, 1, 39, reg.size())
    reg.writeTo(out)
    out.toByteArray
  }

  // ---------- embedded-stream decode ----------

  private def rdU32(d: Array[Byte], at: Int): Long =
    if (at + 4 > d.length) -1L
    else ((d(at) & 0xFFL) << 24) | ((d(at + 1) & 0xFFL) << 16) |
         ((d(at + 2) & 0xFFL) << 8) | (d(at + 3) & 0xFFL)

  /** Walk the embedded segment stream and decode the first generic region
    * (immediate or intermediate). None on any framing or coding violation. */
  def decode(data: Array[Byte]): Option[Image] = {
    var at = 0
    var guard = 0
    while (at + 11 <= data.length && guard < 64) {
      guard += 1
      // segment header
      val flags = data(at + 4) & 0xFF
      val segType = flags & 0x3F
      val pageAssoc4 = (flags & 0x40) != 0
      val rts = data(at + 5) & 0xFF
      val refCount = rts >>> 5
      if (refCount == 7) return None // long-form referred lists: out of scope
      // referred segment numbers: 1/2/4 bytes each by this segment's number
      val segNum = rdU32(data, at)
      if (segNum < 0) return None
      val refSize = if (segNum <= 256) 1 else if (segNum <= 65536) 2 else 4
      var p = at + 6 + refCount * refSize
      p += (if (pageAssoc4) 4 else 1)
      val dataLen = rdU32(data, p)
      p += 4
      if (dataLen < 0 || p + dataLen > data.length) return None
      if (segType == 36 || segType == 38 || segType == 39) {
        // generic region: region segment info (17 bytes) + flags + AT + body
        val w = rdU32(data, p)
        val h = rdU32(data, p + 4)
        val gFlags = if (p + 17 < data.length) data(p + 17) & 0xFF else -1
        if (w <= 0 || h <= 0 || gFlags < 0) return None
        if ((gFlags & 0x01) != 0) return None // MMR: not this profile
        if (((gFlags >>> 1) & 0x03) != 0) return None // template != 0
        if ((gFlags & 0x08) != 0) return None // TPGDON: not this profile
        val bodyAt = p + 18 + 8 // after 4 AT pairs
        if (bodyAt > p + dataLen) return None
        return decodeGeneric(data, bodyAt.toInt, (p + dataLen).toInt,
          w.toInt, h.toInt)
      }
      at = (p + dataLen).toInt
    }
    None
  }
}
