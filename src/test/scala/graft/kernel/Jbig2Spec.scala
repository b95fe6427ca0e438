package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class Jbig2Spec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: (Int, Int) => Boolean): Jbig2.Image = {
    val r = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) if (f(x, y)) r(y * w + x) = 1
    Jbig2.Image(r, w, h)
  }

  private def roundTrip(img: Jbig2.Image): Unit = {
    val dec = Jbig2.decode(Jbig2.encode(img))
    assert(dec.isDefined, s"${img.w}x${img.h} failed to decode")
    assert(dec.get.w == img.w && dec.get.h == img.h)
    assert(dec.get.raster.sameElements(img.raster),
      s"${img.w}x${img.h} raster mismatch")
  }

  test("structured shapes round-trip exactly") {
    roundTrip(raster(64, 48)((_, _) => false))                       // all white
    roundTrip(raster(64, 48)((_, _) => true))                        // all black
    roundTrip(raster(64, 48)((x, y) => x >= 10 && x < 50 && y >= 8 && y < 40))
    roundTrip(raster(64, 48)((x, _) => (x / 4) % 2 == 0))            // bars
    roundTrip(raster(64, 48)((x, y) => ((x + y) & 1) == 0))          // checker
    roundTrip(raster(97, 31)((x, y) => x == y))                      // diagonal
  }

  test("degenerate geometries round-trip") {
    roundTrip(raster(1, 1)((_, _) => true))
    roundTrip(raster(1, 64)((_, y) => y % 3 == 0))
    roundTrip(raster(64, 1)((x, _) => x % 5 == 0))
    roundTrip(raster(3, 200)((x, y) => (x * y) % 7 < 2))
  }

  test("dense pseudo-random rasters round-trip (MQ carry/stuffing paths)") {
    // deterministic noise at several densities stresses the arithmetic
    // coder's renormalization, byte-stuffing and carry branches
    for ((seed, density) <- Seq((1L, 2), (2L, 5), (3L, 8), (4L, 1))) {
      val rng = new java.util.Random(seed)
      roundTrip(raster(128, 96)((_, _) => rng.nextInt(10) < density))
    }
  }

  test("text-like glyph raster round-trips (the realistic payload shape)") {
    // vertical strokes with serifs — the context-model sweet spot a scanned
    // page actually contains
    roundTrip(raster(200, 64) { (x, y) =>
      val col = x % 20
      (col < 3 && y > 8 && y < 56) || (y >= 52 && y < 56 && col < 10)
    })
  }

  test("malformed payloads return None, never throw") {
    assert(Jbig2.decode(Array.emptyByteArray).isEmpty)
    assert(Jbig2.decode(Array.fill(7)(0x41.toByte)).isEmpty)
    val good = Jbig2.encode(raster(40, 30)((x, y) => (x + y) % 3 == 0))
    // truncate mid-body: framing declares more data than present
    assert(Jbig2.decode(good.take(good.length / 3)).isEmpty)
    // flip the generic-region flags byte to MMR=1 (unsupported profile)
    // page-info segment = 11-byte header + 19 data; region header = 11
    // bytes; region data: 17 info + flags at offset 17
    val mmr = good.clone()
    val flagsAt = (11 + 19) + 11 + 17
    mmr(flagsAt) = (mmr(flagsAt) | 0x01).toByte
    assert(Jbig2.decode(mmr).isEmpty)
    // absurd declared dimensions
    val huge = good.clone()
    huge(11 + 19 + 11) = 0x7F.toByte // region width high byte
    assert(Jbig2.decode(huge).isEmpty)
  }

  test("decode skips a leading unknown segment to find the region") {
    val img = raster(33, 21)((x, y) => x % 4 == 0 || y % 6 == 0)
    val stream = Jbig2.encode(img)
    // prepend an end-of-stripe segment (type 50) with 4 data bytes
    val b = new java.io.ByteArrayOutputStream()
    b.write(Array[Byte](0, 0, 0, 9)) // segment number 9
    b.write(50)                      // flags: type 50, 1-byte page assoc
    b.write(0)                       // no referred segments
    b.write(1)                       // page 1
    b.write(Array[Byte](0, 0, 0, 4)) // data length 4
    b.write(Array[Byte](0, 0, 0, 20))
    b.write(stream)
    val dec = Jbig2.decode(b.toByteArray)
    assert(dec.exists(_.raster.sameElements(img.raster)))
  }

  test("PDF with a valid JBIG2 image routes as scanned; corrupt payload does not count as pixels") {
    val img = raster(96, 64)((x, y) => x >= 20 && x < 70 && (y / 6) % 2 == 0)
    val pdf = PdfLite.writeDoc(Seq(PdfLite.PageSpec(1700, 1200, Seq.empty)),
      scanned = true, jbig2Image = Some(img))
    assert(PdfLite.parse(pdf).hasImage, "valid JBIG2 payload must count as pixels")
    // corrupt the segment framing: a bogus first segment header makes the
    // stream undecodable, so the page must not promote on the bare marker
    val bad = pdf.clone()
    val bodyAt = new String(bad, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("stream\n", new String(bad, java.nio.charset.StandardCharsets.ISO_8859_1)
        .indexOf("/JBIG2Decode")) + 7
    for (i <- 0 until 12) bad(bodyAt + i) = 0x7F
    assert(!PdfLite.parse(bad).hasImage, "corrupt JBIG2 payload must not count as pixels")
  }

  test("JBIG2 image inside an encrypted PDF still validates after decryption") {
    val img = raster(48, 36)((x, y) => (x + y) % 5 == 0)
    val pdf = PdfLite.writeDoc(Seq(PdfLite.PageSpec(1700, 1200, Seq.empty)),
      scanned = true, jbig2Image = Some(img), aes256 = true)
    assert(PdfLite.parse(pdf).hasImage)
  }
}
