package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class CcittG4Spec extends AnyFunSuite {

  private def raster(w: Int, h: Int)(f: (Int, Int) => Boolean): CcittG4.Image = {
    val r = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) if (f(x, y)) r(y * w + x) = 1
    CcittG4.Image(r, w, h)
  }

  test("all-white image encodes as one V0 per row + EOFB (hand-derived bits)") {
    // each all-white row codes as a single V0 against an all-white reference
    // (b1 = columns, a1 = columns): bit '1'. 4 rows -> "1111", then EOFB =
    // 000000000001 000000000001, zero-padded to bytes:
    // 1111_0000 0000_0001 0000_0000 0001_0000 = F0 01 00 10
    val enc = CcittG4.encode(raster(17, 4)((_, _) => false))
    assert(enc.toSeq == Seq(0xF0, 0x01, 0x00, 0x10).map(_.toByte))
  }

  test("all-white decodes back") {
    val img = raster(17, 4)((_, _) => false)
    val dec = CcittG4.decode(CcittG4.encode(img), 17, 4)
    assert(dec.exists(_.raster.sameElements(img.raster)))
  }

  test("single black row uses horizontal mode with make-up chains (wide row)") {
    // 3000 black pixels needs makeup 2560 + makeup 384 + terminating 56
    val img = raster(3000, 2)((_, y) => y == 0)
    val dec = CcittG4.decode(CcittG4.encode(img), 3000, 2)
    assert(dec.exists(_.raster.sameElements(img.raster)))
  }

  test("structured shapes round-trip exactly") {
    // rectangle, vertical bars, diagonal, checkerboard — exercise pass,
    // all vertical offsets, and horizontal coding
    val shapes: Seq[CcittG4.Image] = Seq(
      raster(64, 48)((x, y) => x >= 10 && x < 50 && y >= 8 && y < 40),
      raster(64, 48)((x, _) => (x / 4) % 2 == 0),
      raster(64, 64)((x, y) => math.abs(x - y) < 3),
      raster(32, 32)((x, y) => (x + y) % 2 == 0),
      raster(80, 20)((x, y) => (x * 31 + y * 17) % 7 < 2))
    for (img <- shapes) {
      val dec = CcittG4.decode(CcittG4.encode(img), img.w, img.h)
      assert(dec.exists(_.raster.sameElements(img.raster)), s"${img.w}x${img.h}")
    }
  }

  test("randomized rasters round-trip (deterministic rng, 60 cases)") {
    val rng = new scala.util.Random(421L)
    for (c <- 1 to 60) {
      val w = 1 + rng.nextInt(90)
      val h = 1 + rng.nextInt(24)
      val img = raster(w, h) { (x, y) =>
        // blocky noise (fax-like) with occasional salt
        ((x / (1 + rng.nextInt(1) + (c % 5))) + y * 3 + c) % 4 == 0 ||
          rng.nextInt(23) == 0
      }
      val dec = CcittG4.decode(CcittG4.encode(img), w, h)
      assert(dec.exists(_.raster.sameElements(img.raster)), s"case $c (${w}x$h)")
    }
  }

  test("malformed payloads decode to None, never throw") {
    val rng = new scala.util.Random(77L)
    for (_ <- 1 to 40) {
      val junk = new Array[Byte](1 + rng.nextInt(200))
      rng.nextBytes(junk)
      CcittG4.decode(junk, 1 + rng.nextInt(200), 1 + rng.nextInt(40)) // must not throw
    }
    // truncation of a valid stream (decoder runs out of bits mid-raster)
    val img = raster(64, 32)((x, y) => (x / 5 + y / 3) % 2 == 0)
    val enc = CcittG4.encode(img)
    for (cut <- Seq(0, 1, enc.length / 2))
      assert(CcittG4.decode(enc.take(cut), 64, 32).isEmpty, s"cut=$cut")
    // geometry lies must not throw (wrong column count may or may not decode)
    CcittG4.decode(enc, 63, 32)
    assert(CcittG4.decode(enc, 0, 32).isEmpty && CcittG4.decode(enc, 64, 0).isEmpty)
  }

  test("PDF with a valid G4 image routes as scanned; corrupt payload does not count as pixels") {
    val img = raster(96, 64)((x, y) => x >= 20 && x < 70 && (y / 6) % 2 == 0)
    val runs = Seq.empty[PdfLite.Run]
    val pdf = PdfLite.writeDoc(Seq(PdfLite.PageSpec(1700, 1200, runs)),
      scanned = true, ccittImage = Some(img))
    val p = PdfLite.parse(pdf)
    assert(p.hasImage, "valid G4 payload must count as pixels")
    // zero out the head of the G4 stream body: 0x00 bytes are not a valid
    // mode code (seven zeros = EOL territory mid-image), so decode MUST fail
    val bad = pdf.clone()
    val streamAt = new String(bad, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("/CCITTFaxDecode")
    val bodyAt = new String(bad, java.nio.charset.StandardCharsets.ISO_8859_1)
      .indexOf("stream\n", streamAt) + 7
    for (i <- 0 until 24) bad(bodyAt + i) = 0
    assert(!PdfLite.parse(bad).hasImage, "corrupt G4 payload must not count as pixels")
  }

  test("G4 image inside an encrypted PDF still validates after decryption") {
    val img = raster(48, 36)((x, y) => (x + y) % 5 == 0)
    val pdf = PdfLite.writeDoc(Seq(PdfLite.PageSpec(1700, 1200, Seq.empty)),
      scanned = true, ccittImage = Some(img), aes = true)
    assert(PdfLite.parse(pdf).hasImage)
  }
}
