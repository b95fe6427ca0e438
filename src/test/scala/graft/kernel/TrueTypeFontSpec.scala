package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class TrueTypeFontSpec extends AnyFunSuite {

  test("sfnt build + codeMap round-trips non-contiguous codes and non-ASCII chars") {
    val codes = Seq(0x21 -> 'A', 0x22 -> 'b', 0x30 -> 'z', 0x31 -> ' ',
      0x77 -> 'é', 0xfe -> '9')
    val ttf = TrueTypeFont.build(codes)
    val m = TrueTypeFont.codeMap(ttf)
    assert(m == codes.toMap, s"got $m")
  }

  test("codeMap is total on junk") {
    val rng = new scala.util.Random(5L)
    for (_ <- 1 to 30) {
      val junk = new Array[Byte](rng.nextInt(300))
      rng.nextBytes(junk)
      assert(TrueTypeFont.codeMap(junk).isEmpty || true) // must not throw
    }
    assert(TrueTypeFont.codeMap(Array.emptyByteArray).isEmpty)
  }

  private def onePage(text: String) =
    Seq(PdfLite.PageSpec(1700, 1200, Seq(PdfLite.Run(100, 100, 12, text))))

  test("text recoverable ONLY through the embedded /FontFile2 program") {
    val msg = "Quarterly invoice totals: 1482 units at dock 7"
    val pdf = PdfLite.writeDoc(onePage(msg), fontFile2 = true)
    val raw = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    // the content stream must NOT contain the plaintext (codes are scrambled)
    assert(!raw.contains("Quarterly"), "content bytes leaked plaintext")
    assert(!raw.contains("/Encoding") && !raw.contains("/ToUnicode"))
    val p = PdfLite.parse(pdf)
    assert(p.items.map(_.text).mkString(" ").contains("Quarterly invoice totals:"),
      s"items=${p.items.map(_.text)}")
  }

  test("FontFile2 decode survives AES encryption of the font stream") {
    val msg = "cargo manifest line nine"
    val pdf = PdfLite.writeDoc(onePage(msg), fontFile2 = true, aes = true)
    val p = PdfLite.parse(pdf)
    assert(p.items.map(_.text).mkString(" ").contains("cargo manifest"),
      s"items=${p.items.map(_.text)}")
  }

  test("a corrupt font program degrades to raw bytes without throwing") {
    val pdf = PdfLite.writeDoc(onePage("salvage path check"), fontFile2 = true)
    val raw = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    val at = raw.indexOf("/Length1")
    val body = raw.indexOf("stream\n", at) + 7
    val bad = pdf.clone()
    for (i <- 0 until 40) bad(body + i) = (i * 7).toByte
    val p = PdfLite.parse(bad) // must not throw; text is garbage, that's fine
    assert(!p.items.map(_.text).mkString(" ").contains("salvage"))
  }
}
