package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Parser coverage for the hardened PDF-lite dialect: multi-page /Kids trees,
  * FlateDecode streams, TJ kerned arrays, hex strings, MediaBox inheritance —
  * the features a real-web PDF corpus exercises beyond the round-1 dialect
  * (`smart_extract.py:64-97` ingests arbitrary PDFs; these close the gap). */
class PdfLiteSpec extends AnyFunSuite {

  private def runsOf(page: Int, base: Int): Vector[PdfLite.Run] = Vector(
    PdfLite.Run(100, base, 12, s"alpha p$page"),
    PdfLite.Run(300, base, 12, s"beta$page"),
    PdfLite.Run(100, base + 40, 14, s"gamma line two p$page"))

  private def doc3(compress: Boolean, tjEvery: Int = 0, hexEvery: Int = 0) =
    PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      compress = compress, tjEvery = tjEvery, hexEvery = hexEvery)

  test("multi-page /Kids tree: items carry 1-based page numbers, nPages counted") {
    val parsed = PdfLite.parse(doc3(compress = false))
    assert(parsed.nPages == 3)
    assert(parsed.pageW == 800 && parsed.pageH == 1000)
    val byPage = parsed.items.groupBy(_.page)
    assert(byPage.keySet == Set(1, 2, 3))
    for (p <- 1 to 3) {
      val texts = byPage(p).map(_.text)
      assert(texts == Vector(s"alpha p$p", s"beta$p", s"gamma line two p$p"), texts)
      // geometry round-trips exactly (shared monospace metric)
      assert(byPage(p).map(i => (i.x, i.y)) ==
        Vector((100, 100 + 10 * p), (300, 100 + 10 * p), (100, 140 + 10 * p)))
    }
  }

  test("FlateDecode streams parse identically to uncompressed") {
    val plain = PdfLite.parse(doc3(compress = false))
    val flate = PdfLite.parse(doc3(compress = true))
    assert(flate.items == plain.items)
    assert(flate.nPages == 3)
  }

  test("hex strings parse identically to literal strings") {
    val plain = PdfLite.parse(doc3(compress = false))
    val hex = PdfLite.parse(doc3(compress = false, hexEvery = 1))
    assert(hex.items == plain.items)
  }

  test("hex string oddities: whitespace inside, odd digit count, empty") {
    val pdf = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 200 200] /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 60 >> stream\n" +
      "BT /F1 10 Tf 10 180 Td <48 65 6C6C 6F> Tj <4> Tj <> Tj ET\n" +
      "endstream endobj\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    // <48 65 6C6C 6F> = "Hello"; <4> = 0x40 = "@"; <> = empty (dropped blank)
    assert(parsed.items.map(_.text) == Vector("Hello", "@"), parsed.items)
  }

  test("TJ kerned arrays: -600 units advance exactly one space width") {
    val size = 12
    val run = PdfLite.Run(100, 200, size, "one two three")
    val viaTj = PdfLite.parse(PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(800, 1000, Seq(run))), tjEvery = 1))
    // three word items, positioned as if separated by single spaces
    val w = PdfLite.CharWidthFactor * size
    assert(viaTj.items.map(_.text) == Vector("one", "two", "three"))
    val xs = viaTj.items.map(_.x)
    assert(xs(0) == 100)
    assert(xs(1) == (100 + ("one".length + 1) * w).toInt, xs)
    assert(xs(2) == (100 + ("one two".length + 1) * w).toInt, xs)
    // the concatenation matches the plain run's text
    assert(viaTj.items.map(_.text).mkString(" ") == run.text)
  }

  test("literal-string octal escapes and line continuations (PDF §7.3.4.2)") {
    val pdf = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 200 200] /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 80 >> stream\n" +
      "BT /F1 10 Tf 10 180 Td (\\110i \\164here) Tj (sp\\154it \\\n" +
      "over lines) Tj (\\0601\\61) Tj ET\n" +
      "endstream endobj\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    // \110 = H, \164 = t; \<newline> = continuation (dropped); \060 = '0', \61 = '1'
    assert(parsed.items.map(_.text) == Vector("Hi there", "split over lines", "011"),
      parsed.items.map(_.text))
  }

  test("MediaBox inherits from the Pages node when the Page has none") {
    val pdf = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 500 700] >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 42 >> stream\n" +
      "BT /F1 10 Tf 1 0 0 1 50 640 Tm (top) Tj ET\n" +
      "endstream endobj\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    assert(parsed.pageW == 500 && parsed.pageH == 700)
    // yTop = 700 - 640 - 10 = 50 — inherited height applied
    assert(parsed.items.map(i => (i.text, i.x, i.y)) == Vector(("top", 50, 50)))
  }

  test("/Contents array: multiple streams concatenate onto one page") {
    val pdf = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 300 300] /Contents [4 0 R 5 0 R] >> endobj\n" +
      "4 0 obj << /Length 40 >> stream\nBT /F1 10 Tf 1 0 0 1 10 280 Tm (a) Tj ET\nendstream endobj\n" +
      "5 0 obj << /Length 40 >> stream\nBT /F1 10 Tf 1 0 0 1 10 260 Tm (b) Tj ET\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    assert(parsed.items.map(_.text) == Vector("a", "b"))
    assert(parsed.items.forall(_.page == 1))
  }

  test("corrupt Flate data degrades to recovered items, never throws") {
    val good = doc3(compress = true)
    // flip bytes inside the first compressed stream body
    val s = new String(good, StandardCharsets.ISO_8859_1)
    val k = s.indexOf("stream\n", s.indexOf("4 0 obj")) + 7
    val bad = good.clone()
    for (j <- k + 4 until math.min(k + 24, bad.length)) bad(j) = (bad(j) ^ 0x5A).toByte
    val parsed = PdfLite.parse(bad) // must not throw
    assert(parsed.nPages == 3)
    // pages 2 and 3 (untouched) still parse
    assert(parsed.items.exists(_.page == 2) && parsed.items.exists(_.page == 3))
  }

  test("nested /Kids trees: intermediate Pages nodes recurse, inheritance follows") {
    val pdf = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R 6 0 R] /Count 3 /MediaBox [0 0 400 400] >> endobj\n" +
      // intermediate Pages node with its own MediaBox, two leaf pages
      "3 0 obj << /Type /Pages /Kids [4 0 R 5 0 R] /Count 2 /MediaBox [0 0 300 300] >> endobj\n" +
      "4 0 obj << /Type /Page /Contents 7 0 R >> endobj\n" +
      "5 0 obj << /Type /Page /Contents 8 0 R >> endobj\n" +
      // direct leaf under the root (inherits the ROOT box)
      "6 0 obj << /Type /Page /Contents 9 0 R >> endobj\n" +
      "7 0 obj << /Length 44 >> stream\nBT /F1 10 Tf 1 0 0 1 10 280 Tm (p1) Tj ET\nendstream endobj\n" +
      "8 0 obj << /Length 44 >> stream\nBT /F1 10 Tf 1 0 0 1 10 280 Tm (p2) Tj ET\nendstream endobj\n" +
      "9 0 obj << /Length 44 >> stream\nBT /F1 10 Tf 1 0 0 1 10 380 Tm (p3) Tj ET\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    assert(parsed.nPages == 3, s"nested tree flattened: ${parsed.nPages} pages")
    assert(parsed.items.map(i => (i.text, i.page)) ==
      Vector(("p1", 1), ("p2", 2), ("p3", 3)), parsed.items)
    // pages 1/2 inherit the INTERMEDIATE box (h=300): yTop = 300-280-10 = 10
    // page 3 inherits the ROOT box (h=400): yTop = 400-380-10 = 10
    assert(parsed.items.map(_.y) == Vector(10, 10, 10), parsed.items.map(_.y))
    // a cyclic /Kids reference must not loop
    val cyclic = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [2 0 R 3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 100 100] /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 40 >> stream\nBT (x) Tj ET\nendstream endobj\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfLite.parse(cyclic).nPages == 1)
  }

  test("pathological token streams stay stack-safe (NFE runs, deep arrays)") {
    val dashes = "BT " + ("- . + " * 20000) + "(ok) Tj ET"
    val deep = "BT " + ("[ " * 20000) + "(x)" + (" ]" * 20000) + " TJ ET"
    for (body <- Seq(dashes, deep)) {
      val pdf = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /MediaBox [0 0 200 200] /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${body.length} >> stream\n" + body +
        "\nendstream endobj\n%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
      PdfLite.parse(pdf) // must not throw StackOverflowError
    }
  }

  test("classic xref table + trailer: parses identically and carries true offsets") {
    val plain = PdfLite.parse(doc3(compress = false))
    val bytes = PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      xref = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("xref") && s.contains("trailer") && s.contains("startxref"))
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items == plain.items && parsed.nPages == 3)
  }

  test("incremental update: the xref chain resolves the NEWEST definition") {
    val sb = new java.lang.StringBuilder
    def obj(num: Int, body: String): Int = {
      val off = sb.length; sb.append(s"$num 0 obj $body endobj\n"); off
    }
    def streamObj(num: Int, content: String): Int = {
      val off = sb.length
      sb.append(s"$num 0 obj << /Length ${content.length} >> stream\n")
        .append(content).append("\nendstream endobj\n")
      off
    }
    sb.append("%PDF-1.4\n")
    val o1 = obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    val o2 = obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    val o3 = obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] /Contents 4 0 R >>")
    val o4 = streamObj(4, "BT /F1 10 Tf 1 0 0 1 10 180 Tm (OLD) Tj ET")
    val x1 = sb.length
    sb.append("xref\n0 5\n0000000000 65535 f \n")
    for (o <- Seq(o1, o2, o3, o4)) sb.append(f"$o%010d 00000 n \n")
    sb.append(s"trailer << /Size 5 /Root 1 0 R >>\nstartxref\n$x1\n%%EOF\n")
    // incremental update section: object 4 redefined, new xref links back
    val o4b = streamObj(4, "BT /F1 10 Tf 1 0 0 1 10 180 Tm (NEW) Tj ET")
    val x2 = sb.length
    sb.append(f"xref\n4 1\n$o4b%010d 00000 n \n")
    sb.append(s"trailer << /Size 5 /Root 1 0 R /Prev $x1 >>\nstartxref\n$x2\n%%EOF\n")
    val parsed = PdfLite.parse(sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    // first-definition-wins (the no-xref fallback) would read OLD here
    assert(parsed.items.map(_.text) == Vector("NEW"), parsed.items)
  }

  test("trailer /Root selects the real page tree over a decoy Pages node") {
    val sb = new java.lang.StringBuilder
    def obj(num: Int, body: String): Int = {
      val off = sb.length; sb.append(s"$num 0 obj $body endobj\n"); off
    }
    sb.append("%PDF-1.4\n")
    // decoy appears FIRST in file order — an orphan tree (e.g. from an
    // abandoned incremental edit) pointing at an empty page
    val d1 = obj(9, "<< /Type /Pages /Kids [8 0 R] /Count 1 >>")
    val d2 = obj(8, "<< /Type /Page /Parent 9 0 R /MediaBox [0 0 50 50] >>")
    val o1 = obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    val o2 = obj(2, "<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    val o3 = obj(3, "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] /Contents 4 0 R >>")
    val content = "BT /F1 10 Tf 1 0 0 1 10 180 Tm (real) Tj ET"
    val o4 = sb.length
    sb.append(s"4 0 obj << /Length ${content.length} >> stream\n")
      .append(content).append("\nendstream endobj\n")
    val x1 = sb.length
    sb.append("xref\n0 5\n0000000000 65535 f \n")
    for (o <- Seq(o1, o2, o3, o4)) sb.append(f"$o%010d 00000 n \n")
    sb.append(f"8 2\n$d2%010d 00000 n \n$d1%010d 00000 n \n")
    sb.append(s"trailer << /Size 10 /Root 1 0 R >>\nstartxref\n$x1\n%%EOF\n")
    val parsed = PdfLite.parse(sb.toString.getBytes(StandardCharsets.ISO_8859_1))
    assert(parsed.items.map(_.text) == Vector("real"))
    assert(parsed.pageW == 200 && parsed.nPages == 1)
  }

  test("/ObjStm object streams: structural dicts inside a compressed container") {
    val plain = PdfLite.parse(doc3(compress = false))
    val viaObjStm = PdfLite.parse(PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      objStm = true))
    assert(viaObjStm.items == plain.items)
    assert(viaObjStm.nPages == 3 && viaObjStm.pageW == 800)
    // and combined with Flate content + classic xref (hybrid file)
    val combo = PdfLite.parse(PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      compress = true, objStm = true, xref = true))
    assert(combo.items == plain.items && combo.nPages == 3)
  }

  test("WinAnsiEncoding: cp1252-only chars round-trip through single bytes") {
    val text = "quoted “words” — café €5 don’t"
    val bytes = PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
      Seq(PdfLite.Run(10, 50, 12, text)))), winAnsi = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/WinAnsiEncoding") && s.contains("/Resources"))
    // the serialized stream holds the cp1252 single bytes, not mojibake
    assert(s.contains("words")) // 0x93/0x94 = curly quotes
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items.map(_.text) == Vector(text), parsed.items)
    // hex-string and TJ paths decode through the same font encoding
    for ((tj, hx) <- Seq((0, 1), (1, 0), (1, 1))) {
      val p2 = PdfLite.parse(PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
        Seq(PdfLite.Run(10, 50, 12, text)))),
        winAnsi = true, tjEvery = tj, hexEvery = hx))
      assert(p2.items.map(_.text).mkString(" ") == text, (tj, hx, p2.items))
    }
  }

  test("writer encoding contract: unencodable chars become a literal '?'") {
    // U+2192 (→) exists in neither Latin-1 nor cp1252
    val runs = Seq(PdfLite.Run(10, 50, 12, "a→b — c"))
    val latin = PdfLite.parse(PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400, runs))))
    // default writer is Latin-1: the em dash is unencodable too
    assert(latin.items.map(_.text) == Vector("a?b ? c"))
    val win = PdfLite.parse(PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400, runs)),
      winAnsi = true))
    assert(win.items.map(_.text) == Vector("a?b — c"))
  }

  test("PDF 1.5 xref STREAM: /W rows + type-2 ObjStm entries parse identically") {
    val plain = PdfLite.parse(doc3(compress = false))
    val viaXrefStm = PdfLite.parse(PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      xrefStream = true))
    assert(viaXrefStm.items == plain.items && viaXrefStm.nPages == 3)
    // the modern-writer combo: structural dicts in an ObjStm, located by
    // type-2 entries of a compressed xref stream
    val modernBytes = PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      compress = true, objStm = true, xrefStream = true)
    val s = new String(modernBytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Type /XRef") && s.contains("/ObjStm"))
    val modern = PdfLite.parse(modernBytes)
    assert(modern.items == plain.items && modern.nPages == 3)
    assert(modern.pageW == 800 && modern.pageH == 1000)
  }

  test("/ToUnicode CMap: non-Latin chars round-trip through doc-local codes") {
    val text = "αβγ — résumé ↦ Ω" // Greek/arrow/Omega: beyond cp1252 entirely
    val bytes = PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
      Seq(PdfLite.Run(10, 50, 12, text)))), toUnicode = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/ToUnicode") && s.contains("beginbfchar"))
    // the serialized stream does NOT contain the text — Tj bytes are private
    // codes that only the CMap can decode (the subset-font reality)
    assert(!s.contains("résumé"))
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items.map(_.text) == Vector(text), parsed.items)
    // and through Flate + TJ + hex paths
    for ((c, tj, hx) <- Seq((true, 0, 0), (false, 1, 0), (true, 0, 1))) {
      val p2 = PdfLite.parse(PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
        Seq(PdfLite.Run(10, 50, 12, text)))),
        toUnicode = true, compress = c, tjEvery = tj, hexEvery = hx))
      assert(p2.items.map(_.text).mkString(" ") == text, (c, tj, hx, p2.items))
    }
  }

  test("ASCIIHexDecode: hex-armored streams, alone and chained over Flate") {
    val plain = PdfLite.parse(doc3(compress = false))
    val hexed = PdfLite.parse(PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      hexArmor = true))
    assert(hexed.items == plain.items)
    val chained = PdfLite.parse(PdfLite.writeDoc(
      (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p))),
      compress = true, hexArmor = true))
    assert(chained.items == plain.items && chained.nPages == 3)
  }

  test("ASCII85Decode: base-85 armor alone, over Flate, and over RunLength") {
    val plain = PdfLite.parse(doc3(compress = false))
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val alone = PdfLite.writeDoc(pages, a85Armor = true)
    val s = new String(alone, StandardCharsets.ISO_8859_1)
    assert(s.contains("/ASCII85Decode") && s.contains("~>") && !s.contains("alpha p1"))
    assert(PdfLite.parse(alone).items == plain.items)
    val overFlate = PdfLite.parse(PdfLite.writeDoc(pages, compress = true, a85Armor = true))
    assert(overFlate.items == plain.items && overFlate.nPages == 3)
    val overRle = PdfLite.parse(PdfLite.writeDoc(pages, rle = true, a85Armor = true))
    assert(overRle.items == plain.items && overRle.nPages == 3)
  }

  test("RunLengthDecode: literal blocks, long runs, and hex armor round-trip") {
    val plain = PdfLite.parse(doc3(compress = false))
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val viaRle = PdfLite.writeDoc(pages, rle = true)
    val s = new String(viaRle, StandardCharsets.ISO_8859_1)
    assert(s.contains("/RunLengthDecode"))
    assert(PdfLite.parse(viaRle).items == plain.items)
    assert(PdfLite.parse(PdfLite.writeDoc(pages, rle = true, hexArmor = true))
      .items == plain.items)
    // a run-heavy page: >128-byte runs force the length cap and multi-packets
    val runny = "x" * 400 + " mid " + "y" * 300
    val p2 = PdfLite.parse(PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(8000, 400, Seq(PdfLite.Run(10, 50, 12, runny)))), rle = true))
    assert(p2.items.map(_.text) == Vector(runny))
  }

  test("link annotations: inline and indirect /Annots layouts round-trip across dialects") {
    val urls = Seq("https://a.test/one/1", "https://b.test/two(2)",
      "https://c.test/back\\slash", "https://d.test/four")
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val bytes = PdfLite.writeDoc(pages, links = urls)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    // even-indexed links are indirect /Annot objects, odd-indexed inline
    assert(s.contains("/Type /Annot") && s.contains("/S /URI"))
    assert(PdfLite.links(bytes).sorted == urls.sorted.toVector)
    // survives xref streams, ObjStm page dicts, compression, and page parse
    for ((x, o, c) <- Seq((true, false, true), (false, true, false), (true, true, true))) {
      val b2 = PdfLite.writeDoc(pages, links = urls, xrefStream = x, objStm = o, compress = c)
      assert(PdfLite.links(b2).sorted == urls.sorted.toVector, (x, o, c))
      assert(PdfLite.parse(b2).nPages == 3, (x, o, c))
    }
    // total on garbage and non-PDF
    assert(PdfLite.links("not a pdf".getBytes) == Vector.empty)
    assert(PdfLite.links(null) == Vector.empty)
    // no links → empty
    assert(PdfLite.links(doc3(compress = false)) == Vector.empty)
  }

  test("/Info dict: trailer resolve, trailer-less fallback, escapes, hex UTF-16BE") {
    val di = PdfLite.DocInfo("report (Q3) 50% \\ done", "dept-7",
      "pdfTeX-1.40.25", "D:20250901120000")
    val pages = Seq(PdfLite.PageSpec(400, 400, Seq(PdfLite.Run(10, 50, 12, "hello"))))
    // classic xref trailer, xref-stream dict, and no-xref fallback
    for ((x, xs) <- Seq((true, false), (false, true), (false, false))) {
      val b = PdfLite.writeDoc(pages, info = Some(di), xref = x, xrefStream = xs)
      assert(PdfLite.docInfo(b).contains(di), (x, xs))
    }
    assert(PdfLite.docInfo(doc3(compress = false)).isEmpty)
    assert(PdfLite.docInfo("junk".getBytes).isEmpty)
    // hand-built /Info with a BOM-prefixed UTF-16BE hex string title
    val hexTitle = "FEFF" + "résumé".flatMap(c => f"${c.toInt}%04X")
    val hand = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 0 >> stream\n\nendstream endobj\n" +
      s"5 0 obj << /Title <$hexTitle> /Producer (Hand 1.0) >> endobj\n" +
      "trailer << /Size 6 /Root 1 0 R /Info 5 0 R >>\n%%EOF\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    val got = PdfLite.docInfo(hand)
    assert(got.exists(d => d.title == "résumé" && d.producer == "Hand 1.0"), got)
  }

  test("garbage xref/startxref sections degrade to the linear scan, never throw") {
    val good = doc3(compress = false)
    val tail = "xref\n0 banana\ntrailer << /Root nope >>\nstartxref\nnotanumber\n%%EOF\n"
    val bytes = good ++ tail.getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(bytes)
    assert(parsed.nPages == 3 && parsed.items.nonEmpty)
    // startxref pointing past EOF
    val bad2 = good ++ "startxref\n999999999\n%%EOF\n".getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfLite.parse(bad2).nPages == 3)
  }

  test("LZWDecode: TIFF-variant LZW streams parse identically, alone and hex-armored") {
    val plain = PdfLite.parse(doc3(compress = false))
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val viaLzw = PdfLite.writeDoc(pages, lzw = true)
    val s = new String(viaLzw, StandardCharsets.ISO_8859_1)
    assert(s.contains("/LZWDecode") && !s.contains("alpha p1"))
    val lzw = PdfLite.parse(viaLzw)
    assert(lzw.items == plain.items && lzw.nPages == 3)
    val chained = PdfLite.parse(PdfLite.writeDoc(pages, lzw = true, hexArmor = true))
    assert(chained.items == plain.items && chained.nPages == 3)
  }

  test("LZW code-width growth: a long low-repetition stream crosses 9→10→11 bits") {
    // ~6000 chars over a 62-symbol alphabet via an LCG: the dictionary blows
    // well past 511 and 1023 entries, so encode/decode only round-trip if
    // both sides agree on the EarlyChange=1 width-switch points
    val alpha = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    var seed = 12345L
    val text = new StringBuilder
    for (_ <- 0 until 6000) {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      text.append(alpha(((seed >>> 33) % alpha.length).toInt))
    }
    val run = PdfLite.Run(10, 50, 12, text.toString)
    val parsed = PdfLite.parse(PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(8000, 400, Seq(run))), lzw = true))
    assert(parsed.items.map(_.text) == Vector(text.toString))
  }

  test("xref stream /DecodeParms Predictor 12 (PNG Up) decodes identically") {
    val plain = PdfLite.parse(doc3(compress = false))
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val bytes = PdfLite.writeDoc(pages,
      compress = true, objStm = true, xrefStream = true, predictor = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Predictor 12") && s.contains("/Columns 7"))
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items == plain.items && parsed.nPages == 3)
    assert(parsed.pageW == 800 && parsed.pageH == 1000)
  }

  test("/Rotate: rotated pages report display dims and display-space coords") {
    val plain = PdfLite.parse(doc3(compress = false))
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    for (rot <- Seq(90, 180, 270)) {
      val parsed = PdfLite.parse(PdfLite.writeDoc(pages, rotate = rot))
      // identical display-space geometry: the stored user-space anchors moved,
      // but the rotated view matches the unrotated page (PyMuPDF semantics)
      assert(parsed.items == plain.items, s"rot=$rot: ${parsed.items.take(3)}")
      assert(parsed.pageW == 800 && parsed.pageH == 1000, rot)
      assert(parsed.nPages == 3)
    }
    // the writer really stores swapped user-space MediaBox dims for 90/270
    val s90 = new String(PdfLite.writeDoc(pages, rotate = 90), StandardCharsets.ISO_8859_1)
    assert(s90.contains("/Rotate 90") && s90.contains("/MediaBox [0 0 1000 800]"))
    // degenerate /Rotate values are ignored, not misapplied
    val junk = new String(PdfLite.writeDoc(pages.take(1)), StandardCharsets.ISO_8859_1)
      .replace("/Type /Page /Parent", "/Type /Page /Rotate 45 /Parent")
    val p45 = PdfLite.parse(junk.getBytes(StandardCharsets.ISO_8859_1))
    assert(p45.items.map(_.text) == plain.items.filter(_.page == 1).map(_.text))
  }

  test("Identity-H composite font: 2-byte CID codes round-trip via the CMap") {
    val text = "漢字テスト und ASCII zusammen ↦ Ω"
    val bytes = PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
      Seq(PdfLite.Run(10, 50, 12, text)))), cid = true)
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Subtype /Type0") && s.contains("/Identity-H"))
    assert(s.contains("begincodespacerange"))
    // shown strings are 2-byte hex codes — no raw text survives serialization
    assert(!s.contains("zusammen"))
    val parsed = PdfLite.parse(bytes)
    assert(parsed.items.map(_.text) == Vector(text), parsed.items)
    // and through the modern-writer structural combo
    val modern = PdfLite.parse(PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
      Seq(PdfLite.Run(10, 50, 12, text)))),
      cid = true, compress = true, objStm = true, xrefStream = true))
    assert(modern.items.map(_.text) == Vector(text), modern.items)
  }

  test("Form XObjects: page bodies behind `Do` parse identically") {
    val plain = PdfLite.parse(doc3(compress = false))
    val pages = (1 to 3).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val viaForm = PdfLite.writeDoc(pages, form = true)
    val s = new String(viaForm, StandardCharsets.ISO_8859_1)
    assert(s.contains("/Subtype /Form") && s.contains("/Fm0 Do"))
    val parsed = PdfLite.parse(viaForm)
    assert(parsed.items == plain.items && parsed.nPages == 3)
    // the modern-writer combo: compressed form streams + ObjStm + xref stream
    val modern = PdfLite.parse(PdfLite.writeDoc(pages,
      form = true, compress = true, objStm = true, xrefStream = true))
    assert(modern.items == plain.items && modern.nPages == 3)
    // fonts resolve from the form's OWN /Resources (page names only the Fm)
    val text = "résumé — forma Ω"
    val fontForm = PdfLite.parse(PdfLite.writeDoc(Seq(PdfLite.PageSpec(400, 400,
      Seq(PdfLite.Run(10, 50, 12, text)))), form = true, toUnicode = true))
    assert(fontForm.items.map(_.text) == Vector(text), fontForm.items)
  }

  test("nested and cyclic Form XObjects stay bounded; unknown Do names skip") {
    // hand-written: page -> FmA -> FmB (text), and FmB cycles back to FmA;
    // resolution is depth-capped so the cycle terminates with the text found
    val content = "/FmA Do"
    val a = "BT /F1 10 Tf 10 100 Td (outer) Tj ET /FmB Do /Nope Do"
    val b = "BT /F1 10 Tf 10 80 Td (inner) Tj ET /FmA Do"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 200 200] " +
      "/Contents 4 0 R /Resources << /XObject << /FmA 5 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      s"5 0 obj << /Type /XObject /Subtype /Form /BBox [0 0 200 200] " +
      s"/Resources << /XObject << /FmB 6 0 R >> >> /Length ${a.length} >> stream\n$a\nendstream endobj\n" +
      s"6 0 obj << /Type /XObject /Subtype /Form /BBox [0 0 200 200] " +
      s"/Resources << /XObject << /FmA 5 0 R >> >> /Length ${b.length} >> stream\n$b\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    // depth cap 3: page→A→B→A(text only, B unresolved at depth 3) — the
    // cycle contributes finitely and never loops
    assert(parsed.items.map(_.text).startsWith(Vector("outer", "inner")), parsed.items)
    assert(parsed.items.count(_.text == "outer") <= 2)
  }

  test("TL leading with ' and \" show operators advances lines") {
    val content = "BT /F1 10 Tf 1 0 0 1 10 180 Tm 14 TL (one) Tj " +
      "(two) ' 1 2 (three) \" ET"
    val pdf = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 200 200] /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    assert(parsed.items.map(_.text) == Vector("one", "two", "three"), parsed.items)
    // y-top = pageH - tmy - size: 200-180-10, then 14 down per ' / "
    assert(parsed.items.map(_.y) == Vector(10, 24, 38), parsed.items)
    assert(parsed.items.map(_.x) == Vector(10, 10, 10))
  }

  test("inline images (BI..ID..EI) are skipped even with delimiter-soup payloads") {
    val binary = " ÿ(<[/IDEI_not_it)]" * 3
    val content = "BT /F1 10 Tf 10 180 Td (before) Tj ET " +
      s"BI /W 2 /H 2 /BPC 8 ID $binary EI " +
      "BT /F1 10 Tf 10 160 Td (after) Tj ET"
    val pdf = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 200 200] /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(pdf)
    assert(parsed.items.map(_.text) == Vector("before", "after"), parsed.items)
    // truncated variant: BI with no EI — rest of stream is image bytes
    val trunc = content.replace(" EI ", " ")
    val pdf2 = ("%PDF-1.4\n2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 200 200] /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${trunc.length} >> stream\n$trunc\nendstream endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfLite.parse(pdf2).items.map(_.text) == Vector("before"))
  }

  test("round-1 dialect (no explicit write path) still parses via the object tree") {
    val legacy = PdfLite.write(1700, 1200, Seq(
      PdfLite.Run(40, 300, 12, "legacy run")), scanned = true)
    val parsed = PdfLite.parse(legacy)
    assert(parsed.items.map(_.text) == Vector("legacy run"))
    assert(parsed.hasImage && parsed.nPages == 1)
    assert(parsed.pageW == 1700 && parsed.pageH == 1200)
  }

  test("/Encoding /Differences: remapped codes round-trip, base WinAnsi covers the rest") {
    val memo = "mémo — “net €42” à ±5%"
    val doc = PdfLite.writeDoc(Seq(PdfLite.PageSpec(800, 1000, Vector(
      PdfLite.Run(100, 100, 12, "ascii stays ascii"),
      PdfLite.Run(100, 140, 12, memo)))), differences = true)
    val raw = new String(doc, StandardCharsets.ISO_8859_1)
    assert(raw.contains("/Differences"), "dialect must be on the wire")
    // the serialized bytes are NOT the text: at least one char rides a
    // remapped code only the Differences array explains
    assert(!raw.contains("mémo"), "remapped é must not serialize as its cp1252 byte")
    assert(raw.contains(""), "the Differences code block must be in use")
    val parsed = PdfLite.parse(doc)
    assert(parsed.items.map(_.text) == Vector("ascii stays ascii", memo),
      parsed.items.map(_.text))
  }

  test("/Differences via an INDIRECT encoding object, multi-run array, unknown names") {
    // handcrafted: code 128 -> /Euro, run restart at 200 -> /uni0142 (AGL
    // algorithmic), /g55 unknown (keeps cp1252 base meaning), base covers 0x93
    val content = "BT /F1 12 Tf 10 100 Td (net  È ok) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /MediaBox [0 0 400 200] /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /F /Encoding 6 0 R >> endobj\n" +
      "6 0 obj << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
      "/Differences [ 128 /Euro 200 /uni0142 /g55 ] >> endobj\n" +
      "%%EOF\n").getBytes(StandardCharsets.ISO_8859_1)
    val items = PdfLite.parse(pdf).items
    // 0x80->€ (Differences), 0xC8->ł (uni0142 run), 0x93/0x94->cp1252 “ ”
    assert(items.map(_.text) == Vector("net € ł “ok”"), items)
  }

  test("/DCTDecode image XObject: real JPEG decodes -> image marker; corrupt does not") {
    val rng = new java.util.Random(7)
    val jpeg = Multimodal.jpegBlob(rng, 32, 40)
    val runs = Vector(PdfLite.Run(100, 100, 12, "x"))
    def doc(img: Option[PdfLite.JpegImage]) =
      PdfLite.writeDoc(Seq(PdfLite.PageSpec(800, 1000, runs)),
        scanned = true, dctImage = img)
    assert(PdfLite.parse(doc(Some(PdfLite.JpegImage(jpeg, 32, 40)))).hasImage,
      "a decodable JPEG payload must sniff as an image")
    val corrupt = jpeg.take(8) ++ Array.fill[Byte](64)(0x5a)
    assert(!PdfLite.parse(doc(Some(PdfLite.JpegImage(corrupt, 32, 40)))).hasImage,
      "a corrupt DCT payload must NOT promote the page to the scanned-image route")
    assert(PdfLite.parse(doc(None)).hasImage,
      "the bare pixel-less marker keeps its sniff value")
  }

  test("RC4 Standard Security Handler: encrypted docs round-trip, ciphertext on the wire") {
    val pages = (1 to 2).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val plainDoc = PdfLite.writeDoc(pages)
    val encDoc = PdfLite.writeDoc(pages, encrypt = true)
    val raw = new String(encDoc, StandardCharsets.ISO_8859_1)
    assert(raw.contains("/Encrypt") && raw.contains("/Standard") &&
      raw.contains("/ID ["), "the security-handler plumbing must be on the wire")
    assert(!raw.contains("alpha p1"), "stream content must be ciphertext")
    assert(PdfLite.parse(encDoc).items == PdfLite.parse(plainDoc).items)
  }

  test("encryption composes with Flate, ToUnicode CMaps, ObjStm and xref streams") {
    val memo = "m\u00e9mo \u2014 \u201cnet \u20ac42\u201d"
    val pages = Seq(PdfLite.PageSpec(800, 1000,
      runsOf(1, 120) :+ PdfLite.Run(40, 900, 9, memo)))
    val plain = PdfLite.parse(PdfLite.writeDoc(pages, compress = true, toUnicode = true))
    val enc1 = PdfLite.parse(PdfLite.writeDoc(pages, compress = true,
      toUnicode = true, encrypt = true))
    assert(enc1.items == plain.items, "encrypt + Flate + CMap")
    val enc2 = PdfLite.parse(PdfLite.writeDoc(pages, compress = true,
      toUnicode = true, encrypt = true, objStm = true, xrefStream = true,
      predictor = true))
    assert(enc2.items == plain.items, "encrypt + ObjStm + xref stream + predictor")
  }

  test("damaged-file reconstruction: corrupt xref offsets, bogus startxref, stripped trailer") {
    // The damage shapes live in PdfDamage (one source of truth — q46 runs
    // the same transforms at fleet scale):
    //  - xref_zeroed: every 10-digit entry offset points at byte 0 — objAt
    //    finds no matching object there, so the linear scan must win;
    //  - startxref_bogus: startxref pointing into the void (past EOF);
    //  - trailer_stripped: file truncated right after the last endobj — no
    //    xref, no trailer, no /Root; page order recovers from the first
    //    Pages node in file order.
    val pages = (1 to 2).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val doc = PdfLite.writeDoc(pages, compress = true, xref = true)
    val pristine = PdfLite.parse(doc)
    val vs = PdfDamage.variants(doc)
    assert(vs.map(_._1) ==
      Seq("startxref_bogus", "trailer_stripped", "xref_zeroed"))
    for ((kind, dmg) <- vs)
      assert(PdfLite.parse(dmg).items == pristine.items, kind)

    // eligibility fence: encrypted docs (trailer holds the key material)
    // and non-classic layouts produce no variants
    assert(PdfDamage.variants(PdfLite.writeDoc(pages, encrypt = true)).isEmpty,
      "encrypted docs are ineligible by design")
    assert(PdfDamage.variants(PdfLite.writeDoc(pages, xrefStream = true)).isEmpty,
      "xref-stream docs are outside the classic-table damage shapes")
  }

  test("AESV2 (V=4/R=4): encrypted docs round-trip; IV+CBC ciphertext on the wire") {
    val pages = (1 to 2).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val plainDoc = PdfLite.writeDoc(pages)
    val encDoc = PdfLite.writeDoc(pages, aes = true)
    val raw = new String(encDoc, StandardCharsets.ISO_8859_1)
    assert(raw.contains("/AESV2") && raw.contains("/V 4 /R 4") &&
      raw.contains("/StmF /StdCF"), "the V4 crypt-filter plumbing must be on the wire")
    assert(!raw.contains("alpha p1"), "stream content must be ciphertext")
    assert(PdfLite.parse(encDoc).items == PdfLite.parse(plainDoc).items)
  }

  test("AESV2 composes with Flate, ToUnicode CMaps, ObjStm and xref streams") {
    val memo = "mémo — “net €42”"
    val pages = Seq(PdfLite.PageSpec(800, 1000,
      runsOf(1, 120) :+ PdfLite.Run(40, 900, 9, memo)))
    val plain = PdfLite.parse(PdfLite.writeDoc(pages, compress = true, toUnicode = true))
    val enc1 = PdfLite.parse(PdfLite.writeDoc(pages, compress = true,
      toUnicode = true, aes = true))
    assert(enc1.items == plain.items, "aes + Flate + CMap")
    val enc2 = PdfLite.parse(PdfLite.writeDoc(pages, compress = true,
      toUnicode = true, aes = true, objStm = true, xrefStream = true,
      predictor = true))
    assert(enc2.items == plain.items, "aes + ObjStm + xref stream + predictor")
  }

  test("AES primitive: pad/unpad round-trips every residue class, rejects malformed") {
    val key = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
    for (n <- Seq(0, 1, 15, 16, 17, 31, 32, 100)) {
      val data = Array.tabulate[Byte](n)(i => (i * 13).toByte)
      val ct = PdfCrypt.aesEncrypt(key, data)
      assert(ct.length == 16 + ((n / 16) + 1) * 16, s"IV + whole blocks for n=$n")
      assert(PdfCrypt.aesDecrypt(key, ct).exists(_.sameElements(data)), s"roundtrip n=$n")
    }
    assert(PdfCrypt.aesDecrypt(key, new Array[Byte](16)).isEmpty, "IV alone")
    assert(PdfCrypt.aesDecrypt(key, new Array[Byte](40)).isEmpty, "ragged length")
  }

  test("a real (non-empty) user password leaves an AESV2 doc opaque, never throws") {
    val doc = PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(800, 1000, runsOf(1, 120))), aes = true)
    val raw = new String(doc, StandardCharsets.ISO_8859_1)
    val ui = raw.indexOf("/U <")
    val tampered = (raw.substring(0, ui + 4) +
      (if (raw.charAt(ui + 4) == '0') '1' else '0') +
      raw.substring(ui + 5)).getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(tampered) // must not throw
    assert(!parsed.items.exists(_.text.contains("alpha")),
      "undecryptable streams must not yield plaintext items")
  }

  test("AESV3 (V=5/R=6): AES-256 docs round-trip; wrap vectors on the wire") {
    val pages = (1 to 2).map(p => PdfLite.PageSpec(800, 1000, runsOf(p, 100 + 10 * p)))
    val plainDoc = PdfLite.writeDoc(pages)
    val encDoc = PdfLite.writeDoc(pages, aes256 = true)
    val raw = new String(encDoc, StandardCharsets.ISO_8859_1)
    assert(raw.contains("/AESV3") && raw.contains("/V 5 /R 6") &&
      raw.contains("/UE <") && raw.contains("/OE <") && raw.contains("/Perms <"),
      "the V5 crypt-filter + Algorithm-8/9/10 vectors must be on the wire")
    assert(!raw.contains("alpha p1"), "stream content must be ciphertext")
    assert(PdfLite.parse(encDoc).items == PdfLite.parse(plainDoc).items)
  }

  test("AESV3 composes with Flate, CMaps, ObjStm and xref streams") {
    val memo = "mémo — “net €42”"
    val pages = Seq(PdfLite.PageSpec(800, 1000,
      runsOf(1, 120) :+ PdfLite.Run(40, 900, 9, memo)))
    val plain = PdfLite.parse(PdfLite.writeDoc(pages, compress = true, toUnicode = true))
    val enc = PdfLite.parse(PdfLite.writeDoc(pages, compress = true,
      toUnicode = true, aes256 = true, objStm = true, xrefStream = true,
      predictor = true))
    assert(enc.items == plain.items, "aes256 + Flate + CMap + ObjStm + xref stream")
  }

  test("Algorithm 2.B and the V5 key wrap are self-consistent; tampering rejects") {
    val id0 = Array.tabulate[Byte](16)(i => (i * 11 + 5).toByte)
    val fk = PdfCrypt.fileKey32(id0)
    assert(fk.length == 32)
    // the iterated R=6 hash must NOT degenerate to the plain R=5 SHA-256
    val salt = Array.tabulate[Byte](8)(_.toByte)
    assert(!PdfCrypt.hash2B(Array.empty, salt, Array.empty)
      .sameElements(PdfCrypt.hash2B(Array.empty, salt, Array.empty, r5 = true)))
    val (u48, ue) = PdfCrypt.u6Values(fk, id0)
    assert(u48.length == 48 && ue.length == 32)
    assert(PdfCrypt.fileKey6(u48, ue, r5 = false).exists(_.sameElements(fk)))
    val bad = u48.clone(); bad(0) = (bad(0) ^ 1).toByte
    assert(PdfCrypt.fileKey6(bad, ue, r5 = false).isEmpty, "tampered /U hash")
    val (o48, oe) = PdfCrypt.o6Values(fk, u48, id0)
    assert(o48.length == 48 && oe.length == 32)
    assert(PdfCrypt.perms6(fk, -44).length == 16)
  }

  test("deprecated R=5 (plain SHA-256 hash) decrypts on the read side") {
    // The writer emits R=6 only; synthesize the R=5 shape by recomputing
    // the /U//UE wrap with the single-round hash for the SAME file key
    // (stream ciphertext is key-only, so it carries over verbatim).
    val pages = Seq(PdfLite.PageSpec(800, 1000, runsOf(1, 120)))
    val plain = PdfLite.parse(PdfLite.writeDoc(pages))
    val encDoc = PdfLite.writeDoc(pages, aes256 = true)
    val raw = new String(encDoc, StandardCharsets.ISO_8859_1)
    val id0 = {
      val hex = raw.substring(raw.indexOf("/ID [<") + 6, raw.indexOf("/ID [<") + 38)
      hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    }
    val fk = PdfCrypt.fileKey32(id0)
    val vs = PdfCrypt.md5(id0, Array(1.toByte)).take(8)
    val ks = PdfCrypt.md5(id0, Array(2.toByte)).take(8)
    val u5 = PdfCrypt.hash2B(Array.empty, vs, Array.empty, r5 = true) ++ vs ++ ks
    // wrap the file key under the R=5 intermediate key: AES-256-CBC, zero
    // IV, no padding — reuse aesEncrypt's cipher via the public decrypt of
    // its inverse is unavailable, so splice bytes through u6Values' layout
    val ik = PdfCrypt.hash2B(Array.empty, ks, Array.empty, r5 = true)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(ik, "AES"),
      new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
    val ue5 = c.doFinal(fk)
    def hexOf(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    val oldU = raw.substring(raw.indexOf("/U <") + 4, raw.indexOf("/U <") + 4 + 96)
    val oldUe = raw.substring(raw.indexOf("/UE <") + 5, raw.indexOf("/UE <") + 5 + 64)
    val r5doc = raw.replace("/V 5 /R 6", "/V 5 /R 5")
      .replace(oldU, hexOf(u5)).replace(oldUe, hexOf(ue5))
    assert(PdfLite.parse(r5doc.getBytes(StandardCharsets.ISO_8859_1)).items ==
      plain.items, "R=5 handler decrypts")
  }

  test("a real (non-empty) user password leaves the bytes undecryptable, never throws") {
    val doc = PdfLite.writeDoc(
      Seq(PdfLite.PageSpec(800, 1000, runsOf(1, 120))), encrypt = true)
    // tamper the /U check value: simulates a file keyed to a password we
    // don't have — the parser must leave the streams encrypted
    val raw = new String(doc, StandardCharsets.ISO_8859_1)
    val ui = raw.indexOf("/U <")
    val tampered = (raw.substring(0, ui + 4) +
      (if (raw.charAt(ui + 4) == '0') '1' else '0') +
      raw.substring(ui + 5)).getBytes(StandardCharsets.ISO_8859_1)
    val parsed = PdfLite.parse(tampered) // must not throw
    assert(!parsed.items.exists(_.text.contains("alpha")),
      "undecryptable streams must not yield plaintext items")
  }
}
