package graft.kernel

import java.nio.charset.StandardCharsets

/** Deterministic synthetic Common-Crawl-style corpus generator.
  *
  * Emits `(url, warc_ts, html:binary, text, lang)` rows per
  * `BASELINE.json.input_hint`. Generation is a pure function of (seed, index)
  * — `java.util.Random`'s algorithm is specified by the JDK, so rows are
  * reproducible across JVMs and across Spark partitionings; the same function
  * generates test fixtures, golden oracles (single-threaded kernel run at
  * generation time) and benchmark corpora. No wall-clock anywhere
  * (SURVEY.md §7.5.5): warc_ts = fixed epoch + index.
  *
  * Mix mirrors the reference corpus shape: mostly ~small pages plus one
  * deliberately giant document per ~1000 rows (the 2.8 MB DRISCOLL pdf amid
  * 110 KB pages — SURVEY.md §4 skew note) to exercise skew handling.
  */
object Corpus {

  /** Bump on ANY change to this file or to [[PdfLite.writeDoc]]'s output —
    * the constant is folded into [[graft.operators.ExtractOps]]'s corpus-cache
    * fingerprint, so bumping it invalidates every materialized corpus cache
    * even if the hashed sample pages happen to be byte-identical. */
  val GeneratorVersion = 15

  /** Outlink + provenance pools (deterministic per-doc draws). */
  private val LinkDomains = Vector("parts.example.com", "supplier-hub.test",
    "docs.vendor.net", "archive.invoices.org", "cdn.statements.io")
  private val LinkPaths = Vector("catalog", "terms", "invoice", "returns", "spec")
  private val Producers = Vector("LibreOffice 7.4", "Microsoft Word 2019",
    "Acrobat Distiller 21.0", "pdfTeX-1.40.25", "wkhtmltopdf 0.12.6",
    "iText 7.2.5")

  final case class PageRow(url: String, warc_ts: java.sql.Timestamp,
                           html: Array[Byte], text: String, lang: String)

  val BaseEpochMs: Long = 1756684800000L // 2025-09-01T00:00:00Z, fixed

  private val wordBank: Array[String] = (
    "the quick brown fox jumps over lazy dog aurora basalt cedar delta ember " +
    "fjord granite harbor indigo juniper krypton lumen mesa nectar onyx prism " +
    "quartz russet sierra timber umber violet willow xenon yonder zephyr " +
    "order case pallet freight invoice shipment carton vendor produce dairy " +
    "frozen grocery poultry bakery beverage supply warehouse dock route truck").split(' ')

  private val langMarkers = Map(
    "en" -> "the and of to in is for with that this",
    "de" -> "der die und von zu das mit ist nicht auf",
    "es" -> "el la de que y en los se del por")

  private val vendors = Array("newark", "sysco", "test")

  def sentence(rng: java.util.Random, lang: String, nWords: Int): String = {
    val markers = langMarkers(lang).split(' ')
    (0 until nWords).map { _ =>
      if (rng.nextInt(10) < 3) markers(rng.nextInt(markers.length))
      else wordBank(rng.nextInt(wordBank.length))
    }.mkString(" ")
  }

  /** A synthetic scanned-text bilevel page: dark word-like runs on line
    * bands every ~9 rows (1 = black), the shape fax/JBIG2 context models
    * are built for. Deterministic in the per-doc rng. */
  private def bilevelPage(rng: java.util.Random, w: Int, h: Int): Array[Byte] = {
    val r = new Array[Byte](w * h)
    var y = 4
    while (y < h - 4) {
      if (y % 9 < 4) { // a 4px-tall text band
        var x = 3 + rng.nextInt(5)
        while (x < w - 4) {
          val word = 4 + rng.nextInt(12) // black word run
          val gap = 2 + rng.nextInt(5)
          var k = 0
          while (k < word && x + k < w - 2) { r(y * w + x + k) = 1; k += 1 }
          x += word + gap
        }
      }
      y += 1
    }
    r
  }

  private val codePrefixes = Array("FR", "DRY", "R", "MRT")
  private def itemCode(rng: java.util.Random): String =
    codePrefixes(rng.nextInt(4)) + (1000 + rng.nextInt(9000))

  private def price(rng: java.util.Random): String =
    "$" + (1 + rng.nextInt(500)) + "." + f"${rng.nextInt(100)}%02d"

  private def date(rng: java.util.Random): String =
    s"${1 + rng.nextInt(12)}/${1 + rng.nextInt(28)}/2025"

  /** A newark-shaped order line: 16 logical fields laid out under the
    * builtin newark template geometry, with deliberate wide spans (splittable
    * descriptions, protected codes) to exercise G3–G5. */
  private def pdfTableRuns(rng: java.util.Random, vendor: String): Vector[PdfLite.Run] = {
    val t = Vendor.builtinTemplates(vendor)
    val cols = t.columns
    val Vector(bx1, by1, bx2, by2) = t.tableBox
    val runs = Vector.newBuilder[PdfLite.Run]
    val size = 12
    // header band ABOVE the table box — filtered out by F2, but feeds A1
    runs += PdfLite.Run(bx1, math.max(0, by1 - 80), 14, vendor.toUpperCase + " ORDER SUMMARY")
    runs += PdfLite.Run(bx1, math.max(0, by1 - 50), 10, s"account ${10000 + rng.nextInt(89999)} week of ${date(rng)}")

    // Geometry mirrors the observed reference trace (single_page_debug.log:3:
    // adaptive threshold 6.0px = median gap 5.0 × 1.2): most runs of a line sit
    // at y, a couple at y+5..7 (sub-line offsets), lines ~26-31px apart — so
    // the G1 median y-gap lands near the sub-line offsets and G2 keeps lines
    // apart while clustering the offset runs into their line.
    val nRows = 4 + rng.nextInt(8)
    val rowGap = 26 + rng.nextInt(6)
    var y = by1 + 15
    var r = 0
    // field positions as fractions of the column count — templates differ in
    // arity (test: 3 cols, sysco: 10, newark: 16)
    val nCols = cols.length - 1
    def cx(frac: Double): Int = cols(math.min(nCols - 1, (frac * nCols).toInt)) + 2
    while (r < nRows && y < by2 - 40) {
      val sub = y + 5 + rng.nextInt(3) // sub-line offset runs
      runs += PdfLite.Run(cx(0.0), y, size, (100000 + rng.nextInt(899999)).toString)
      runs += PdfLite.Run(cx(0.07), y, size, rng.nextInt(99).toString)
      if (rng.nextBoolean())
        runs += PdfLite.Run(cx(0.14), sub, size,
          s"${8 * (1 + rng.nextInt(24))} per case ${1 + rng.nextInt(3)} meal") // wide splittable
      runs += PdfLite.Run(cx(0.27), y, size, itemCode(rng)) // protected code, often spans 2 cols
      runs += PdfLite.Run(cx(0.40), sub, size, sentence(rng, "en", 3).toUpperCase)
      runs += PdfLite.Run(cx(0.58), y, size, price(rng))
      runs += PdfLite.Run(cx(0.70), y, size, date(rng))
      runs += PdfLite.Run(cx(0.83), y, size, rng.nextInt(500).toString)
      // continuation line (few filled cells → exercises G7 merge)
      if (rng.nextInt(3) == 0) {
        y += rowGap
        runs += PdfLite.Run(cx(0.40), y, size, sentence(rng, "en", 2))
        if (rng.nextBoolean()) runs += PdfLite.Run(cx(0.46), y, size, sentence(rng, "en", 2))
      }
      y += rowGap + rng.nextInt(3)
      r += 1
    }
    // footer BELOW the box
    runs += PdfLite.Run(bx1, math.min(by2 + 30, 1180), 10, s"Page 1 of ${1 + rng.nextInt(240)}")
    runs.result()
  }

  private def htmlPage(rng: java.util.Random, lang: String, giant: Boolean): String = {
    val sb = new java.lang.StringBuilder
    val nav = (1 to 6).map(i => s"""<a href="/s$i">${sentence(rng, lang, 1)}</a>""").mkString(" ")
    sb.append("<!doctype html><html><head><title>")
      .append(sentence(rng, lang, 4))
      .append("</title><style>body{margin:0}</style><script>var x=1;</script></head><body>")
    sb.append(s"<nav>$nav</nav><header><h1>").append(sentence(rng, lang, 5)).append("</h1></header>")
    sb.append("""<div class="side"><ul>""")
    for (i <- 1 to 8) sb.append(s"""<li><a href="/r$i">${sentence(rng, lang, 2)}</a></li>""")
    sb.append("</ul></div>")
    sb.append("<main><article>")
    val nParas = if (giant) 400 else 2 + rng.nextInt(5)
    for (_ <- 0 until nParas)
      sb.append("<p>").append(sentence(rng, lang, 25 + rng.nextInt(40))).append(".</p>")
    if (rng.nextInt(3) == 0 || giant) {
      sb.append("<table>")
      val nRows = if (giant) 300 else 3 + rng.nextInt(6)
      for (_ <- 0 until nRows) {
        sb.append("<tr>")
        sb.append(s"<td>${itemCode(rng)}</td><td>${sentence(rng, lang, 3)}</td>")
        sb.append(s"<td>${rng.nextInt(100)}</td><td>${price(rng)}</td><td>${date(rng)}</td>")
        sb.append("</tr>")
      }
      sb.append("</table>")
    }
    sb.append("</article></main><footer>")
    for (i <- 1 to 4) sb.append(s"""<a href="/f$i">${sentence(rng, lang, 1)}</a> """)
    sb.append("</footer></body></html>")
    sb.toString
  }

  /** Pure (seed, index) → row. Safe to call from any partition concurrently. */
  def page(i: Long, seed: Long = 42L): PageRow = {
    val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + i * 0x100000001b3L)
    rng.nextLong() // warm up (first draw of java.util.Random is weakly mixed)
    val lang = { val d = rng.nextInt(10); if (d < 8) "en" else if (d < 9) "de" else "es" }
    val giant = i % 1000 == 999
    val kindDraw = rng.nextInt(100)

    if (giant || kindDraw < 65) {
      val html = htmlPage(rng, lang, giant)
      val textPreview = {
        // plain-text rendering stand-in (crawler-provided `text` column)
        val s = sentence(rng, lang, 60)
        s + " " + s.take(80)
      }
      PageRow(f"https://synth.test/html/page-$i%09d",
        new java.sql.Timestamp(BaseEpochMs + i * 1000),
        html.getBytes(StandardCharsets.UTF_8), textPreview, lang)
    } else {
      val vendor = vendors(rng.nextInt(vendors.length))
      val scanned = kindDraw >= 90
      // structural variety so the corpus exercises every parser path the
      // real web throws at PDF ingestion: ~12% multi-page (/Kids trees),
      // ~30% FlateDecode-compressed streams, ~25% TJ kerned arrays, ~25%
      // hex strings, ~20% classic xref tables, ~20% PDF 1.5 xref STREAMS,
      // ~17% /ObjStm containers (type-2-located when an xref stream is
      // present), ~17% WinAnsiEncoding (cp1252-only chars), ~8% /ToUnicode
      // CMap fonts (chars beyond cp1252 entirely), ~8% ASCIIHex-armored
      // streams, ASCII85 armor on 1/16 of non-hex-armored docs (≈6% of all
      // docs, never stacked with hex), ~7% LZWDecode (the pre-Flate
      // compressor old tools still emit), RunLengthDecode on 1/14 of
      // otherwise-raw (non-Flate, non-LZW) streams (≈5% of all docs),
      // half of xref STREAMS PNG-Up predictor-encoded (the modern-
      // writer default), ~5% /Rotate 90/180/270 pages, ~8% Identity-H
      // composite fonts (2-byte CID codes + /ToUnicode, the CJK/subset-font
      // reality), ~12% page bodies behind Form XObjects invoked via Do
      // (letterhead/stamp layouts), ~8% /Encoding dicts with /Differences
      // arrays over a WinAnsi base (the subset-font encoding override
      // mechanism), ~8% embedded symbolic TrueType programs (/FontFile2 —
      // byte semantics live in the font's cmap/post tables only, the
      // subset-font shape), ~8% embedded CFF/Type1C programs (/FontFile3 —
      // byte semantics live in the CFF Encoding/charset/strings, corpus
      // v15), ~60% of scanned docs carry a REAL JPEG image
      // XObject behind /DCTDecode, ~20% a G4 fax payload behind
      // /CCITTFaxDecode and ~10% an MQ-coded generic region behind
      // /JBIG2Decode (the remaining ~10% keep the bare /Subtype /Image
      // marker — the low-confidence shape), and ~6% are encrypted under
      // the Standard
      // Security Handler with an empty user password (real key material;
      // a classic xref trailer is forced when needed) — an even three-way
      // split of legacy RC4-128 V2/R3, AES-128 V4/R4 /AESV2 and PDF 2.0
      // AES-256 V5/R6 /AESV3, the shapes Acrobat-era writers actually
      // emit. ~12% of unencrypted docs carry 1–3 /Link annotations with
      // /URI actions (half indirect objects, half inline dicts) and ~70%
      // an /Info dict (title/author/producer/creation-date) — the outlink
      // and provenance surfaces. All deterministic draws of the per-doc rng
      val nPages = if (rng.nextInt(8) == 0) 2 + rng.nextInt(3) else 1
      val basePages = (1 to nPages).map(_ =>
        PdfLite.PageSpec(1700, 1200, pdfTableRuns(rng, vendor)))
      val compress = rng.nextInt(10) < 3
      val tjEvery = if (rng.nextInt(4) == 0) 3 else 0
      val hexEvery = if (rng.nextInt(4) == 0) 4 else 0
      val xrefDraw = rng.nextInt(10) // 0-1 classic table, 2-3 xref stream
      val objStm = rng.nextInt(6) == 0
      // 0-1 WinAnsi, 2 ToUnicode, 3 Identity-H CID, 4 Differences-over-
      // WinAnsi, 5 embedded symbolic TrueType (/FontFile2), 6 embedded
      // CFF/Type1C (/FontFile3 — tier 10, corpus v15)
      val encDraw = rng.nextInt(12)
      val hexArmor = rng.nextInt(12) == 0
      // base-85 armor: 1/16 of non-hex-armored docs ≈ 6% of all docs;
      // RunLengthDecode (below): 1/14 of otherwise-raw streams ≈ 5% of all
      // docs — the fax/driver-era compressor
      val a85Armor = !hexArmor && rng.nextInt(16) == 0
      val winAnsi = encDraw <= 1
      val toUnicode = encDraw == 2
      val cid = encDraw == 3
      val differences = encDraw == 4
      val fontFile2 = encDraw == 5
      val fontFile3 = encDraw == 6
      val lzw = !compress && rng.nextInt(10) == 0
      val rle = !compress && !lzw && rng.nextInt(14) == 0
      val predictor = rng.nextInt(2) == 0 // applies only with an xref STREAM
      val rotate =
        if (rng.nextInt(20) == 0) 90 * (1 + rng.nextInt(3)) else 0
      val formX = rng.nextInt(8) == 0
      // ~60% of scanned docs carry real JPEG pixels behind /DCTDecode
      val encrypted = rng.nextInt(16) == 0
      val encFlavor = if (encrypted) rng.nextInt(3) else -1 // 0 rc4, 1 aes128, 2 aes256
      // outlink annotations (~12%) and /Info dicts (~70%) — unencrypted docs
      // only: this writer never encrypts literal strings (PdfLite.writeDoc)
      val links: Seq[String] =
        if (!encrypted && rng.nextInt(8) == 0)
          (0 to rng.nextInt(3)).map { _ =>
            val dom = LinkDomains(rng.nextInt(LinkDomains.length))
            s"https://$dom/${LinkPaths(rng.nextInt(LinkPaths.length))}/${rng.nextInt(10000)}"
          }
        else Nil
      val info: Option[PdfLite.DocInfo] =
        if (!encrypted && rng.nextInt(10) < 7) {
          val prod = Producers(rng.nextInt(Producers.length))
          val day = 1 + rng.nextInt(28)
          val created = f"D:202509${day}%02d${rng.nextInt(24)}%02d${rng.nextInt(60)}%02d00"
          Some(PdfLite.DocInfo(s"$vendor statement ${rng.nextInt(1000)}",
            s"dept-${rng.nextInt(40)}", prod, created))
        } else None
      val dctImage =
        if (scanned && rng.nextInt(5) < 3) {
          val w = 96 + rng.nextInt(64)
          val h = 128 + rng.nextInt(64)
          Some(PdfLite.JpegImage(Multimodal.jpegBlob(rng, w, h), w, h))
        } else None
      // the non-JPEG scanned docs split between fax-era G4, JBIG2 and the
      // bare-marker (low-confidence) shape
      val bilevelDraw =
        if (scanned && dctImage.isEmpty) rng.nextInt(4) else -1
      val ccittImage =
        if (bilevelDraw == 0 || bilevelDraw == 1)
          Some(CcittG4.Image(bilevelPage(rng, 112, 144), 112, 144))
        else None
      val jbig2Image =
        if (bilevelDraw == 2) {
          val r = bilevelPage(rng, 104, 136)
          Some(Jbig2.Image(r, 104, 136))
        } else None
      val pageSpecs =
        if (!winAnsi && !toUnicode && !cid && !differences) basePages
        else basePages.map { ps =>
          // a memo line the default Latin-1 writer cannot carry — proves the
          // font-decoding path end-to-end (serialized bytes ≠ the text)
          val memoText =
            if (winAnsi || differences) s"mémo — “net €${1 + rng.nextInt(999)}”"
            else if (cid) s"合計 ¥${1 + rng.nextInt(9999)} 税込 — 経理部"
            else s"σύνολο αβγ — Ω${1 + rng.nextInt(999)}"
          ps.copy(runs = ps.runs :+ PdfLite.Run(40, 1185, 9, memoText))
        }
      val bytes = PdfLite.writeDoc(pageSpecs, scanned = scanned,
        compress = compress, tjEvery = tjEvery, hexEvery = hexEvery,
        xref = xrefDraw <= 1, objStm = objStm, winAnsi = winAnsi,
        toUnicode = toUnicode, xrefStream = xrefDraw == 2 || xrefDraw == 3,
        hexArmor = hexArmor, lzw = lzw, a85Armor = a85Armor, rle = rle,
        predictor = predictor,
        rotate = rotate, cid = cid, form = formX,
        differences = differences, dctImage = dctImage,
        encrypt = encrypted, aes = encFlavor == 1, aes256 = encFlavor == 2,
        ccittImage = ccittImage, fontFile2 = fontFile2,
        fontFile3 = fontFile3,
        jbig2Image = jbig2Image, links = links, info = info)
      val text =
        if (scanned) "" // forces the scanned route (detect: no meaningful text)
        else pageSpecs.flatMap(_.runs).map(_.text).mkString(" ")
      PageRow(f"https://synth.test/pdf/$vendor%s/page-$i%09d",
        new java.sql.Timestamp(BaseEpochMs + i * 1000),
        bytes, text, lang)
    }
  }

  def rows(n: Int, seed: Long = 42L): Iterator[PageRow] =
    (0L until n.toLong).iterator.map(page(_, seed))
}
