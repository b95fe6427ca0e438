package graft.kernel

/** Deterministic damage transforms for classic-xref PDFs — the three
  * real-world corruption shapes the reconstruction path (PdfLite's
  * linear-scan recovery) must survive; the reference gets the same
  * resilience from PyMuPDF's repair-on-open (`smart_extract.py:64-97`).
  * Used by the damaged-file spec and by q46_damaged_recovery, which makes
  * the capability driver-visible.
  *
  * Only unencrypted classic-xref documents are eligible: an encrypted
  * doc's key material (`/Encrypt`, `/ID`) lives in the trailer, so
  * stripping the trailer is unrecoverable BY DESIGN, not a parser gap; and
  * the digit-zeroing shape is specific to the classic table layout.
  */
object PdfDamage {
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  def eligible(bytes: Array[Byte]): Boolean = {
    val s = new String(bytes, Latin1)
    s.startsWith("%PDF") && s.contains("\nxref\n") && !s.contains("/Encrypt")
  }

  /** `(kind, damaged bytes)` per damage shape, alphabetical by kind; empty
    * when the doc is ineligible. Kinds:
    *  - `startxref_bogus`   — startxref re-pointed past EOF;
    *  - `trailer_stripped`  — file cut right after the last `endobj` (no
    *    xref, no trailer, no /Root);
    *  - `xref_zeroed`       — every 10-digit entry offset in the xref
    *    table zeroed (they all point at byte 0). */
  def variants(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (!eligible(bytes)) return Nil
    val raw = new String(bytes, Latin1)
    val xi = raw.indexOf("\nxref\n")
    val zeroed = raw.substring(0, xi) +
      raw.substring(xi).replaceAll("\\d{10}", "0000000000")
    val sxi = raw.lastIndexOf("startxref")
    val bogus = raw.substring(0, sxi) + s"startxref\n${raw.length + 999}\n%%EOF\n"
    val cut = raw.lastIndexOf("endobj") + "endobj".length
    Seq(
      "startxref_bogus" -> bogus.getBytes(Latin1),
      "trailer_stripped" -> raw.substring(0, cut).getBytes(Latin1),
      "xref_zeroed" -> zeroed.getBytes(Latin1))
  }
}
