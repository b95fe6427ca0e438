package graft.kernel

/** PDF Standard Security Handler, V=2 / R=3, RC4-128 (PDF 32000-1 §7.6.3 —
  * the legacy encrypted-PDF shape a web crawl actually serves; the reference
  * ingests these through PyMuPDF, `smart_extract.py:64-97`). Pure JDK: MD5
  * via `MessageDigest`, RC4 implemented inline (KSA + PRGA, ~15 lines — the
  * algorithm is public and trivially small; no provider lottery).
  *
  * Covers the empty-user-password case (the overwhelmingly common one for
  * "encrypted" files on the open web: viewable by anyone, the encryption
  * only gates editing). Algorithms by spec number:
  *  - Alg 2  — file encryption key from (padded password, /O, /P, /ID).
  *  - Alg 3  — /O (owner password hash).
  *  - Alg 4/5 — /U (user password check value; R=3 form).
  *  - Alg 1  — per-object key: MD5(fileKey ‖ objNum LE3 ‖ gen LE2).
  */
private[kernel] object PdfCrypt {

  /** The spec's 32-byte password pad (§7.6.3.3, Table 20 prose). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4: key-scheduling + pseudo-random generation, applied in one pass
    * (encrypt == decrypt). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0
    var k = 0
    while (k < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(k) = (data(k) ^ s((s(a) + s(b)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def le4(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Pad-or-truncate a password to 32 bytes (§7.6.3.3 step a). */
  def padded(pw: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    val n = math.min(32, pw.length)
    System.arraycopy(pw, 0, out, 0, n)
    System.arraycopy(Pad, 0, out, n, 32 - n)
    out
  }

  /** Algorithm 3: the /O value (R=3, key length 16). Empty owner password
    * falls back to the (empty) user password per spec. */
  def oValue(ownerPw: Array[Byte], userPw: Array[Byte]): Array[Byte] = {
    var digest = md5(padded(if (ownerPw.nonEmpty) ownerPw else userPw))
    var i = 0
    while (i < 50) { digest = md5(digest); i += 1 }
    val rc4Key = digest.take(16)
    var o = rc4(rc4Key, padded(userPw))
    var pass = 1
    while (pass <= 19) {
      o = rc4(rc4Key.map(b => (b ^ pass).toByte), o)
      pass += 1
    }
    o
  }

  /** Algorithm 2: the file encryption key (R=3, 128-bit). */
  def fileKey(userPw: Array[Byte], o: Array[Byte], p: Int,
              id0: Array[Byte]): Array[Byte] = {
    var digest = md5(padded(userPw), o, le4(p), id0)
    var i = 0
    while (i < 50) { digest = md5(digest.take(16)); i += 1 }
    digest.take(16)
  }

  /** Algorithm 5: the /U check value (R=3) — 16 significant bytes; the spec
    * pads to 32 with arbitrary bytes (we use zeros, and compare only 16). */
  def uValue(key: Array[Byte], id0: Array[Byte]): Array[Byte] = {
    var u = rc4(key, md5(Pad, id0))
    var pass = 1
    while (pass <= 19) {
      u = rc4(key.map(b => (b ^ pass).toByte), u)
      pass += 1
    }
    u ++ new Array[Byte](16)
  }

  /** Algorithm 1: the per-object RC4 key (gen is always 0 in our writer). */
  def objKey(fileKey: Array[Byte], objNum: Int): Array[Byte] = {
    val ext = Array(
      (objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
      ((objNum >> 16) & 0xff).toByte, 0.toByte, 0.toByte)
    md5(fileKey, ext).take(math.min(fileKey.length + 5, 16))
  }
}
