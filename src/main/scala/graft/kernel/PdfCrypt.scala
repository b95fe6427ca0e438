package graft.kernel

/** PDF Standard Security Handler: V=2/R=3 RC4-128, V=4/R=4 AES-128
  * (`/AESV2`) and V=5/R=6 AES-256 (`/AESV3`, PDF 2.0; R=5 read-side) —
  * PDF 32000-1 §7.6.2-7.6.3 / ISO 32000-2 §7.6.4, the encrypted-PDF
  * shapes a web crawl actually serves; the reference ingests all of them
  * through PyMuPDF (`smart_extract.py:64-97`). Pure JDK: MD5/SHA-2 via
  * `MessageDigest`, AES via `javax.crypto`, RC4 implemented inline (KSA +
  * PRGA, ~15 lines — the algorithm is public and trivially small; no
  * provider lottery).
  *
  * Covers the empty-user-password case (the overwhelmingly common one for
  * "encrypted" files on the open web: viewable by anyone, the encryption
  * only gates editing) AND real user/owner passwords supplied through the
  * caller's try-list (round 5 — the PyMuPDF `authenticate` contract).
  * Algorithms by spec number:
  *  - Alg 2  — file encryption key from (padded password, /O, /P, /ID).
  *    R=4 with encrypted metadata uses the identical derivation.
  *  - Alg 3  — /O (owner password hash); Alg 7 REVERSE recovers the padded
  *    user password from /O given the owner password.
  *  - Alg 4/5 — /U (user password check value; R=3/4 form).
  *  - Alg 1  — per-object key: MD5(fileKey ‖ objNum LE3 ‖ gen LE2), with
  *    the extra 4-byte "sAlT" suffix in the AESV2 variant.
  *  - Alg 8-12 — the V=5 /U//UE//O//OE wrap vectors and their user/owner
  *    validation + file-key unwrap.
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

  /** Algorithm 7 (read side, R=3): recover the PADDED user password from
    * /O given a candidate OWNER password — the reverse of [[oValue]]'s
    * 20-pass RC4 chain. The result feeds [[fileKey]] directly ([[padded]]
    * is the identity on a 32-byte input); whether the candidate was RIGHT
    * is decided downstream by the /U check, exactly as for a direct user
    * password. */
  def userPwFromOwner(ownerPw: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var digest = md5(padded(ownerPw))
    var i = 0
    while (i < 50) { digest = md5(digest); i += 1 }
    val rc4Key = digest.take(16)
    var u = o
    var pass = 19
    while (pass >= 0) {
      u = rc4(rc4Key.map(b => (b ^ pass).toByte), u)
      pass -= 1
    }
    u
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

  /** Algorithm 1, AESV2 variant: as [[objKey]] but with the spec's extra
    * 4-byte salt `sAlT` (0x73 41 6C 54) appended before hashing. */
  def objKeyAes(fileKey: Array[Byte], objNum: Int): Array[Byte] = {
    val ext = Array(
      (objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
      ((objNum >> 16) & 0xff).toByte, 0.toByte, 0.toByte,
      0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte)
    md5(fileKey, ext).take(math.min(fileKey.length + 5, 16))
  }

  private def aesCipher(mode: Int, key: Array[Byte],
                        iv: Array[Byte]): javax.crypto.Cipher = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c
  }

  /** AES-128-CBC encrypt with block padding, IV prepended (§7.6.2: the
    * AESV2 filter stores `IV ‖ CBC(pad(data))`, pad = PKCS#5-style 1..16
    * bytes each holding the pad length). The IV is derived
    * deterministically from (key, data): the corpus must be byte-stable
    * run to run, and the spec only requires the IV be PRESENT — its
    * randomness is a confidentiality concern, not a format one. */
  def aesEncrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val iv = md5(key, data) // 16 bytes, deterministic
    val padLen = 16 - (data.length % 16)
    val padded = java.util.Arrays.copyOf(data, data.length + padLen)
    java.util.Arrays.fill(padded, data.length, padded.length, padLen.toByte)
    iv ++ aesCipher(javax.crypto.Cipher.ENCRYPT_MODE, key, iv).doFinal(padded)
  }

  /** Inverse of [[aesEncrypt]]. Returns None (parser leaves the stream
    * opaque) when the input is not `IV ‖ ≥1 whole block` or the padding
    * byte is out of range — a wrong key walks into that check with
    * probability ~15/16, and the 1/16 false accept merely yields garbage
    * text, same as RC4 under a wrong key. */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 32 || (data.length - 16) % 16 != 0) return None
    val iv = java.util.Arrays.copyOfRange(data, 0, 16)
    val ct = java.util.Arrays.copyOfRange(data, 16, data.length)
    val pt = aesCipher(javax.crypto.Cipher.DECRYPT_MODE, key, iv).doFinal(ct)
    val pad = pt(pt.length - 1) & 0xff
    if (pad < 1 || pad > 16) None
    else Some(java.util.Arrays.copyOf(pt, pt.length - pad))
  }

  // ------------------------------------------------------------------
  // V=5 AES-256 (`/AESV3` crypt filter) — ISO 32000-2 §7.6.4: R=6 (the
  // PDF 2.0 form, iterated Algorithm 2.B hash) and R=5 (the deprecated
  // Adobe "ExtensionLevel 3" precursor, plain SHA-256) on the read side.
  // V5 drops per-object keys entirely: every string/stream is AES-256-CBC
  // under the FILE key; /U carries hash‖validationSalt‖keySalt and /UE the
  // file key wrapped under a password-derived intermediate key.
  // ------------------------------------------------------------------

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private val ZeroIv = new Array[Byte](16)
  private def aesNoIv(mode: Int, key: Array[Byte], data: Array[Byte]): Array[Byte] =
    aesCipher(mode, key, ZeroIv).doFinal(data)

  /** Algorithm 2.B (R=6): the iterated SHA-256/384/512 + AES-128-CBC
    * password hash. `udata` is empty for user-password hashes, the full
    * 48-byte /U for owner-password hashes. R=5 callers pass `r5 = true`
    * and get the single unsalted-iteration SHA-256 form. */
  def hash2B(pw: Array[Byte], salt: Array[Byte], udata: Array[Byte],
             r5: Boolean = false): Array[Byte] = {
    var k = sha("SHA-256", pw, salt, udata)
    if (r5) return k
    var round = 0
    var done = false
    while (!done) {
      // K1 = (pw ‖ K ‖ udata) repeated 64 times, AES-128-CBC-encrypted
      // under (K[0:16], iv = K[16:32]); digest choice = sum(E[0:16]) mod 3
      val one = new Array[Byte](pw.length + k.length + udata.length)
      System.arraycopy(pw, 0, one, 0, pw.length)
      System.arraycopy(k, 0, one, pw.length, k.length)
      System.arraycopy(udata, 0, one, pw.length + k.length, udata.length)
      val k1 = new Array[Byte](one.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(one, 0, k1, i * one.length, one.length); i += 1
      }
      val e = aesCipher(javax.crypto.Cipher.ENCRYPT_MODE,
        java.util.Arrays.copyOf(k, 16),
        java.util.Arrays.copyOfRange(k, 16, 32)).doFinal(k1)
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      k = (sum % 3) match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      round += 1
      done = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
    }
    java.util.Arrays.copyOf(k, 32)
  }

  /** The V5 file encryption key is freestanding (the spec says 32 random
    * bytes; /UE//OE wrap it) — derived from the doc `/ID` here for the same
    * byte-stability reason the salts are. */
  def fileKey32(id0: Array[Byte]): Array[Byte] =
    sha("SHA-256", id0, Array(0x6b.toByte))

  /** Algorithm 8: /U (48 bytes: hash ‖ validationSalt ‖ keySalt) and /UE
    * (file key AES-256-wrapped under the key-salt hash) for an EMPTY user
    * password. Salts are derived deterministically from the doc `/ID` —
    * the corpus must be byte-stable, and the spec only requires salts be
    * present (their randomness guards password cracking, not format). */
  def u6Values(fileKey: Array[Byte], id0: Array[Byte],
               userPw: Array[Byte] = Array.empty): (Array[Byte], Array[Byte]) = {
    val vs = md5(id0, Array(1.toByte)).take(8)
    val ks = md5(id0, Array(2.toByte)).take(8)
    val u = hash2B(userPw, vs, Array.empty) ++ vs ++ ks
    val ue = aesNoIv(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(userPw, ks, Array.empty), fileKey)
    (u, ue)
  }

  /** Algorithm 9: /O and /OE — as [[u6Values]] but the hashes fold in the
    * full 48-byte /U (owner validation binds to the user record). */
  def o6Values(fileKey: Array[Byte], u48: Array[Byte], id0: Array[Byte],
               ownerPw: Array[Byte] = Array.empty): (Array[Byte], Array[Byte]) = {
    val vs = md5(id0, Array(3.toByte)).take(8)
    val ks = md5(id0, Array(4.toByte)).take(8)
    val o = hash2B(ownerPw, vs, u48) ++ vs ++ ks
    val oe = aesNoIv(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(ownerPw, ks, u48), fileKey)
    (o, oe)
  }

  /** Algorithm 10: /Perms — P sign-extended to 64 bits LE, 'T' (metadata
    * encrypted), "adb", 4 free bytes, AES-256-ECB under the file key. */
  def perms6(fileKey: Array[Byte], p: Int): Array[Byte] = {
    val b = new Array[Byte](16)
    var i = 0
    var v = p.toLong // sign-extension supplies the spec's all-ones high word
    while (i < 8) { b(i) = (v & 0xff).toByte; v >>= 8; i += 1 }
    b(8) = 'T'; b(9) = 'a'; b(10) = 'd'; b(11) = 'b'
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    c.doFinal(b)
  }

  /** Algorithm 11 + the /UE unwrap: validate a USER password (empty by
    * default — the common open-web case) against /U and recover the
    * 32-byte file key. None on mismatch or malformed vectors. R=6
    * passwords are UTF-8 bytes (callers should pass ≤127 bytes; full
    * SASLprep normalization is out of scope — ASCII passwords, the
    * overwhelming real-world case, are unaffected). */
  def fileKey6(u48: Array[Byte], ue32: Array[Byte], r5: Boolean,
               userPw: Array[Byte] = Array.empty): Option[Array[Byte]] = {
    if (u48.length < 48 || ue32.length != 32) return None
    val hash = java.util.Arrays.copyOfRange(u48, 0, 32)
    val vs = java.util.Arrays.copyOfRange(u48, 32, 40)
    val ks = java.util.Arrays.copyOfRange(u48, 40, 48)
    if (!java.security.MessageDigest.isEqual(
          hash2B(userPw, vs, Array.empty, r5), hash)) None
    else Some(aesNoIv(javax.crypto.Cipher.DECRYPT_MODE,
      hash2B(userPw, ks, Array.empty, r5), ue32))
  }

  /** Algorithm 12 + the /OE unwrap: validate an OWNER password against /O
    * (whose hashes fold in the full 48-byte /U — see [[o6Values]]) and
    * recover the 32-byte file key from /OE. */
  def fileKey6Owner(o48: Array[Byte], oe32: Array[Byte], u48: Array[Byte],
                    r5: Boolean, ownerPw: Array[Byte]): Option[Array[Byte]] = {
    if (o48.length < 48 || oe32.length != 32 || u48.length < 48) return None
    val u = java.util.Arrays.copyOfRange(u48, 0, 48)
    val hash = java.util.Arrays.copyOfRange(o48, 0, 32)
    val vs = java.util.Arrays.copyOfRange(o48, 32, 40)
    val ks = java.util.Arrays.copyOfRange(o48, 40, 48)
    if (!java.security.MessageDigest.isEqual(
          hash2B(ownerPw, vs, u, r5), hash)) None
    else Some(aesNoIv(javax.crypto.Cipher.DECRYPT_MODE,
      hash2B(ownerPw, ks, u, r5), oe32))
  }
}
