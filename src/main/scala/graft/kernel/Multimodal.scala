package graft.kernel

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata.
  *
  * IMAGE decode is REAL: PNG/JPEG/BMP bytes are sniffed by magic number and
  * decoded with the JDK's `javax.imageio` codecs (zero extra dependencies) —
  * width/height/channel count from the decoded raster and per-channel pixel
  * means as the deterministic feature stand-in (a production pipeline would
  * emit an embedding).
  *
  * AUDIO and VIDEO are REAL CONTAINERS too: audio payloads are RIFF/WAVE
  * files (PCM16LE, written and parsed byte-for-byte against the canonical
  * 44-byte header + chunk walk — no codec library needed for PCM), video
  * payloads are RIFF/AVI files (LIST hdrl → avih MainAVIHeader → LIST movi),
  * both parsed by a pure-JDK chunk walker. Only the COMPRESSED codecs (mp3,
  * h264…) are genuinely out of reach without native libs; a residual "GMB"
  * container (graft media blob) remains in the mix as the documented
  * stand-in for those, so the unknown-container path stays exercised.
  * Either way the Spark side is identical and fully tested: binary-column
  * schema, typed `Dataset` map (the Scala analog of a `mapInPandas` decode
  * batch), partitioning, and the metadata/feature schema a downstream
  * trainer reads.
  */
object Multimodal {

  // the JDK image codecs run headless; disable ImageIO's disk cache so
  // executor threads never contend on temp files
  locally {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  /** Typed metadata + features for one media payload. `failure` mirrors the
    * extraction failure-taxonomy convention (never throw in the data plane). */
  final case class MediaMeta(
      mediaId: Long,
      format: String,   // "png" | "jpeg" | "bmp" | "wav" | "avi" | "image" | "audio" | "video" | "unknown"
                        // ("audio"/"video" only from legacy GMB containers)
      width: Int,
      height: Int,
      channels: Int,
      nBytes: Long,
      // Deterministic feature stand-in: per-channel pixel means for real
      // images, per-channel payload byte means for GMB containers.
      features: Vector[Double],
      failure: String)

  private val Magic: Array[Byte] = Array('G'.toByte, 'M'.toByte, 'B'.toByte)
  private val gmbFormats = Vector("image", "audio", "video")

  private def rgbImage(rng: java.util.Random, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) { r.setSample(x, y, c, rng.nextInt(256)); c += 1 }
        x += 1
      }
      y += 1
    }
    img
  }

  private def grayImage(rng: java.util.Random, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, rng.nextInt(256)); x += 1 }
      y += 1
    }
    img
  }

  private def encodeImage(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(1024)
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  /** GMB container: 3-byte magic, format code, u16 width/height, u8 channels,
    * then a pseudo-random payload. */
  private def gmbBlob(rng: java.util.Random, fmt: Int): Array[Byte] = {
    val w = 16 + rng.nextInt(1024)
    val h = 16 + rng.nextInt(1024)
    val ch = 1 + rng.nextInt(4)
    val payloadLen = 64 + rng.nextInt(4096)
    val out = new Array[Byte](3 + 1 + 2 + 2 + 1 + payloadLen)
    System.arraycopy(Magic, 0, out, 0, 3)
    out(3) = fmt.toByte
    out(4) = ((w >> 8) & 0xff).toByte; out(5) = (w & 0xff).toByte
    out(6) = ((h >> 8) & 0xff).toByte; out(7) = (h & 0xff).toByte
    out(8) = ch.toByte
    var j = 9
    while (j < out.length) { out(j) = rng.nextInt(256).toByte; j += 1 }
    out
  }

  // ---- little-endian writers/readers for the RIFF family ----
  private def w16(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = (v & 0xff).toByte; b(at + 1) = ((v >> 8) & 0xff).toByte
  }
  private def w32(b: Array[Byte], at: Int, v: Int): Unit = {
    b(at) = (v & 0xff).toByte; b(at + 1) = ((v >> 8) & 0xff).toByte
    b(at + 2) = ((v >> 16) & 0xff).toByte; b(at + 3) = ((v >> 24) & 0xff).toByte
  }
  private def wTag(b: Array[Byte], at: Int, tag: String): Unit = {
    var k = 0; while (k < 4) { b(at + k) = tag.charAt(k).toByte; k += 1 }
  }
  private def r16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def r32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
    ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
  private def tagAt(b: Array[Byte], at: Int, tag: String): Boolean =
    at + 4 <= b.length && b(at) == tag.charAt(0).toByte &&
      b(at + 1) == tag.charAt(1).toByte && b(at + 2) == tag.charAt(2).toByte &&
      b(at + 3) == tag.charAt(3).toByte

  /** A REAL RIFF/WAVE file: canonical 44-byte header (fmt chunk, PCM16LE) +
    * random signed samples. */
  private def wavBlob(rng: java.util.Random): Array[Byte] = {
    val ch = 1 + rng.nextInt(2)
    val sampleRate = Vector(8000, 16000, 22050, 44100)(rng.nextInt(4))
    val nFrames = 64 + rng.nextInt(2048)
    val dataLen = nFrames * ch * 2
    val out = new Array[Byte](44 + dataLen)
    wTag(out, 0, "RIFF"); w32(out, 4, 36 + dataLen); wTag(out, 8, "WAVE")
    wTag(out, 12, "fmt "); w32(out, 16, 16)
    w16(out, 20, 1) // PCM
    w16(out, 22, ch); w32(out, 24, sampleRate)
    w32(out, 28, sampleRate * ch * 2); w16(out, 32, ch * 2); w16(out, 34, 16)
    wTag(out, 36, "data"); w32(out, 40, dataLen)
    var at = 44
    var k = 0
    while (k < nFrames * ch) {
      w16(out, at, rng.nextInt(65536)); at += 2; k += 1
    }
    out
  }

  /** A REAL RIFF/AVI skeleton: LIST hdrl with a 56-byte `avih`
    * MainAVIHeader, then LIST movi carrying the (opaque) frame payload. */
  private def aviBlob(rng: java.util.Random): Array[Byte] = {
    val streams = 1 + rng.nextInt(2)
    val w = 64 + rng.nextInt(1920)
    val h = 64 + rng.nextInt(1080)
    val frames = 8 + rng.nextInt(240)
    val payloadLen = 256 + rng.nextInt(4096)
    val hdrlLen = 4 + 8 + 56          // "hdrl" + "avih"+size + header
    val moviLen = 4 + payloadLen      // "movi" + payload
    val out = new Array[Byte](12 + 8 + hdrlLen + 8 + moviLen)
    var at = 0
    wTag(out, at, "RIFF"); w32(out, at + 4, out.length - 8); wTag(out, at + 8, "AVI "); at += 12
    wTag(out, at, "LIST"); w32(out, at + 4, hdrlLen); wTag(out, at + 8, "hdrl"); at += 12
    wTag(out, at, "avih"); w32(out, at + 4, 56); at += 8
    w32(out, at, 33333)               // dwMicroSecPerFrame (~30 fps)
    w32(out, at + 4, 0); w32(out, at + 8, 0); w32(out, at + 12, 0)
    w32(out, at + 16, frames)         // dwTotalFrames
    w32(out, at + 20, 0)
    w32(out, at + 24, streams)        // dwStreams
    w32(out, at + 28, 0)
    w32(out, at + 32, w); w32(out, at + 36, h)
    w32(out, at + 40, 0); w32(out, at + 44, 0); w32(out, at + 48, 0); w32(out, at + 52, 0)
    at += 56
    wTag(out, at, "LIST"); w32(out, at + 4, moviLen); wTag(out, at + 8, "movi"); at += 12
    while (at < out.length) { out(at) = rng.nextInt(256).toByte; at += 1 }
    out
  }

  /** Deterministic media blob for media id `i` — a pure function of
    * (seed, i), same generator discipline as [[Corpus.page]]. Half the ids
    * carry REAL encoded images (PNG — gray or RGB —, JPEG, BMP, written with
    * the same `javax.imageio` codecs that decode them); audio ids carry real
    * RIFF/WAVE PCM16 files, video ids real RIFF/AVI skeletons, and a
    * residual GMB container keeps the opaque-container path exercised. */
  def blob(i: Long, seed: Long = 42L): Array[Byte] = {
    val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL)
    rng.nextLong()
    val kind = rng.nextInt(10)
    if (kind < 5) {
      kind match {
        case 0 => gmbBlob(rng, 0)
        case 1 | 2 => wavBlob(rng)
        case _ => aviBlob(rng)
      }
    } else {
      val w = 8 + rng.nextInt(32)
      val h = 8 + rng.nextInt(32)
      kind match {
        case 5 => encodeImage(grayImage(rng, w, h), "png")
        case 6 => encodeImage(rgbImage(rng, w, h), "png")
        case 7 => encodeImage(rgbImage(rng, w, h), "jpg")
        case _ => encodeImage(rgbImage(rng, w, h), "bmp")
      }
    }
  }

  /** Magic-number sniff — the source-router analog for media payloads. */
  def sniff(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 12 && tagAt(bytes, 0, "RIFF") && tagAt(bytes, 8, "WAVE")) "wav"
    else if (bytes.length >= 12 && tagAt(bytes, 0, "RIFF") && tagAt(bytes, 8, "AVI ")) "avi"
    else if (bytes.length >= 3 && bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
        bytes(2) == Magic(2)) "gmb"
    else "unknown"

  /** REAL RIFF/WAVE parse: chunk walk to `fmt ` and `data`, then per-channel
    * means over the signed PCM16LE samples. `width` carries the sample rate
    * and `height` the frame count (the schema's spatial slots repurposed per
    * modality, documented in the column contract). Non-PCM or non-16-bit
    * audio lands in the failure taxonomy as `unsupported_codec`. */
  private def decodeWav(mediaId: Long, b: Array[Byte]): MediaMeta = {
    // Long cursor: `at + 8 + len` can exceed Int.MaxValue on a multi-GB
    // payload even when len itself passes the <= b.length guard
    var atL = 12L
    var ch = 0; var rate = 0; var bits = 0; var codec = 0
    var dataAt = -1; var dataLen = 0
    while (atL + 8 <= b.length) {
      val at = atL.toInt
      val len = r32(b, at + 4)
      // a declared length beyond the payload is corrupt; it would also
      // overflow `at` into negative territory and break the walk's bounds
      if (len < 0 || len > b.length)
        return MediaMeta(mediaId, "wav", 0, 0, 0, b.length.toLong,
          Vector.empty, "decode_error")
      if (tagAt(b, at, "fmt ") && at + 8 + 16 <= b.length) {
        codec = r16(b, at + 8); ch = r16(b, at + 10)
        rate = r32(b, at + 12); bits = r16(b, at + 22)
      } else if (tagAt(b, at, "data")) {
        dataAt = at + 8; dataLen = math.min(len, b.length - dataAt)
      }
      atL += 8L + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (ch <= 0 || dataAt < 0)
      return MediaMeta(mediaId, "wav", 0, 0, 0, b.length.toLong,
        Vector.empty, "decode_error")
    if (codec != 1 || bits != 16)
      return MediaMeta(mediaId, "wav", rate, 0, ch, b.length.toLong,
        Vector.empty, "unsupported_codec")
    val nFrames = dataLen / (2 * ch)
    val sums = new Array[Long](ch)
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < ch) {
        sums(c) += r16(b, dataAt + (f * ch + c) * 2).toShort // signed PCM
        c += 1
      }
      f += 1
    }
    val feats = sums.map(s => if (nFrames == 0) 0.0 else s.toDouble / nFrames).toVector
    MediaMeta(mediaId, "wav", rate, nFrames, ch, b.length.toLong, feats, "")
  }

  /** REAL RIFF/AVI parse: find the `avih` MainAVIHeader (pixel geometry,
    * stream count, total frames — the header must be present and sane), then
    * per-stream byte means over the `movi` payload as the feature stand-in
    * for the still-opaque compressed frames. */
  private def decodeAvi(mediaId: Long, b: Array[Byte]): MediaMeta = {
    var atL = 12L // Long cursor — same overflow rationale as decodeWav
    var w = 0; var h = 0; var streams = 0; var frames = -1
    var moviAt = -1; var moviLen = 0
    while (atL + 8 <= b.length) {
      val at = atL.toInt
      val len = r32(b, at + 4)
      // same corrupt-length/overflow guard as the WAV walk
      if (len < 0 || len > b.length)
        return MediaMeta(mediaId, "avi", 0, 0, 0, b.length.toLong,
          Vector.empty, "decode_error")
      if (tagAt(b, at, "LIST") && at + 12 <= b.length) {
        if (tagAt(b, at + 8, "movi")) {
          // record the payload and SKIP it — frame bytes are not chunks
          moviAt = at + 12; moviLen = math.max(0, math.min(len - 4, b.length - moviAt))
          atL += 8L + len + (len & 1)
        } else atL += 12 // descend into hdrl-style LIST bodies
      } else {
        if (tagAt(b, at, "avih") && at + 8 + 56 <= b.length) {
          frames = r32(b, at + 8 + 16)
          streams = r32(b, at + 8 + 24)
          w = r32(b, at + 8 + 32); h = r32(b, at + 8 + 36)
        }
        atL += 8L + len + (len & 1)
      }
    }
    if (streams <= 0 || frames < 0)
      return MediaMeta(mediaId, "avi", 0, 0, 0, b.length.toLong,
        Vector.empty, "decode_error")
    val nCh = math.max(1, streams)
    val sums = new Array[Long](nCh)
    val counts = new Array[Long](nCh)
    if (moviAt >= 0) {
      var j = 0
      while (j < moviLen) {
        val c = j % nCh
        sums(c) += (b(moviAt + j) & 0xff); counts(c) += 1
        j += 1
      }
    }
    val feats = sums.indices.map(c =>
      if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c)).toVector
    MediaMeta(mediaId, "avi", w, h, streams, b.length.toLong, feats, "")
  }

  /** REAL image decode via the JDK codecs: raster width/height/bands plus
    * per-channel pixel means (integer sample sums, one final division —
    * deterministic). Decode failures become taxonomy rows, never throws. */
  private def decodeImage(mediaId: Long, bytes: Array[Byte], fmt: String): MediaMeta = {
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null)
        return MediaMeta(mediaId, fmt, 0, 0, 0, bytes.length.toLong,
          Vector.empty, "decode_error")
      val r = img.getRaster
      val ch = r.getNumBands
      val sums = new Array[Long](ch)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var c = 0
          while (c < ch) { sums(c) += r.getSample(x, y, c); c += 1 }
          x += 1
        }
        y += 1
      }
      val nPix = img.getWidth.toLong * img.getHeight
      val feats = sums.map(s => if (nPix == 0) 0.0 else s.toDouble / nPix).toVector
      MediaMeta(mediaId, fmt, img.getWidth, img.getHeight, ch,
        bytes.length.toLong, feats, "")
    } catch {
      case _: Exception =>
        MediaMeta(mediaId, fmt, 0, 0, 0, bytes.length.toLong,
          Vector.empty, "decode_error")
    }
  }

  /** GMB container decode — the documented audio/video stand-in (no JDK
    * codec exists for those): header metadata + per-channel payload byte
    * means, round-robin channel layout. */
  private def decodeGmb(mediaId: Long, bytes: Array[Byte]): MediaMeta = {
    val fmt = gmbFormats.lift(bytes(3).toInt).getOrElse("unknown")
    val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val ch = bytes(8) & 0xff
    val sums = new Array[Long](math.max(1, ch))
    val counts = new Array[Long](math.max(1, ch))
    var j = 9
    while (j < bytes.length) {
      val c = (j - 9) % math.max(1, ch)
      sums(c) += (bytes(j) & 0xff)
      counts(c) += 1
      j += 1
    }
    val feats = sums.indices.map(c =>
      if (counts(c) == 0) 0.0 else sums(c).toDouble / counts(c)).toVector
    MediaMeta(mediaId, fmt, w, h, ch, bytes.length.toLong, feats, "")
  }

  /** Decode one media payload: magic-sniff, then the real JDK image decoder
    * for PNG/JPEG/BMP or the GMB container parse for audio/video. Contract:
    * bytes in, typed meta + features out, failure taxonomy, no exceptions. */
  def decode(mediaId: Long, bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 9)
      return MediaMeta(mediaId, "unknown", 0, 0, 0,
        if (bytes == null) 0L else bytes.length.toLong, Vector.empty, "truncated")
    sniff(bytes) match {
      case "gmb" => decodeGmb(mediaId, bytes)
      case "wav" => decodeWav(mediaId, bytes)
      case "avi" => decodeAvi(mediaId, bytes)
      case "unknown" => MediaMeta(mediaId, "unknown", 0, 0, 0,
        bytes.length.toLong, Vector.empty, "bad_magic")
      case fmt => decodeImage(mediaId, bytes, fmt)
    }
  }
}
