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
  * emit an embedding). Audio/video codecs don't ship in the JDK, so those
  * payloads ride a tiny self-describing container ("GMB" — graft media blob)
  * whose decode is a clearly-marked deterministic stand-in. Either way the
  * Spark side is identical and fully tested: binary-column schema, typed
  * `Dataset` map (the Scala analog of a `mapInPandas` decode batch),
  * partitioning, and the metadata/feature schema a downstream trainer reads.
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
      format: String,   // "png" | "jpeg" | "bmp" | "image" | "audio" | "video" | "unknown"
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

  /** Deterministic media blob for media id `i` — a pure function of
    * (seed, i), same generator discipline as [[Corpus.page]]. Half the ids
    * carry REAL encoded images (PNG — gray or RGB —, JPEG, BMP, written with
    * the same `javax.imageio` codecs that decode them); the rest carry GMB
    * containers standing in for audio/video (and a residual GMB "image" so
    * the container path stays exercised). */
  def blob(i: Long, seed: Long = 42L): Array[Byte] = {
    val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL)
    rng.nextLong()
    val kind = rng.nextInt(10)
    if (kind < 5) {
      // GMB: 0 → legacy image container, 1-2 → audio, 3-4 → video
      val fmt = if (kind == 0) 0 else if (kind <= 2) 1 else 2
      gmbBlob(rng, fmt)
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
    else if (bytes.length >= 3 && bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
        bytes(2) == Magic(2)) "gmb"
    else "unknown"

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
      case "unknown" => MediaMeta(mediaId, "unknown", 0, 0, 0,
        bytes.length.toLong, Vector.empty, "bad_magic")
      case fmt => decodeImage(mediaId, bytes, fmt)
    }
  }
}
