package graft.kernel

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns with typed metadata.
  *
  * Real codecs (JPEG/PNG/ffmpeg) don't ship in this environment, so the
  * decode step is a clearly-marked deterministic stand-in over a tiny
  * self-describing container format ("GMB" — graft media blob). What IS real
  * and tested is everything Spark-side: the binary-column schema, the typed
  * `Dataset` map (the Scala analog of a `mapInPandas` decode), batch shape,
  * partitioning, and the metadata/feature schema a downstream trainer reads.
  *
  * Swapping in a real decoder = replacing [[decode]]'s body; no plumbing
  * changes.
  */
object Multimodal {

  /** Typed metadata + features for one media payload. `failure` mirrors the
    * extraction failure-taxonomy convention (never throw in the data plane). */
  final case class MediaMeta(
      mediaId: Long,
      format: String,   // "image" | "audio" | "video" | "unknown"
      width: Int,
      height: Int,
      channels: Int,
      nBytes: Long,
      // Deterministic stand-in for a decoded feature vector (per-channel
      // payload byte means); a real pipeline would emit an embedding here.
      features: Vector[Double],
      failure: String)

  private val Magic: Array[Byte] = Array('G'.toByte, 'M'.toByte, 'B'.toByte)
  private val formats = Vector("image", "audio", "video")

  /** Deterministic fake media blob for media id `i`: 3-byte magic, format
    * code, u16 width/height, u8 channels, then a pseudo-random payload whose
    * content is a pure function of `i` (same generator discipline as
    * [[Corpus.page]]). */
  def blob(i: Long, seed: Long = 42L): Array[Byte] = {
    val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + i * 0xC2B2AE3D27D4EB4FL)
    rng.nextLong()
    val fmt = rng.nextInt(3)
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

  /** STUB DECODE — deterministic parse of the GMB container. A production
    * build replaces this with the real image/audio/video decoder; the
    * signature (bytes in, typed meta + features out, failure taxonomy, no
    * exceptions) is the stable contract the Spark plumbing relies on. */
  def decode(mediaId: Long, bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 9)
      return MediaMeta(mediaId, "unknown", 0, 0, 0,
        if (bytes == null) 0L else bytes.length.toLong, Vector.empty, "truncated")
    if (bytes(0) != Magic(0) || bytes(1) != Magic(1) || bytes(2) != Magic(2))
      return MediaMeta(mediaId, "unknown", 0, 0, 0, bytes.length.toLong,
        Vector.empty, "bad_magic")
    val fmt = formats.lift(bytes(3).toInt).getOrElse("unknown")
    val w = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    val h = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val ch = bytes(8) & 0xff
    // per-channel byte means over the payload, round-robin channel layout —
    // integer sums, single final division: deterministic
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
}
