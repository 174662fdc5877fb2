package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder-prompt
  * extension): media travel as opaque `BINARY` columns with typed metadata;
  * decode / feature-extraction runs batched per partition so per-task model
  * initialization amortizes — the Scala analogue of the Python
  * `mapInPandas` pattern.
  *
  * Image decode is REAL: `decodeImageFeatures` runs the JDK's
  * `javax.imageio` readers (PNG/JPEG/GIF ship with the JVM — no external
  * codec) and derives features from actual pixels. Modalities the JDK has
  * no codec for (audio/video containers) fall back to
  * `byteBlockFeatures`, a deterministic payload-derived vector of the same
  * shape, so downstream consumers stay modality-agnostic.
  *
  * Scale: rows carry megabyte-class payloads, so operators avoid shuffling
  * content — metadata projections are narrow, and feature extraction
  * reduces binary to small vectors BEFORE any wide operation. Partition
  * sizing should target bytes (`spark.sql.files.maxPartitionBytes`), not
  * row counts.
  */
object MultimodalOps {

  /** One media row: id + modality tag + raw bytes + source URI. */
  case class MediaRow(media_id: Long, modality: String, content: Array[Byte],
                      uri: String)

  /** Extracted features: id + shape metadata + a fixed-dim feature vector.
    * width/height come from real header parsing (imageDimensions); -1 when
    * the payload is not a parseable image.
    */
  case class MediaFeatures(media_id: Long, modality: String, n_bytes: Long,
                           format: String, width: Int, height: Int,
                           features: Array[Double])

  /** Magic-byte container sniffing — pure column expression (no UDF):
    * first bytes → format tag. Covers the classic signatures; unknown
    * payloads tag "bin".
    */
  def sniffFormat(content: Column): Column = {
    val head = hex(substring(content, 1, 4))
    when(head.startsWith("89504E47"), "png")
      .when(head.startsWith("FFD8FF"), "jpeg")
      .when(head.startsWith("47494638"), "gif")
      .when(head.startsWith("52494646"), "riff") // wav/avi containers
      .when(head.startsWith("1A45DFA3"), "mkv")
      .when(head.startsWith("66747970"), "mp4") // ftyp at offset 4 handled below
      .when(hex(substring(content, 5, 4)).startsWith("66747970"), "mp4")
      .otherwise("bin")
  }

  /** Metadata projection over a binary media frame: byte size, format,
    * content hash (for exact dedup of media). All narrow expressions.
    */
  def withMetadata(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("content")).cast("long"))
      .withColumn("format", sniffFormat(col("content")))
      .withColumn("content_hash", xxhash64(col("content")))

  /** Feature dimension of both feature extractors. */
  val FeatureDim = 8

  /** Decompression-bomb guard: maximum pixels a payload may DECLARE before
    * decode is refused. A full decode allocates ~4 bytes/pixel, and the
    * resulting OutOfMemoryError is not NonFatal — it would escape the
    * fallback and kill the executor, which a hostile/corrupt image in an
    * untrusted 100 TB corpus must never be able to do. 2^24 pixels
    * (4096×4096, ~64 MB decoded) bounds per-task decode memory even with
    * every executor thread decoding at once.
    */
  val MaxDecodePixels: Long = 1L << 24

  /** Real pixel decode via the JDK's `javax.imageio` (PNG/JPEG/GIF
    * readers ship with the JVM). Features: per-channel mean and stddev
    * (R, G, B) then luminance mean and stddev, all in [0,1]. None when
    * ImageIO has no reader for the payload (non-image modality, corrupt
    * or truncated bytes) OR when the header declares more than
    * [[MaxDecodePixels]] — dimensions are read from the header alone
    * (`ImageReader.getWidth/getHeight` decode no pixel data), so the
    * bomb is rejected before any allocation. Callers fall back to
    * [[byteBlockFeatures]].
    */
  def decodeImageFeatures(bytes: Array[Byte]): Option[Array[Double]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (readers == null || !readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
          else Some(pixelFeatures(reader.read(0)))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Mean/stddev of R, G, B and Rec.601 luminance over a bounded pixel
    * sample: large images are grid-subsampled to ~1M pixels so per-row
    * feature cost is bounded regardless of resolution — at 100 TB the
    * decode dominates; the feature pass must never be the surprise.
    */
  def pixelFeatures(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val stride =
      math.max(1L, math.round(math.sqrt(w.toLong * h / 1048576.0))).toInt
    var n = 0L
    var sr, sg, sb, sl, sr2, sg2, sb2, sl2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = ((rgb >> 16) & 0xff) / 255.0
        val g = ((rgb >> 8) & 0xff) / 255.0
        val b = (rgb & 0xff) / 255.0
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l
        sr2 += r * r; sg2 += g * g; sb2 += b * b; sl2 += l * l
        n += 1
        x += stride
      }
      y += stride
    }
    def std(s: Double, s2: Double): Double =
      math.sqrt(math.max(0.0, s2 / n - (s / n) * (s / n)))
    Array(sr / n, sg / n, sb / n, std(sr, sr2), std(sg, sg2), std(sb, sb2),
      sl / n, std(sl, sl2))
  }

  /** Deterministic byte-derived features for modalities the JDK cannot
    * decode (audio/video containers, unknown payloads): block-averaged
    * byte values normalized to [0,1]. Same dimension as [[pixelFeatures]]
    * so downstream consumers (ANN, clustering) are modality-agnostic.
    */
  def byteBlockFeatures(bytes: Array[Byte]): Array[Double] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(FeatureDim)(0.0)
    val block = math.max(1, bytes.length / FeatureDim)
    Array.tabulate(FeatureDim) { i =>
      val from = i * block
      val until = math.min(bytes.length, from + block)
      if (from >= bytes.length) 0.0
      else {
        var s = 0L
        var j = from
        while (j < until) { s += bytes(j) & 0xff; j += 1 }
        s.toDouble / ((until - from) * 255.0)
      }
    }
  }

  /** Batched per-partition feature extraction: the model/codec is
    * initialized once per partition (the expensive step a real decoder
    * amortizes), then rows stream through it. Typed Dataset API keeps
    * encoders explicit.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init: decode from in-memory byte arrays, never
      // through ImageIO's tmp-file cache
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val fmt = sniffFormatBytes(r.content)
        val dims = imageDimensions(r.content)
        MediaFeatures(r.media_id, r.modality,
          if (r.content == null) 0L else r.content.length.toLong,
          fmt, dims.fold(-1)(_._1), dims.fold(-1)(_._2),
          decodeImageFeatures(r.content).getOrElse(byteBlockFeatures(r.content)))
      }
    }
  }

  /** REAL image dimension parsing from container headers — no codec
    * needed, so unlike pixel decoding this is not stubbed:
    *   - PNG: IHDR width/height, big-endian u32 at offsets 16/20;
    *   - GIF: logical screen size, little-endian u16 at offsets 6/8;
    *   - JPEG: walk the marker stream to the first SOF0/1/2 frame header
    *     (height then width, big-endian u16 after the precision byte).
    * Returns None for other formats or truncated/malformed headers. Runs
    * in the per-partition typed path beside the real pixel decoder.
    */
  def imageDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = if (b != null && i < b.length) b(i) & 0xff else -1
    def beU32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def beU16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    sniffFormatBytes(b) match {
      case "png" if b.length >= 24 &&
        // bytes 12-15 must name the IHDR chunk (it is mandatory-first)
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R' =>
        Some((beU32(16).toInt, beU32(20).toInt))
      case "gif" if b.length >= 10 =>
        Some((leU16(6), leU16(8)))
      case "jpeg" =>
        // segments: FF marker len_hi len_lo payload... until SOS/EOI
        var i = 2
        while (i + 3 < b.length && u8(i) == 0xff) {
          val marker = u8(i + 1)
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
            // len(2) precision(1) height(2) width(2)
            return if (i + 9 <= b.length)
              Some((beU16(i + 7), beU16(i + 5))) else None
          }
          if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
          else if (marker == 0xda || marker == 0xd9) return None // SOS/EOI
          else i += 2 + beU16(i + 2)
        }
        None
      case _ => None
    }
  }

  /** Big-endian unsigned int from `len` bytes of a binary column at
    * 1-based byte position `pos` — hex + conv keeps it codegen'd.
    */
  private def beUInt(content: Column, pos: Int, len: Int): Column =
    conv(hex(substring(content, pos, len)), 16, 10).cast("long")

  /** Little-endian u16 at 1-based byte position `pos`: swap the two hex
    * byte pairs before parsing.
    */
  private def leU16(content: Column, pos: Int): Column = {
    val hx = hex(substring(content, pos, 2))
    conv(concat(substring(hx, 3, 2), substring(hx, 1, 2)), 16, 10).cast("long")
  }

  /** Little-endian u32 at 1-based byte position `pos`: reverse the four
    * hex byte pairs before parsing.
    */
  private def leU32(content: Column, pos: Int): Column = {
    val hx = hex(substring(content, pos, 4))
    conv(concat(substring(hx, 7, 2), substring(hx, 5, 2),
      substring(hx, 3, 2), substring(hx, 1, 2)), 16, 10).cast("long")
  }

  /** Canonical-layout RIFF/WAVE PCM header parse (the public WAV spec:
    * RIFF size, "WAVE", a 16-byte "fmt " chunk, then "data"). Like
    * [[headerDims]]'s mandatory-first-IHDR simplification, only the
    * canonical chunk order is parsed — a payload with extension chunks
    * between fmt and data reports -1s rather than a wrong parse (the
    * chunk-walking general case needs a loop no fixed-offset expression
    * can express, same boundary as JPEG marker walking). All fields stay
    * substring/hex/conv expressions inside whole-stage codegen.
    *
    * Returns (audio_format, channels, sample_rate, byte_rate,
    * block_align, bits_per_sample, data_size), each -1 when the payload
    * is not canonical WAVE.
    */
  def wavPcmHeader(content: Column): Seq[(String, Column)] = {
    val ok = length(content) >= 44 &&
      hex(substring(content, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(content, 9, 4)) === "57415645" && // "WAVE"
      hex(substring(content, 13, 4)) === "666D7420" && // "fmt "
      leU32(content, 17) === 16L && // PCM fmt chunk length
      hex(substring(content, 37, 4)) === "64617461" // "data"
    def f(c: Column): Column = when(ok, c).otherwise(lit(-1L))
    Seq(
      "audio_format" -> f(leU16(content, 21)),
      "channels" -> f(leU16(content, 23)),
      "sample_rate" -> f(leU32(content, 25)),
      "byte_rate" -> f(leU32(content, 29)),
      "block_align" -> f(leU16(content, 33)),
      "bits_per_sample" -> f(leU16(content, 35)),
      "data_size" -> f(leU32(content, 41)))
  }

  /** ISO-BMFF (MP4) movie-header parse (the public MPEG-4 Part 12 box
    * format). One step past the fixed-offset WAV/PNG parses: the box walk
    * is DYNAMIC — the ftyp box length is read from the payload and the
    * moov/mdat offsets computed from it (`Column.substr` accepts column
    * offsets, so the hops stay one codegen'd expression). Still bounded:
    * the canonical top-level order ftyp → moov(mvhd first, version 0) →
    * mdat is parsed, and anything else reports -1s rather than a wrong
    * parse — arbitrary-depth box recursion needs a loop, the same
    * expression boundary as JPEG marker walking (the general walker would
    * be a per-partition JVM pass like [[imageDimensions]]).
    *
    * Returns (major_brand, timescale, duration, data_size): brand '' and
    * numerics -1 when the payload is not canonical MP4. duration is in
    * timescale ticks — `duration * 1000 div timescale` is the exact
    * integral milliseconds (q60f derives it downstream).
    */
  def mp4Header(content: Column): Seq[(String, Column)] = {
    def beU32At(pos: Column): Column =
      conv(hex(content.substr(pos, lit(4))), 16, 10).cast("long")
    def typeAt(pos: Column): Column = hex(content.substr(pos, lit(4)))
    val ftypSize = beU32At(lit(1L))
    val moovPos = lit(1L) + ftypSize // 1-based offsets throughout
    val mvhdPos = moovPos + lit(8L)
    val mdatPos = moovPos + beU32At(moovPos)
    val ok = length(content) >= 28 &&
      typeAt(lit(5L)) === "66747970" && // 'ftyp'
      ftypSize >= 16L && ftypSize < length(content) &&
      typeAt(moovPos + 4) === "6D6F6F76" && // 'moov'
      typeAt(mvhdPos + 4) === "6D766864" && // 'mvhd'
      beU32At(mvhdPos + 8) === 0L && // version 0, flags 0
      typeAt(mdatPos + 4) === "6D646174" // 'mdat'
    def f(c: Column): Column = when(ok, c).otherwise(lit(-1L))
    Seq(
      "major_brand" -> when(ok, decode(content.substr(lit(9L), lit(4L)), "UTF-8"))
        .otherwise(lit("")),
      "timescale" -> f(beU32At(mvhdPos + 20)),
      "duration" -> f(beU32At(mvhdPos + 24)),
      "data_size" -> f(beU32At(mdatPos) - 8L))
  }

  /** Column-expression twin of [[imageDimensions]] for the fixed-offset
    * containers — PNG (IHDR, big-endian u32) and GIF (logical screen,
    * little-endian u16) parse with substring/hex/conv and stay inside
    * whole-stage codegen; JPEG needs marker walking, so it remains
    * JVM-path-only (-1 here, like every other non-parseable format).
    * Returns (width, height), each -1 when not parseable — same contract
    * as imageDimensions' None.
    */
  def headerDims(content: Column, format: Column): (Column, Column) = {
    val pngOk = format === "png" && length(content) >= 24 &&
      hex(substring(content, 13, 4)) === "49484452" // mandatory-first IHDR
    val gifOk = format === "gif" && length(content) >= 10
    val w = when(pngOk, beUInt(content, 17, 4))
      .when(gifOk, leU16(content, 7)).otherwise(lit(-1L))
    val h = when(pngOk, beUInt(content, 21, 4))
      .when(gifOk, leU16(content, 9)).otherwise(lit(-1L))
    (w, h)
  }

  /** JVM-side twin of sniffFormat for the typed path. */
  def sniffFormatBytes(b: Array[Byte]): String = {
    def at(i: Int): Int = if (b != null && b.length > i) b(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 0x50 && at(2) == 0x4e && at(3) == 0x47) "png"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "jpeg"
    else if (at(0) == 0x47 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x38) "gif"
    else if (at(0) == 0x52 && at(1) == 0x49 && at(2) == 0x46 && at(3) == 0x46) "riff"
    else if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf && at(3) == 0xa3) "mkv"
    else if (at(4) == 0x66 && at(5) == 0x74 && at(6) == 0x79 && at(7) == 0x70) "mp4"
    else "bin"
  }

  /** Frame/segment sampling stub: every `stride`-th fixed-size block of the
    * payload as one "frame" row `(media_id, frame_id, frame BINARY)` —
    * the shape of video frame-sampling, expressed with explode over
    * computed offsets (narrow; no UDF).
    */
  def sampleFrames(media: DataFrame, blockSize: Int, stride: Int): DataFrame = {
    val step = blockSize * stride
    media
      .select(col("media_id"), col("content"),
        length(col("content")).cast("long").as("len"))
      .where(col("len") >= blockSize)
      .select(col("media_id"), col("content"),
        explode(sequence(lit(0L), expr(s"(len - $blockSize) div $step")))
          .as("frame_id"))
      .select(col("media_id"), col("frame_id"),
        expr(s"substring(content, CAST(frame_id * $step + 1 AS INT), $blockSize)")
          .as("frame"))
  }
}
