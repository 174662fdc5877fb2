package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: literal binary payloads for the sniffing/
  * metadata/frame plumbing, REAL encoded images (BufferedImage →
  * ImageIO.write bytes) for the pixel decode path.
  */
class MultimodalOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("wavPcmHeader parses a hand-built canonical WAV and rejects " +
      "non-canonical layouts") {
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val data = Array.fill[Byte](100)(7)
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 2 * 2) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    // a LIST chunk between fmt and data — legal WAV, not canonical layout
    val listed = wav.take(36) ++ "LIST".getBytes ++ le32(4) ++
      "INFO".getBytes ++ wav.drop(36)
    val rows = Seq((1L, wav), (2L, listed), (3L, data)).toDF("id", "content")
      .select(Seq(col("id")) ++
        MultimodalOps.wavPcmHeader(col("content")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("audio_format") == 1L)
    assert(rows(1L).getAs[Long]("channels") == 2L)
    assert(rows(1L).getAs[Long]("sample_rate") == 44100L)
    assert(rows(1L).getAs[Long]("byte_rate") == 176400L)
    assert(rows(1L).getAs[Long]("block_align") == 4L)
    assert(rows(1L).getAs[Long]("bits_per_sample") == 16L)
    assert(rows(1L).getAs[Long]("data_size") == 100L)
    // non-canonical and non-WAV payloads: every field -1, never a misparse
    for (id <- Seq(2L, 3L))
      assert(Seq("audio_format", "channels", "sample_rate", "byte_rate",
        "block_align", "bits_per_sample", "data_size")
        .forall(f => rows(id).getAs[Long](f) == -1L), id)
  }

  test("mp4Header parses a hand-built canonical MP4 and rejects " +
      "non-canonical layouts") {
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val data = "hello mp4 payload".getBytes("UTF-8")
    val mvhdPayload = be32(0) ++ be32(0) ++ be32(0) ++ // ver/flags, times
      be32(1200) ++ be32(3600) ++ // timescale, duration
      be32(0x00010000L) ++ Array[Byte](1, 0) ++ Array.fill[Byte](10)(0) ++
      (Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .flatMap(be32).toArray) ++
      Array.fill[Byte](24)(0) ++ be32(2)
    val mvhd = be32(8L + mvhdPayload.length) ++ "mvhd".getBytes ++ mvhdPayload
    val moov = be32(8L + mvhd.length) ++ "moov".getBytes ++ mvhd
    // a LONGER ftyp (extra compatible brand) proves the moov offset is
    // read from the payload, not assumed at 20
    val ftyp = be32(24) ++ "ftyp".getBytes ++ "mp42".getBytes ++ be32(0) ++
      "mp42".getBytes ++ "isom".getBytes
    val mdat = be32(8L + data.length) ++ "mdat".getBytes ++ data
    val good = ftyp ++ moov ++ mdat
    // free box between moov and mdat — legal MP4, not the canonical order
    val freed = ftyp ++ moov ++ (be32(8) ++ "free".getBytes) ++ mdat
    // moov whose first child is not mvhd
    val iodsFirst = ftyp ++ (be32(8L + 8 + mvhd.length) ++ "moov".getBytes ++
      be32(8) ++ "iods".getBytes ++ mvhd) ++ mdat
    val rows = Seq((1L, good), (2L, freed), (3L, iodsFirst), (4L, data))
      .toDF("id", "content")
      .select(Seq(col("id")) ++
        MultimodalOps.mp4Header(col("content")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[String]("major_brand") == "mp42")
    assert(rows(1L).getAs[Long]("timescale") == 1200L)
    assert(rows(1L).getAs[Long]("duration") == 3600L)
    assert(rows(1L).getAs[Long]("data_size") == data.length.toLong)
    for (id <- Seq(2L, 3L, 4L)) {
      assert(rows(id).getAs[String]("major_brand") == "", id)
      assert(Seq("timescale", "duration", "data_size")
        .forall(f => rows(id).getAs[Long](f) == -1L), id)
    }
  }

  /** Encode a solid-color (or two-tone) image to real container bytes. */
  private def encode(format: String, w: Int, h: Int,
                     rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgbAt(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 1, 2, 3, 4, 5, 6, 7, 8)
  private val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++
    Array.tabulate[Byte](20)(i => i.toByte)
  private val mp4 = Array[Byte](0, 0, 0, 0x18, 0x66, 0x74, 0x79, 0x70) ++
    Array.fill[Byte](8)(9)
  private val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)

  private def mediaDf = Seq(
    (1L, "image", png, "mem://a.png"),
    (2L, "image", jpeg, "mem://b.jpg"),
    (3L, "video", mp4, "mem://c.mp4"),
    (4L, "audio", junk, "mem://d.raw"))
    .toDF("media_id", "modality", "content", "uri")

  test("format sniffing via magic bytes, column and JVM twins agree") {
    val out = MultimodalOps.withMetadata(mediaDf)
      .select("media_id", "format", "n_bytes").orderBy("media_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("png", "jpeg", "mp4", "bin"))
    assert(out.map(_.getLong(2)).toSeq == Seq(12L, 24L, 16L, 64L))
    assert(MultimodalOps.sniffFormatBytes(png) == "png")
    assert(MultimodalOps.sniffFormatBytes(jpeg) == "jpeg")
    assert(MultimodalOps.sniffFormatBytes(mp4) == "mp4")
    assert(MultimodalOps.sniffFormatBytes(junk) == "bin")
  }

  test("content hash dedups identical payloads") {
    val dup = Seq((1L, png), (2L, png), (3L, jpeg)).toDF("media_id", "content")
    val hashes = MultimodalOps.withMetadata(
      dup.withColumn("modality", lit("image")).withColumn("uri", lit("")))
      .groupBy("content_hash").count().collect().map(_.getLong(1)).sorted
    assert(hashes.toSeq == Seq(1L, 2L))
  }

  test("typed per-partition feature extraction yields fixed-dim deterministic features") {
    import sqlImplicits._
    val ds = mediaDf.as[MultimodalOps.MediaRow]
    val feats = MultimodalOps.extractFeatures(ds).collect()
      .sortBy(_.media_id)
    assert(feats.length == 4)
    assert(feats.forall(_.features.length == MultimodalOps.FeatureDim))
    assert(feats.forall(_.features.forall(v => v >= 0.0 && v <= 1.0)))
    assert(feats.map(_.format).toSeq == Seq("png", "jpeg", "mp4", "bin"))
    // the 12-byte fake "png" has no decodable pixels: ImageIO returns no
    // reader, so the typed path falls back to the deterministic
    // byte-block features — same bytes, same features
    assert(feats.head.features.toSeq ==
      MultimodalOps.byteBlockFeatures(png).toSeq)
  }

  test("real PNG/JPEG/GIF bytes decode to pixel-derived features") {
    val red = encode("png", 32, 16, (_, _) => 0xff0000)
    val feats = MultimodalOps.decodeImageFeatures(red)
    assert(feats.isDefined)
    val Array(mr, mg, mb, sr, sg, sb, ml, _) = feats.get
    // solid red: mean R = 1, G = B = 0, zero variance, luma = 0.299
    assert(math.abs(mr - 1.0) < 1e-9 && mg == 0.0 && mb == 0.0)
    assert(sr == 0.0 && sg == 0.0 && sb == 0.0)
    assert(math.abs(ml - 0.299) < 1e-9)

    // half black / half white columns: means 0.5, stddev 0.5 per channel
    val checker = encode("png", 64, 64, (x, _) => if (x < 32) 0x000000 else 0xffffff)
    val Array(cr, _, _, csr, _, _, cl, csl) = MultimodalOps.decodeImageFeatures(checker).get
    assert(math.abs(cr - 0.5) < 1e-9 && math.abs(csr - 0.5) < 1e-9)
    assert(math.abs(cl - 0.5) < 1e-9 && math.abs(csl - 0.5) < 1e-9)

    // GIF round-trips solid colors exactly; JPEG is lossy — tolerance
    val gifGreen = encode("gif", 10, 10, (_, _) => 0x00ff00)
    val g = MultimodalOps.decodeImageFeatures(gifGreen).get
    assert(math.abs(g(1) - 1.0) < 1e-9 && g(0) == 0.0 && g(2) == 0.0)
    val jpgBlue = encode("jpg", 24, 24, (_, _) => 0x0000ff)
    val j = MultimodalOps.decodeImageFeatures(jpgBlue).get
    assert(j(2) > 0.9 && j(0) < 0.1 && j(1) < 0.1)

    // corrupt payload (valid magic, garbage body) falls back cleanly
    val corrupt = red.take(20) ++ Array.fill[Byte](30)(0x55)
    assert(MultimodalOps.decodeImageFeatures(corrupt).isEmpty)
    assert(MultimodalOps.decodeImageFeatures(null).isEmpty)
  }

  test("typed path uses real pixel features for decodable images end-to-end") {
    val red = encode("png", 8, 8, (_, _) => 0xff0000)
    val feats = MultimodalOps.extractFeatures(
      Seq((1L, "image", red, "mem://red.png"))
        .toDF("media_id", "modality", "content", "uri")
        .as[MultimodalOps.MediaRow]).collect()
    assert(feats.length == 1)
    assert((feats(0).width, feats(0).height) == (8, 8))
    assert(feats(0).features.toSeq == MultimodalOps.decodeImageFeatures(red).get.toSeq)
    assert(math.abs(feats(0).features(0) - 1.0) < 1e-9)
  }

  test("imageDimensions parses real PNG/GIF/JPEG headers; -1 in the typed path otherwise") {
    // PNG: signature + IHDR length + "IHDR" + w=640 h=480 (big-endian u32)
    val pngHdr = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80.toByte, 0, 0, 0x01, 0xe0.toByte, 8, 6, 0, 0, 0)
    assert(MultimodalOps.imageDimensions(pngHdr).contains((640, 480)))
    // GIF89a: w=320 h=200 little-endian u16
    val gifHdr = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, 0xc8.toByte, 0x00, 0, 0, 0)
    assert(MultimodalOps.imageDimensions(gifHdr).contains((320, 200)))
    // JPEG: SOI, APP0 (skipped via its length), SOF0 with h=30 w=20
    val jpegHdr = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0, 4, 1, 2, // APP0, len 4
      0xff.toByte, 0xc0.toByte, 0, 11, 8, 0, 30, 0, 20, 3, 0, 0, 0)
    assert(MultimodalOps.imageDimensions(jpegHdr).contains((20, 30)))
    // truncated/junk payloads parse to None, surfaced as -1 by the typed path
    assert(MultimodalOps.imageDimensions(junk).isEmpty)
    assert(MultimodalOps.imageDimensions(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte)).isEmpty)
    val feats = MultimodalOps.extractFeatures(
      Seq((1L, "image", pngHdr, "mem://p.png"), (2L, "audio", junk, "mem://d.raw"))
        .toDF("media_id", "modality", "content", "uri")
        .as[MultimodalOps.MediaRow]).collect().sortBy(_.media_id)
    assert((feats(0).width, feats(0).height) == (640, 480))
    assert((feats(1).width, feats(1).height) == (-1, -1))
  }

  test("decode refuses a decompression bomb before allocating") {
    // valid PNG signature + IHDR declaring 1e5 x 1e5 (10 gigapixels): the
    // guard must reject from the header alone — no pixel data exists to
    // decode, and a real bomb would OOM the task if decode were attempted
    val big = 100000
    val bomb = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      (big >> 24).toByte, (big >> 16).toByte, (big >> 8).toByte, big.toByte,
      (big >> 24).toByte, (big >> 16).toByte, (big >> 8).toByte, big.toByte,
      8, 6, 0, 0, 0) ++ Array.fill[Byte](64)(0x41)
    assert(MultimodalOps.decodeImageFeatures(bomb).isEmpty)
    // the typed path degrades to byte-block features instead of dying
    val feats = MultimodalOps.extractFeatures(
      Seq((1L, "image", bomb, "mem://bomb.png"))
        .toDF("media_id", "modality", "content", "uri")
        .as[MultimodalOps.MediaRow]).collect()
    assert(feats(0).features.toSeq == MultimodalOps.byteBlockFeatures(bomb).toSeq)
    // a legitimately-sized image still decodes through the guarded path
    val red = encode("png", 8, 8, (_, _) => 0xff0000)
    assert(MultimodalOps.decodeImageFeatures(red).isDefined)
  }

  test("headerDims column parse agrees with the JVM imageDimensions twin") {
    // real encoder output + hand-built headers + non-image payloads: the
    // codegen'd column path and the typed-path parser must agree on all,
    // with the JVM's extra JPEG capability surfaced as -1 in columns
    val realPng = encode("png", 32, 16, (_, _) => 0xff0000)
    val realGif = encode("gif", 10, 7, (_, _) => 0x00ff00)
    val rows = Seq((1L, realPng), (2L, realGif), (3L, png), (4L, junk), (5L, mp4))
    val out = rows.toDF("media_id", "content")
      .withColumn("format", MultimodalOps.sniffFormat(col("content")))
    val (w, h) = MultimodalOps.headerDims(col("content"), col("format"))
    val got = out.select(col("media_id"), w.as("w"), h.as("h"))
      .orderBy("media_id").collect()
      .map(r => (r.getLong(1).toInt, r.getLong(2).toInt))
    val want = rows.map { case (_, b) =>
      MultimodalOps.imageDimensions(b).getOrElse((-1, -1))
    }
    assert(got.toSeq == want)
    assert(got(0) == (32, 16) && got(1) == (10, 7))
  }

  test("frame sampling emits fixed-size strided blocks") {
    val frames = MultimodalOps.sampleFrames(
      Seq((4L, junk)).toDF("media_id", "content"), blockSize = 16, stride = 2)
      .orderBy("frame_id").collect()
    // 64 bytes, block 16, stride 2 -> offsets 0, 32: 2 frames ((64-16) div 32 = 1)
    assert(frames.length == 2)
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 16))
    assert(frames(1).getAs[Array[Byte]]("frame").toSeq == junk.slice(32, 48).toSeq)
  }
}
