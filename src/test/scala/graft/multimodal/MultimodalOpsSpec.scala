package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests over literal binary payloads (no media fixture
  * table exists; the decode step is stubbed by design — MultimodalOps
  * scaladoc).
  */
class MultimodalOpsSpec extends SparkSpec {
  import sqlImplicits._

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
    // deterministic: same bytes -> same features
    assert(feats.head.features.toSeq ==
      MultimodalOps.fakeDecodeFeatures(png).toSeq)
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
