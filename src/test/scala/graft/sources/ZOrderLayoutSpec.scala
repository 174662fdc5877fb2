package graft.sources

import graft.SparkSpec
import graft.ops.ZOrder
import org.apache.spark.sql.functions._

/** The q129 layout claim, quantified: Z-order clustering gives every
  * output file a small bounding box in BOTH clustering dimensions, so
  * footer min/max stats prune point predicates on EITHER column — where
  * the 1-D minute sort answers minute predicates but every file spans
  * the whole user domain and a user predicate reads everything. The
  * "files a point query must touch" count below is exactly the
  * file-skipping decision a parquet reader makes from footer stats.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val NFiles = 16

  private def partFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq.sortBy(_.getName)

  test("z-order files prune point queries on BOTH dims; 1-D sort only on its own") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 60000000").as("minute"))
    val m0 = ev.agg(min(col("minute"))).head.getLong(0)
    val zPath = graft.Scratch.dir("spec_zorder")
    val sPath = graft.Scratch.dir("spec_minute_sorted")
    DocumentSources.writeZOrdered(ev, zPath,
      ZOrder.interleave16(shiftleft(col("user_id"), 12), col("minute") - m0),
      NFiles)
    DocumentSources.writeSorted(ev, sPath, "minute", NFiles)

    // per-file (user, minute) bounding boxes — what footer stats expose
    def boxes(path: String): Seq[(Long, Long, Long, Long)] =
      partFiles(path).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("user_id"), max("user_id"), min("minute"), max("minute"))
          .head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    val zb = boxes(zPath)
    val sb = boxes(sPath)
    assert(zb.size == NFiles && sb.size == NFiles)

    // probe values: a mid-domain user and the median minute
    val probeUser = 7L
    val probeMinute = ev.stat.approxQuantile("minute", Array(0.5), 0.0).head.toLong
    def hits(bx: Seq[(Long, Long, Long, Long)], u: Option[Long],
             m: Option[Long]): Int =
      bx.count { case (u0, u1, m0b, m1) =>
        u.forall(v => v >= u0 && v <= u1) && m.forall(v => v >= m0b && v <= m1)
      }

    val sortedUser = hits(sb, Some(probeUser), None)
    val zUser = hits(zb, Some(probeUser), None)
    val sortedMinute = hits(sb, None, Some(probeMinute))
    val zMinute = hits(zb, None, Some(probeMinute))

    // the 1-D layout cannot prune the non-sort column: every file spans
    // the user domain
    assert(sortedUser == NFiles,
      s"fixture surprise: minute-sorted layout pruned users ($sortedUser)")
    // z-order prunes BOTH dims to a fraction of the files
    assert(zUser <= NFiles / 2,
      s"z-order user probe touches $zUser of $NFiles files — no pruning")
    assert(zMinute <= NFiles / 2,
      s"z-order minute probe touches $zMinute of $NFiles files — no pruning")
    // and it beats the 1-D layout on the non-sort dimension outright
    assert(zUser < sortedUser)
    // minute pruning: 1-D sort is optimal there; z-order pays a bounded
    // factor for the second dimension, never the whole corpus
    assert(sortedMinute <= 2)
  }

  test("interleave16 is invertible: deinterleaving recovers both masked dims") {
    // reference deinterleave, driver-side: curve bit 2i -> x bit i,
    // 2i+1 -> y bit i. Recovering both inputs proves the 32-term
    // expression places every bit (no collision, no drop) — the property
    // the bounding-box math rests on.
    import sqlImplicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextLong().abs, rnd.nextLong().abs))
    val out = rows.toDF("id", "x", "y")
      .select(col("id"), col("x"), col("y"),
        ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("z"))
      assert(z >= 0 && z < (1L << 32))
      val xBack = (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yBack = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xBack == (x & ZOrder.Mask16) && yBack == (y & ZOrder.Mask16),
        s"x=$x y=$y z=$z -> $xBack/$yBack")
    }
  }

  test("z-ordered files carry pairwise-disjoint curve-key ranges") {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 60000000").as("minute"))
    val m0 = ev.agg(min(col("minute"))).head.getLong(0)
    val zPath = graft.Scratch.dir("spec_zorder_disjoint")
    val zc = ZOrder.interleave16(shiftleft(col("user_id"), 12),
      col("minute") - m0)
    DocumentSources.writeZOrdered(ev, zPath, zc, NFiles)
    val ranges = partFiles(zPath).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(zc), max(zc)).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping z ranges: $ranges")
      case _ =>
    }
    // round trip is lossless
    assert(spark.read.parquet(zPath).count() == ev.count())
  }
}
