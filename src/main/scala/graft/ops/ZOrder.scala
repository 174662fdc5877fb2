package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for MULTI-column data layout — the
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY` (public:
  * Morton 1966; the lakehouse application is documented across the open
  * table formats): interleaving the bits of two clustering columns maps
  * nearby (x, y) points to nearby curve positions, so range-partitioning
  * files by the curve key gives every file a SMALL 2-D bounding box.
  * Parquet footer min/max stats on BOTH columns then prune point/range
  * predicates on EITHER column to a few files — where a 1-D sort
  * ([[graft.sources.DocumentSources.writeSorted]]) prunes only its own
  * sort column and every file spans the full range of the other.
  *
  * [[interleave16]] takes the LOW 16 bits of each dimension (mask
  * documented, callers bucket/shift real domains into 16 bits first —
  * at 100 TB the clustering key needs only enough resolution to
  * separate files, not to order rows exactly): bit i of x lands at
  * curve bit 2i, bit i of y at 2i+1, yielding a 32-bit key. Pure
  * integer bit arithmetic — 32 codegen'd shift/mask terms OR-folded,
  * no UDF — with a generated DuckDB twin ([[interleave16Sql]]) built
  * from the same term list, so the key itself is oracle-verified
  * (q129) and the layout property is unit-asserted (ZOrderLayoutSpec).
  */
object ZOrder {

  val Mask16 = 65535L

  /** Morton-interleave the low 16 bits of `x` (even bit positions) and
    * `y` (odd positions) into one non-negative 32-bit key.
    */
  def interleave16(x: Column, y: Column): Column = {
    val xm = x.cast("long").bitwiseAND(lit(Mask16))
    val ym = y.cast("long").bitwiseAND(lit(Mask16))
    val terms = (0 until 16).flatMap { i =>
      Seq(
        shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** DuckDB twin of [[interleave16]] over SQL fragments `x`/`y` — the
    * same 32 shift/mask terms, so both engines compute identical keys.
    */
  def interleave16Sql(x: String, y: String): String = {
    val xm = s"(($x) & $Mask16)"
    val ym = s"(($y) & $Mask16)"
    val terms = (0 until 16).flatMap { i =>
      Seq(s"((($xm >> $i) & 1) << ${2 * i})",
        s"((($ym >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " | ", ")")
  }
}
