package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Integer perceptual hash of a binary payload — the pHash family
  * (block-mean grid → 2-D DCT-II → low-frequency sign bits; public
  * algorithm, e.g. Zauner 2010 "Implementation and Benchmarking of
  * Perceptual Image Hash Functions") made engine-exact:
  *
  *  1. GRID: the payload's bytes are block-averaged into an 8×8 integer
  *     luminance grid (integer floor division — no floats). For a real
  *     image this grid comes from the decoded pixels; under the driver's
  *     hash gate the synthesized-payload convention (MultimodalQueries)
  *     feeds raw bytes, which exercises identical arithmetic. Perceptual
  *     robustness (resize/recompress invariance) applies to the decoded
  *     path; the byte path keeps the pipeline oracle-checkable.
  *  2. DCT: C[u][v] = Σ g[i][j]·T[i][u]·T[j][v] with the cosine basis
  *     PRE-SCALED to integers (T[i][u] = round(1024·cos((2i+1)uπ/16)),
  *     computed once with StrictMath for platform reproducibility) — all
  *     query-time arithmetic is exact Int64 (|C| ≤ 64·255·1024² < 2^35).
  *  3. BITS: sign of each of the 63 AC coefficients, packed into bits
  *     0..62 of an Int64 (DC carries only overall brightness; dropping it
  *     is what makes the hash exposure-invariant in the decoded path).
  *
  * Near-dup pairs then come from a BANDED Hamming join: 8 bands of 8
  * bits; by pigeonhole, any pair within Hamming distance ≤ 7 agrees on
  * at least one full band, so banding is EXACT (no recall loss) for the
  * distance-7 threshold — unit-gated against the all-pairs formulation.
  * At 100 TB the band key is the shuffle key: candidates meet only
  * inside matching 8-bit buckets per band, never all-pairs.
  */
object PHash {

  /** Grid side; the hash has GridDim² − 1 = 63 AC bits. */
  val GridDim = 8

  /** Basis scale: round(Scale·cos) keeps the basis exact in Int64. */
  val Scale = 1024L

  /** T(i)(u) = round(Scale·cos((2i+1)·u·π/16)) — StrictMath so every JVM
    * builds the identical table; the SQL twin interpolates these values
    * as literals, so no engine evaluates cos at query time.
    */
  val CosT: Array[Array[Long]] = Array.tabulate(GridDim, GridDim) { (i, u) =>
    Math.round(Scale * StrictMath.cos((2 * i + 1) * u * StrictMath.PI / 16))
  }

  /** The flattened table as a DuckDB list literal (row-major T[i][u] at
    * index i·8+u) — single source shared with the oracle.
    */
  def cosSqlList: String =
    CosT.flatten.mkString("[", ",", "]")

  /** The 63-bit integer perceptual hash of a byte payload. EMPTY payloads
    * hash to 0 (all-zero grid → all coefficients 0 → no sign bits); a
    * SQL NULL never reaches this method — the [[PHash64]] expression is
    * null-intolerant, so `phash64(NULL)` yields NULL, not 0 (the
    * `bytes == null` guard serves only direct JVM callers).
    */
  def hash(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val n = GridDim * GridDim
    val len = bytes.length
    val grid = new Array[Long](n)
    var k = 0
    while (k < n) {
      val from = (k.toLong * len / n).toInt
      val until = ((k + 1).toLong * len / n).toInt
      if (until > from) {
        var s = 0L
        var j = from
        while (j < until) { s += bytes(j) & 0xff; j += 1 }
        grid(k) = s / (until - from)
      }
      k += 1
    }
    var h = 0L
    var uv = 1
    while (uv < n) {
      val u = uv / GridDim
      val v = uv % GridDim
      var c = 0L
      var b = 0
      while (b < n) {
        c += grid(b) * CosT(b / GridDim)(u) * CosT(b % GridDim)(v)
        b += 1
      }
      if (c > 0) h |= 1L << (uv - 1)
      uv += 1
    }
    h
  }

  /** Column-API entry point. */
  def pHash(content: Column): Column =
    Bridge.column(PHash64(Bridge.expression(content)))
}

/** `phash64(binary) -> long` — the integer perceptual hash, inside
  * WholeStageCodegen via a static call (same pattern as [[PolyCharHash]]).
  * Null input -> null.
  */
case class PHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"phash64 expects BINARY input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "phash64"

  override protected def nullSafeEval(input: Any): Any =
    PHash.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}
