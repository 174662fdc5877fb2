package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 62-bit content key for exact-duplicate grouping: TWO independent
  * polynomial code-point folds fused into one byte walk,
  *
  *   h1 = fold(cps, 7,  (h, c) => (h*31  + c) mod P)   — HashOps.charHash
  *   h2 = fold(cps, 13, (h, c) => (h*131 + c) mod P)   — the second fold
  *   key = h1 * P + h2,  P = 2^31 - 1
  *
  * so the exact-dedup tier can shuffle an 8-byte key instead of the raw
  * document/chunk text (the 100 TB fix: the exchange payload becomes
  * O(rows), not O(corpus bytes)). Collision stance — the same
  * documented trade as the reconciliation checksums (ReconcileOps): two
  * DISTINCT texts share a key only when BOTH independent folds collide,
  * ~(len/P)^2 ≈ 2^-62-class for realistic lengths; a pipeline that
  * cannot accept that adds a within-group equality confirm on the
  * (already tiny) duplicate groups.
  *
  * Arithmetic bounds keep both engines exact in Int64: h < 2^31, so
  * h*131 + cp < 2^39, and h1*P + h2 < P^2 + P < 2^62. The DuckDB twin
  * (`HashOps.contentKeySql`) runs the same two folds as two
  * `list_reduce` passes — bit-identical by the same argument as
  * PolyCharHash (split('')/ascii visit the same code points the byte
  * walk decodes). Null input → null; HashOps coalesces to '' (→ seed
  * fold of nothing = 7*P + 13) before calling.
  */
case class ContentKey64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"content_key64 expects a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "content_key64"

  override protected def nullSafeEval(input: Any): Any =
    ContentKey64.key(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ContentKey64.key($c)")

  override protected def withNewChildInternal(
      newChild: Expression): ContentKey64 = copy(child = newChild)
}

object ContentKey64 {

  private val P = 2147483647L

  /** Both folds in one UTF-8 byte walk — static so generated code can
    * call it directly. Same decode loop as [[PolyCharHash.hash]].
    */
  def key(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h1 = 7L
    var h2 = 13L
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < bytes.length) {
        cp = (cp << 6) | (bytes(i + j) & 0x3f)
        j += 1
      }
      h1 = (h1 * 31 + cp) % P
      h2 = (h2 * 131 + cp) % P
      i += len
    }
    h1 * P + h2
  }

  /** Column-API entry point. */
  def contentKey64(c: Column): Column =
    Bridge.column(ContentKey64(Bridge.expression(c)))
}
