package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for HashOps' portable polynomial hash
  * `h = fold(codepoints, 7, (h, c) => (h*31 + c) mod (2^31-1))`.
  *
  * The higher-order formulation (`aggregate(filter(split(c, "")), …)`)
  * materializes an array of single-character UTF8Strings per row and
  * evaluates three lambdas per character — it is the hot inner loop of
  * every shingle-hashing dedup query (MinHash, SimHash, fingerprints,
  * decontamination), where it runs once per shingle, i.e. ~n_tokens times
  * per document. This is the same fold as one fused codegen loop over the
  * string's code points: zero allocations, stays inside WholeStageCodegen.
  *
  * Bit-compatibility contract: identical to the HOF form and to the DuckDB
  * oracle twin (`HashOps.charHashSql`) — `split(c, "")` segments a string
  * into per-code-point pieces and `ascii` returns each piece's code point,
  * so folding `str.codePointAt(i)` directly visits the same values in the
  * same order (agreement is property-tested across the BMP and astral
  * planes). Null input → null; HashOps coalesces to '' (→ seed 7) before
  * calling, preserving the documented null contract.
  */
case class PolyCharHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"poly_char_hash expects a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "poly_char_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyCharHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyCharHash.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PolyCharHash = copy(child = newChild)
}

object PolyCharHash {

  /** The fold itself — static so generated code can call it directly.
    * UTF-8 decode walks bytes without building a java.lang.String.
    */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 7L
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
      h = (h * 31 + cp) % 2147483647L
      i += len
    }
    h
  }

  /** Column-API entry point. */
  def polyCharHash(c: Column): Column =
    Bridge.column(PolyCharHash(Bridge.expression(c)))
}
