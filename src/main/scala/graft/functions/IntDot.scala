package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for the exact integer dot product of two
  * INT arrays — the scoring kernel of the SQ8 quantized kNN family
  * (`SimilarityOps.sq8TopK` / `sq8RerankTopK`), where it runs once per
  * (query, candidate) pair.
  *
  * The higher-order formulation (`aggregate(zip_with(a, b, _ * _), 0L,
  * _ + _)`) materializes an intermediate product array per pair and
  * evaluates two lambdas per dimension; this is the same fold as one
  * fused codegen loop over the two arrays — zero allocations, stays
  * inside WholeStageCodegen.
  *
  * Contract: products accumulate into a 64-bit sum pairwise over the
  * shorter length; a null ELEMENT on either side contributes 0; a null
  * ARRAY input yields null. The quantizer emits equal-length null-free
  * arrays, where this is bit-identical to the HOF form (the agreement
  * property test pins the two on exactly that domain — on null elements
  * the HOF's null product would instead null the whole sum, and on
  * unequal lengths `zip_with` null-pads, so the forms intentionally
  * diverge outside the contract).
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_dot expects two ARRAY<INT> inputs, got " +
          s"${l.simpleString(5)} and ${r.simpleString(5)}")
    }

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "int_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}

object IntDot {

  /** The fold itself — static so generated code can call it directly. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getInt(i).toLong * b.getInt(i)
      i += 1
    }
    s
  }

  /** Column-API entry point. */
  def intDot(a: Column, b: Column): Column =
    Bridge.column(IntDot(Bridge.expression(a), Bridge.expression(b)))
}
