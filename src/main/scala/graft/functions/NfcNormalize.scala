package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode NFC normalization — the
  * canonical-composition pass every serious web-text pipeline runs before
  * hashing or deduplicating (C4/CCNet practice: "café" composed and
  * "café" decomposed must be ONE string, or exact/near dedup and
  * every downstream hash treats visually-identical documents as
  * distinct). Spark has no built-in for it; the alternatives are a Scala
  * UDF (serialization wall, breaks WholeStageCodegen) or shipping text to
  * Python — this is the custom-Expression tier (SURVEY.md §2.8), one
  * static call inside generated code.
  *
  * Cost discipline for the common case: web corpora are dominated by
  * ASCII and by already-NFC text, so the implementation is staged —
  * (1) a byte scan returns the input UNCHANGED (no allocation at all)
  * when it is pure ASCII, which NFC can never alter; (2) otherwise
  * `Normalizer.isNormalized` (a no-allocation verification pass) returns
  * the input unchanged when already composed; (3) only genuinely
  * decomposed strings pay the String round-trip and recomposition. At
  * 100 TB steps 1-2 make normalization effectively free on conforming
  * shards instead of copying every row.
  *
  * Oracle contract: DuckDB's `nfc_normalize` implements the same Unicode
  * canonical composition (utf8proc) as `java.text.Normalizer` — exact
  * agreement is unit-tested on composed/decomposed/mixed/astral inputs,
  * and the q101 registry row hash-verifies the whole column. Null input
  * → null (UnaryExpression nullIntolerant contract).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** The staged normalization — static so generated code calls it
    * directly.
    */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII: NFC is the identity
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
