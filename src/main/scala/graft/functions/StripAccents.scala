package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for accent folding — [[NfcNormalize]]'s
  * destructive sibling in the normalization tier: NFD-decompose, drop
  * every combining mark (Unicode categories Mn/Mc/Me), NFC-recompose.
  * "café" and "cafe" become one token, which is what search indexing,
  * fuzzy dedup keys, and language-ID n-gram profiles want AFTER the
  * lossless q101 pass has canonicalized encoding. Characters that are not
  * canonically decomposable (đ, ł, ø, ß, ligatures) are deliberately
  * untouched — accent folding is not transliteration; that contract is
  * exactly utf8proc's `STRIPMARK` rule, which makes DuckDB's
  * `strip_accents` the oracle twin (unit-tested on the probe set, and the
  * trailing NFC recompose keeps decomposable-but-markless scripts like
  * Hangul byte-identical across both engines).
  *
  * Same staged cost discipline as [[NfcNormalize]]: pure-ASCII input
  * returns unchanged with zero allocation (ASCII has no marks), and a
  * non-ASCII string that strips to itself returns the ORIGINAL UTF8String
  * (no re-encode). One static call inside generated code — no UDF wall.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"strip_accents expects a STRING input, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripAccents.strip($c)")

  override protected def withNewChildInternal(
      newChild: Expression): StripAccents = copy(child = newChild)
}

object StripAccents {

  /** NFD → drop Mn/Mc/Me → NFC; static so generated code calls it
    * directly.
    */
  def strip(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && bytes(i) >= 0) i += 1
    if (i == bytes.length) return s // pure ASCII carries no marks
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    val out = java.text.Normalizer.normalize(
      sb.toString, java.text.Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }

  /** Column-API entry point. */
  def stripAccents(c: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(c)))
}
