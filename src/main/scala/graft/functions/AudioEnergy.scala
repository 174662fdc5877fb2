package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Audio energy-signature fingerprint over a PCM payload — q60c's visual
  * pHash applied to the audio leg: 16-bit little-endian samples are
  * decoded from the binary column after `skip` header bytes, and a
  * `maxWords`-bit signature is built from the first `maxWords` samples —
  * bit i set iff |sᵢ|·take > Σ|s| (strict integer cross-multiply), i.e.
  * sample i is louder than the window's mean. Mean-relative bits make
  * the signature gain-invariant, the property audio fingerprinting needs
  * (Haitsma & Kalker 2002's energy-band signs are the public ancestor);
  * keeping maxWords ≤ 63 keeps every shift below the sign bit on both
  * engines, the PHash convention.
  *
  * This is a native expression for the same reason PHash64 is: the
  * per-sample decode unrolled as ~2000 Column nodes blows janino's
  * generated-method limits (observed: whole-stage codegen compile
  * failure → interpreted fallback), while one codegen'd call into this
  * loop stays inside whole-stage codegen. Returns
  * `ARRAY<LONG>(n_words, mean_abs, energy_fp)`; the DuckDB oracle
  * replays the identical arithmetic over the hex image of the payload
  * bytes (MultimodalQueries.q60gSql).
  */
object AudioEnergy {

  /** Core signature; EMPTY/short payloads yield (0, 0, 0). */
  def signature(bytes: Array[Byte], skip: Int, maxWords: Int): Array[Long] = {
    if (bytes == null || bytes.length <= skip) return Array(0L, 0L, 0L)
    val nWords = (bytes.length - skip) / 2
    val take = math.min(nWords, maxWords)
    val av = new Array[Long](take)
    var sum = 0L
    var i = 0
    while (i < take) {
      val b0 = bytes(skip + 2 * i) & 0xFF
      val b1 = bytes(skip + 2 * i + 1) & 0xFF
      val u = b0 + (b1 << 8)
      val s = if (u >= 32768) u - 65536 else u
      av(i) = math.abs(s.toLong)
      sum += av(i)
      i += 1
    }
    var fp = 0L
    i = 0
    while (i < take) {
      if (av(i) * take > sum) fp |= 1L << i
      i += 1
    }
    Array(nWords.toLong, if (take > 0) sum / take else 0L, fp)
  }

  /** Column-API entry point. */
  def audioEnergyFp(c: Column, skip: Int, maxWords: Int): Column =
    Bridge.column(AudioEnergyFp(Bridge.expression(c), skip, maxWords))
}

case class AudioEnergyFp(child: Expression, skip: Int, maxWords: Int)
    extends UnaryExpression {

  require(skip >= 0, "negative header skip")
  require(maxWords > 0 && maxWords <= 63,
    "maxWords must stay below the Int64 sign bit")

  def sig(bytes: Array[Byte]): GenericArrayData =
    new GenericArrayData(
      AudioEnergy.signature(bytes, skip, maxWords).map(Long.box))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"audio_energy_fp expects BINARY, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "audio_energy_fp"

  override protected def nullSafeEval(input: Any): Any =
    sig(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("audioEnergy", this,
      classOf[AudioEnergyFp].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sig($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AudioEnergyFp =
    copy(child = newChild)
}
