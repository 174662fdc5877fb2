package graft.functions

import graft.ops.UnigramLmOps
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM Viterbi tokenization as a native expression — the encode
  * twin of [[graft.ops.UnigramLmOps]], mirroring [[BpeEncodeWith]]'s
  * runtime-table design: the trained `(piece, micro-log-prob)` table is
  * constructor state shipped with the plan (codegen via addReferenceObj),
  * each pre-token is segmented by PURE-INTEGER Viterbi (maximize summed
  * micro log-prob, ties to the longer last piece, unknown single chars at
  * the documented UNK cost), and per-word results are memoized per
  * executor. Table rows are `piece<TAB>logpMicro`
  * ([[UnigramLmOps.serialize]]); ill-formed rows are rejected at
  * construction, not at runtime.
  */
case class UnigramEncode(child: Expression, table: Seq[String])
    extends UnaryExpression {

  {
    val errs = UnigramEncode.validate(table)
    require(errs.isEmpty,
      s"ill-formed unigram table: ${errs.take(3).mkString("; ")}")
  }

  @transient private lazy val costs: Map[String, Long] =
    UnigramEncode.parse(table)

  // Size-capped (BpeMerges.MemoCap pattern): open-vocabulary input makes an
  // uncapped per-word memo grow for the executor's lifetime; at the cap
  // we recompute instead of evicting (pure function, deterministic).
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()

  def encode(parts: ArrayData): ArrayData = {
    val n = parts.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < n) {
      val w = parts.getUTF8String(i)
      if (w != null) {
        val s = w.toString
        val hit = memo.get(s)
        val pieces =
          if (hit != null) hit
          else {
            val enc = UnigramLmOps.viterbi(s, costs)
              .map(UTF8String.fromString).toArray
            if (memo.size < BpeMerges.MemoCap) memo.put(s, enc)
            enc
          }
        out ++= pieces
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_encode expects ARRAY<STRING>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "unigram_encode"

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramEncoder", this,
      classOf[UnigramEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  private[functions] def parse(table: Seq[String]): Map[String, Long] =
    table.map { row =>
      val t = row.indexOf('\t')
      row.substring(0, t) -> row.substring(t + 1).toLong
    }.toMap

  private[functions] def validate(table: Seq[String]): Seq[String] = {
    val errs = scala.collection.mutable.ListBuffer.empty[String]
    if (table.isEmpty) errs += "empty table"
    val seen = scala.collection.mutable.HashSet.empty[String]
    table.foreach { row =>
      val t = row.indexOf('\t')
      if (t <= 0 || t == row.length - 1) errs += s"not piece<TAB>cost: '$row'"
      else {
        val piece = row.substring(0, t)
        if (piece.length > UnigramLmOps.MaxPieceLen)
          errs += s"piece longer than MaxPieceLen: '$piece'"
        if (!seen.add(piece)) errs += s"duplicate piece: '$piece'"
        try {
          val c = row.substring(t + 1).toLong
          if (c > 0) errs += s"positive log-prob cost: '$row'"
        } catch {
          case _: NumberFormatException => errs += s"non-numeric cost: '$row'"
        }
      }
    }
    errs.toSeq
  }

  /** Column-API entry point over a trained table. */
  def unigramEncode(c: Column, table: Seq[String]): Column =
    Bridge.column(UnigramEncode(Bridge.expression(c), table))
}
