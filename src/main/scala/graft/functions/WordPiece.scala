package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT tokenizer,
  * Devlin et al. 2019) — the third production subword family beside BPE
  * ([[BpeMerges]]/q87) and unigram-LM ([[UnigramEncode]]/q115): encode a
  * word by GREEDY LONGEST-MATCH-FIRST against a piece vocabulary where
  * word-internal continuations carry the `##` prefix; if any position has
  * no matching piece the WHOLE word becomes `[UNK]` (the published
  * `WordpieceTokenizer` contract — no partial emissions).
  *
  * Two vocabularies drive the two query tiers, mirroring the BPE split:
  * [[Vocab]] is a FIXED hand-authored table, so q22c's encode is
  * replayable by a DuckDB recursive CTE (oracle-exact, like q22b's fixed
  * merge table); the corpus-TRAINED vocabulary
  * ([[graft.ops.WordPieceTrainOps]]) rides the same expression for the
  * rows-only q87e, gated by golden-parity units instead.
  */
object WordPiece {

  /** The published unknown-word token. */
  val Unk = "[UNK]"

  /** Continuation-piece prefix. */
  val Cont = "##"

  /** Hand-authored demo vocabulary for the oracled tier: plain + `##`
    * singles for ASCII letters and digits (letter words can always be
    * segmented, so `[UNK]` is reserved for genuinely foreign characters)
    * plus multi-char pieces that force longest-match-first decisions over
    * the fixture's vocabulary ("value" → `val ##ue`, not `va ##l ##ue`).
    */
  val Vocab: Seq[String] = {
    val letters = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    val singles = letters.map(_.toString) ++ letters.map(c => Cont + c)
    val multi = Seq("th", "the", "va", "val", "##al", "##ue", "##lue",
      "do", "doc", "##oc", "sc", "scan", "##an", "du", "dup", "##up",
      "re", "row", "##ow", "##ent", "##ing", "##ng", "va", "##lu")
    (singles ++ multi).distinct
  }

  /** Greedy longest-match segmentation of one word. Returns `[Unk]` when
    * any position fails to match (whole-word UNK, the BERT contract).
    */
  def encodeWord(w: String, vocab: Set[String], maxBodyLen: Int): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < w.length) {
      val prefix = if (pos == 0) "" else Cont
      var end = math.min(w.length, pos + maxBodyLen)
      var found: String = null
      while (found == null && end > pos) {
        val cand = prefix + w.substring(pos, end)
        if (vocab.contains(cand)) found = cand else end -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      pos = end
    }
    out.toArray
  }

  private[functions] def maxBodyLen(vocab: Seq[String]): Int =
    vocab.map(p => if (p.startsWith(Cont)) p.length - Cont.length else p.length)
      .foldLeft(1)(math.max)

  /** DuckDB literal of `{b: body, c: is_continuation}` structs for the
    * oracle's longest-match replay. Pieces are ASCII-safe by
    * construction; single quotes would need doubling if ever present.
    */
  def vocabSqlStructs(vocab: Seq[String]): String =
    vocab.map { p =>
      val cont = p.startsWith(Cont)
      val body = if (cont) p.substring(Cont.length) else p
      s"{'b': '${body.replace("'", "''")}', 'c': $cont}"
    }.mkString("[", ", ", "]")

  /** Recursive-CTE replay of [[encodeWord]] over the DISTINCT pre-token
    * vocabulary of `documents.text` (the q22b oracle pattern): each step
    * finds the longest vocab body matching at `pos` with the right
    * continuation class, appends the (re-prefixed) piece and advances; a
    * step with no match marks the whole word `[UNK]`. Defines
    * `wp_vocab(w, toks)`; splice under `WITH RECURSIVE`.
    */
  def vocabCtes(vocab: Seq[String], regexSql: String): String = {
    val structs = vocabSqlStructs(vocab)
    s"""wp_words AS (
      SELECT DISTINCT unnest(regexp_extract_all(text, '$regexSql')) AS w
      FROM documents),
    wp_steps AS (
      SELECT w, 1 AS pos, CAST([] AS VARCHAR[]) AS toks, false AS done
      FROM wp_words
      UNION ALL
      SELECT w,
        CASE WHEN bl IS NULL THEN length(w) + 1 ELSE pos + bl END,
        CASE WHEN bl IS NULL THEN ['$Unk']
             ELSE list_append(toks,
               CASE WHEN pos > 1 THEN '$Cont' ELSE '' END
                 || substr(w, pos, bl)) END,
        CASE WHEN bl IS NULL THEN true
             ELSE pos + bl > length(w) END
      FROM (
        SELECT w, pos, toks,
          list_max(list_transform(list_filter($structs,
            v -> v.c = (pos > 1) AND v.b = substr(w, pos, length(v.b))),
            v -> length(v.b))) AS bl
        FROM wp_steps WHERE NOT done)),
    wp_vocab AS (SELECT w, toks FROM wp_steps WHERE done)"""
  }

  /** Column-API entry point. */
  def wordpieceEncode(c: Column, vocab: Seq[String]): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(c), vocab))
}

/** WordPiece greedy longest-match encode as a native expression over an
  * `ARRAY<STRING>` pre-token column — [[UnigramEncode]]'s runtime-table
  * design: the vocabulary is constructor state shipped with the plan
  * (codegen via addReferenceObj), per-word results memoized per executor.
  */
case class WordPieceEncode(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "empty WordPiece vocabulary")
  require(vocab.distinct.size == vocab.size, "duplicate WordPiece pieces")
  require(!vocab.contains(WordPiece.Unk),
    s"${WordPiece.Unk} is reserved, not a vocabulary piece")

  @transient private lazy val vocabSet: Set[String] = vocab.toSet
  @transient private lazy val maxLen: Int = WordPiece.maxBodyLen(vocab)
  // Size-capped (BpeMerges.MemoCap pattern): real corpora have an effectively
  // unbounded distinct pre-token universe (numbers, typos, hex hashes),
  // so an uncapped map grows for the life of the executor. Zipf repeats
  // concentrate in short frequent words — at the cap we recompute
  // instead of evicting (pure function, deterministic either way).
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
        val toks =
          if (hit != null) hit
          else {
            val enc = WordPiece.encodeWord(s, vocabSet, maxLen)
              .map(UTF8String.fromString)
            if (memo.size < BpeMerges.MemoCap) memo.put(s, enc)
            enc
          }
        out ++= toks
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"wordpiece_encode expects ARRAY<STRING>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "wordpiece_encode"

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpieceEncoder", this,
      classOf[WordPieceEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}
