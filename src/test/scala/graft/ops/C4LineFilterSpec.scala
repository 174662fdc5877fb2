package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** c4LineFilter (the C4 §2.2 line rules) — hand fixture exercising each
  * rule on real newline-delimited pages, plus the q131 fixture
  * non-vacuity pins (the q119b lesson: an oracle comparing two empty
  * relations proves nothing).
  */
class C4LineFilterSpec extends SparkSpec {
  import sqlImplicits._

  test("each line rule fires; kept lines rebuild the page in order") {
    val page = Seq(
      "this first line has enough words and ends well.",   // keep
      "too short.",                                        // < 5 words
      "no terminal punctuation on this long line",         // unpunctuated
      "this line mentions javascript so it is dropped.",   // blocklist
      "the closing line also has plenty of words here.").mkString("\n")
    val thin = Seq("only one good line survives here fine.", "x.").mkString("\n")
    val out = TextAnalysisOps.c4LineFilter(
      Seq((1L, page), (2L, thin)).toDF("doc_id", "text"),
      lineSep = "\n", blockTerm = "javascript", minWords = 5, minLines = 2)
      .orderBy("doc_id").collect()
    // doc 2 keeps < minLines lines and drops entirely
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    val r = out.head
    assert(r.getAs[Long]("n_lines") == 5 && r.getAs[Long]("n_kept") == 2)
    assert(r.getAs[String]("cleaned") ==
      "this first line has enough words and ends well. ~ " +
        "the closing line also has plenty of words here.")
  }

  test("the full C4 END_MARKS set is accepted: . ! ? and closing quote") {
    val page = Seq(
      "a question line with plenty of words, yes?",        // keep (?)
      "an exclamation line with plenty of words now!",     // keep (!)
      "\"a quoted line with plenty of words inside.\"",    // keep (")
      "a comma-ended line with plenty of words here,",     // drop (,)
      "a colon-ended line with plenty of words here:").mkString("\n")
    val out = TextAnalysisOps.c4LineFilter(
      Seq((1L, page)).toDF("doc_id", "text"),
      lineSep = "\n", blockTerm = "javascript", minWords = 5, minLines = 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_kept") == 3,
      "?, !, and closing quote must all count as terminal punctuation")
  }

  test("null and empty pages drop without error") {
    val out = TextAnalysisOps.c4LineFilter(
      Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "\n\n"))
        .toDF("doc_id", "text"),
      lineSep = "\n", blockTerm = "javascript")
      .collect()
    assert(out.isEmpty)
  }

  test("q131 fixture synthesis is non-vacuous: every rule fires") {
    val dir = "/root/testdata/sf0.001"
    val nDocs = graft.Tables.documents(spark, dir).count()
    val out = graft.queries.AnalysisQueries
      .q131C4LineFilter(spark, dir).collect()
    assert(out.nonEmpty, "no surviving docs — the oracle row is vacuous")
    assert(out.length < nDocs, "no doc dropped — the minLines gate is vacuous")
    assert(out.exists(r => r.getAs[Long]("n_kept") < r.getAs[Long]("n_lines")),
      "no line dropped — the line rules are vacuous")
    graft.CacheScope.releaseAll()
  }
}
