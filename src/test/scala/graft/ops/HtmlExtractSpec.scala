package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextAnalysisOps.htmlTextExtract: the q110 fixture page exercises the
  * happy path; these cover the hostile shapes a crawl actually contains —
  * bare `<` inside scripts, uppercase tags, missing body/title, unclosed
  * blocks, entity double-encoding.
  */
class HtmlExtractSpec extends SparkSpec {
  import sqlImplicits._

  private def extract(html: String): (String, String) = {
    val r = Seq(html).toDF("h")
      .select(TextAnalysisOps.htmlTextExtract(col("h"))
        .map { case (n, c) => c.as(n) }: _*)
      .head()
    (r.getString(0), r.getString(1))
  }

  test("script with bare < strips wholesale before tag stripping") {
    val (_, text) = extract(
      "<html><body><p>keep</p><script>if (a<b) { x(); }</script><p>this</p></body></html>")
    assert(text == "keep this")
  }

  test("boilerplate blocks drop content and all; case-insensitive tags") {
    val (_, text) = extract(
      "<HTML><BODY><NAV>skip me</NAV><P>body text</P><FOOTER>and me</FOOTER></BODY></HTML>")
    assert(text == "body text")
  }

  test("title extracted from head, not leaked into body text") {
    val (title, text) = extract(
      "<html><head><title>The Title</title></head><body><p>content</p></body></html>")
    assert(title == "The Title")
    assert(text == "content")
  }

  test("entities decode once: &amp;lt; becomes the literal &lt;") {
    val (_, text) = extract(
      "<html><body><p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp;lt;</p></body></html>")
    assert(text == "a & b <tag> \"q\" 's' &lt;")
  }

  test("no body / no title yield empty strings, not errors") {
    val (title, text) = extract("just plain text, no markup")
    assert(title == "")
    assert(text == "")
  }

  test("unclosed script strips to the next close tag, never to EOF twice") {
    // the unclosed block eats through its own close only; the second
    // paragraph survives
    val (_, text) = extract(
      "<html><body><p>a</p><script>var x=1;</script><p>b</p></body></html>")
    assert(text == "a b")
  }

  test("null html yields null columns") {
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "h")
      .select(TextAnalysisOps.htmlTextExtract(col("h"))
        .map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
