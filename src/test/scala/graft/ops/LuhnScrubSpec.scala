package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Known-vector units for the q122/q101c operators: Luhn against
  * published test numbers, the invisible scrub against each codepoint in
  * its class.
  */
class LuhnScrubSpec extends SparkSpec {
  import sqlImplicits._

  private def luhn(s: String): Boolean =
    Seq(s).toDF("d")
      .select(TextAnalysisOps.luhnValid(col("d"))).head().getBoolean(0)

  test("luhnValid accepts published test card numbers and rejects " +
      "off-by-one check digits") {
    // the canonical public test numbers (Visa/MC/Amex-16 test vectors)
    assert(luhn("4111111111111111"))
    assert(luhn("4012888888881881"))
    assert(luhn("5555555555554444"))
    assert(!luhn("4111111111111112"))
    assert(!luhn("4012888888881882"))
    // non-16 lengths still validate by the same rule (Luhn is
    // length-generic): 79927398713 is the classic worked example
    assert(luhn("79927398713"))
    assert(!luhn("79927398714"))
  }

  test("scrubInvisible removes every codepoint in its class and nothing else") {
    val invisibles = Seq(0x200B, 0x200C, 0x200D, 0x2060, 0xFEFF, 0x00AD)
      .map(cp => new String(Character.toChars(cp)))
    val dirty = invisibles.mkString("a", "b", "c") // a<z>b<z>b...c
    val got = Seq(dirty).toDF("t")
      .select(TextAnalysisOps.scrubInvisible(col("t"))).head().getString(0)
    assert(got == "a" + "b" * (invisibles.size - 1) + "c")
    // visually-similar but LEGITIMATE whitespace survives
    val keep = "a b\tc\nd" + " " + "e" // nbsp is rendered space, kept
    val got2 = Seq(keep).toDF("t")
      .select(TextAnalysisOps.scrubInvisible(col("t"))).head().getString(0)
    assert(got2 == keep)
  }
}
