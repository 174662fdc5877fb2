package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** StripAccents: the native accent-folding expression must agree with
  * DuckDB's `strip_accents` (utf8proc STRIPMARK rule — the q101b oracle
  * twin). The golden pairs below were probed against DuckDB directly;
  * the non-decomposable rows (đ, ß, ø, ligatures) are the contract's
  * edge: accent folding is NOT transliteration.
  */
class StripAccentsSpec extends SparkSpec {
  import sqlImplicits._

  private def cp(codepoints: Int*): String =
    codepoints.map(c => new String(Character.toChars(c))).mkString

  private def fold(s: String): String =
    Seq(s).toDF("t")
      .select(StripAccents.stripAccents(col("t")))
      .head().getString(0)

  test("accented letters fold to their base letters (DuckDB goldens)") {
    // café -> cafe ; ÀÉÎÕÜ -> AEIOU
    assert(fold("caf" + cp(0xE9)) == "cafe")
    assert(fold(cp(0xC0, 0xC9, 0xCE, 0xD5, 0xDC)) == "AEIOU")
    // naïve coöperate -> naive cooperate
    assert(fold("na" + cp(0xEF) + "ve co" + cp(0xF6) + "perate") ==
      "naive cooperate")
    // Ślůsarski -> Slusarski ; łódź -> łodz
    assert(fold(cp(0x15A) + "l" + cp(0x16F) + "sarski") == "Slusarski")
    assert(fold(cp(0x142, 0xF3) + "d" + cp(0x17A)) == cp(0x142) + "odz")
    assert(fold(cp(0xF1)) == "n")
  }

  test("non-decomposable letters stay: folding is not transliteration") {
    // Đorđe, ußball, ø, ﬁre unchanged
    assert(fold(cp(0x110) + "or" + cp(0x111) + "e") ==
      cp(0x110) + "or" + cp(0x111) + "e")
    assert(fold("u" + cp(0xDF) + "ball") == "u" + cp(0xDF) + "ball")
    assert(fold(cp(0xF8)) == cp(0xF8))
    assert(fold(cp(0xFB01) + "re") == cp(0xFB01) + "re")
  }

  test("decomposed input folds identically to composed input") {
    // e + combining acute and é both fold to plain e
    assert(fold("cafe" + cp(0x0301)) == "cafe")
    assert(fold("caf" + cp(0xE9)) == "cafe")
  }

  test("Hangul recomposes after the strip (NFC tail keeps it byte-stable)") {
    val hangul = cp(0xD55C, 0xAD6D) // NFC-composed syllables
    assert(fold(hangul) == hangul)
  }

  test("CJK and astral text pass through; marks around them still fold") {
    val s = cp(0x4E2D, 0x6587) + " caf" + cp(0xE9) + " " + cp(0x1F600)
    assert(fold(s) == cp(0x4E2D, 0x6587) + " cafe " + cp(0x1F600))
  }

  test("pure ASCII and null follow the NfcNormalize contracts") {
    val df = Seq[(java.lang.Long, String)](
      (1L, null), (2L, "plain ascii"), (3L, ""))
      .toDF("id", "t")
      .select(col("id"), StripAccents.stripAccents(col("t")).as("n"))
    val got = df.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, null), (2L, "plain ascii"), (3L, "")))
    // interpreted path agrees with codegen
    assert(StripAccents.strip(
      org.apache.spark.unsafe.types.UTF8String.fromString("caf" + cp(0xE9)))
      .toString == "cafe")
  }
}
