package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing, expressible identically in Spark and in
  * the driver's DuckDB oracle (SURVEY.md §5.2: every verified operator needs
  * a cross-engine-exact formulation).
  *
  * Spark's native `hash`/`xxhash64` have no DuckDB twin, so dedup operators
  * (MinHash, SimHash, fingerprints — SURVEY.md §7.2 step 6) are built on a
  * polynomial rolling hash over code points mod the Mersenne prime 2^31-1:
  * `h = fold(chars, 7, (h, c) => (h*31 + c) mod P)`. All arithmetic stays
  * below 2^63 (h < 2^31, h*31 + c < 2^36), so both engines compute exact
  * Int64 values. The fold is a left fold in both (`aggregate` here,
  * `list_reduce` there).
  *
  * Scale: these are narrow per-row projections — zero shuffle, codegen'd
  * higher-order functions. At 100 TB the cost is one pass over the tokens a
  * row already holds.
  */
object HashOps {

  /** Modulus: Mersenne prime 2^31 - 1. */
  val P = 2147483647L

  /** Seed of the character fold. */
  val Seed = 7L

  /** Number of MinHash permutations (signature length). */
  val MinHashK = 16

  /** (a, b) coefficients of the k MinHash permutations
    * `h_i(x) = (a_i * x + b_i) mod P` — fixed LCG-derived constants so the
    * Scala operator and the generated oracle SQL share them verbatim.
    */
  val MinHashPerms: Seq[(Long, Long)] = {
    var x = 88172645463325252L
    def next(): Long = { // xorshift64, public-domain PRNG (Marsaglia 2003)
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      math.floorMod(x, P - 1) + 1
    }
    Seq.fill(MinHashK)((next(), next() - 1))
  }

  /** Polynomial hash of a string column: left fold over its code points.
    * Empty / null strings hash to the seed. Backed by the fused native
    * expression [[graft.functions.PolyCharHash]] — same fold as
    * [[charHashHof]] (agreement property-tested incl. multi-byte code
    * points) without the per-character array allocation.
    */
  def charHash(c: Column): Column =
    graft.functions.PolyCharHash.polyCharHash(coalesce(c, lit("")))

  /** The higher-order-function formulation of [[charHash]] — the readable
    * reference the native expression must agree with (and the shape a
    * Spark deployment without the extension jar would use).
    */
  def charHashHof(c: Column): Column = {
    val chars = filter(split(coalesce(c, lit("")), ""), s => length(s) > 0)
    aggregate(chars, lit(Seed), (h, ch) => (h * 31 + ascii(ch)) % P)
  }

  /** 62-bit content key for exact-dedup grouping: two independent
    * polynomial folds (multipliers 31/131, seeds 7/13) combined as
    * `h1*P + h2` in ONE fused byte walk — see
    * [[graft.functions.ContentKey64]] for the collision stance. Group /
    * window / join keys over document or chunk TEXT must use this, never
    * the raw string: at 100 TB a text-keyed exchange ships the corpus as
    * its own key; this ships 8 bytes per row.
    */
  def contentKey(c: Column): Column =
    graft.functions.ContentKey64.contentKey64(coalesce(c, lit("")))

  /** [[contentKey]]'s higher-order-function reference formulation (the
    * agreement target of the fused native expression).
    */
  def contentKeyHof(c: Column): Column = {
    val chars = filter(split(coalesce(c, lit("")), ""), s => length(s) > 0)
    val h1 = aggregate(chars, lit(Seed), (h, ch) => (h * 31 + ascii(ch)) % P)
    val h2 = aggregate(chars, lit(13L), (h, ch) => (h * 131 + ascii(ch)) % P)
    h1 * lit(P) + h2
  }

  /** Rolling fingerprint of a token-array column: left fold of the per-token
    * char hashes with multiplier 131 (a second-level polynomial hash, so the
    * fingerprint is order-sensitive — "a b" != "b a").
    *
    * IMPORTANT: pass an attribute reference (stage the token array in a
    * prior select), not a nested expression — lambda duplication otherwise
    * re-evaluates the tokenization per element.
    */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(tokens, lit(Seed), (h, t) => (h * 131 + charHash(t)) % P)

  /** The i-th MinHash permutation applied to an already-hashed value. */
  def perm(i: Int, h: Column): Column = {
    val (a, b) = MinHashPerms(i)
    (lit(a) * h + lit(b)) % P
  }

  // ---- DuckDB oracle twins (same constants, same fold) -------------------

  /** DuckDB SQL for `charHash` of expression `c`. The empty-string guard
    * matters: DuckDB's `string_split('', '')` yields `['']` whose
    * `ascii` is 0, which would fold once and diverge from the engine's
    * seed-only result — unreachable for the non-empty tokens/shingles the
    * dedup operators hash, but the twins should agree on every input.
    */
  def charHashSql(c: String): String = polyHashSql(c, 31L, Seed)

  /** DuckDB SQL for one polynomial code-point fold with the given
    * multiplier and seed — the shared body of [[charHashSql]] and
    * [[contentKeySql]]'s two folds.
    */
  private def polyHashSql(c: String, mult: Long, seed: Long): String =
    s"CASE WHEN coalesce($c, '') = '' THEN CAST($seed AS BIGINT) ELSE " +
      s"list_reduce(list_prepend(CAST($seed AS BIGINT), " +
      s"list_transform(string_split(coalesce($c, ''), ''), " +
      s"ch -> CAST(ascii(ch) AS BIGINT))), (h, ch) -> (h*$mult + ch) % $P) END"

  /** DuckDB SQL twin of [[contentKey]]: the two folds as two list_reduce
    * passes, combined `h1*P + h2` (all < 2^62, exact in BIGINT).
    */
  def contentKeySql(c: String): String =
    s"(${polyHashSql(c, 31L, Seed)} * $P + ${polyHashSql(c, 131L, 13L)})"

  /** DuckDB SQL for `rollingFingerprint` of a list expression `toks`. */
  def rollingFingerprintSql(toks: String): String =
    s"list_reduce(list_prepend(CAST($Seed AS BIGINT), " +
      s"list_transform($toks, t -> ${charHashSql("t")})), " +
      s"(h, t) -> (h*131 + t) % $P)"

  /** DuckDB SQL for MinHash permutation i over hashed value expression. */
  def permSql(i: Int, h: String): String = {
    val (a, b) = MinHashPerms(i)
    s"(($a * $h + $b) % $P)"
  }
}
