package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys at scale.
  *
  * A shuffle join on a key with heavy skew (one hot key holding a large
  * fraction of rows) puts the whole hot partition on one task. AQE's skew
  * join splits oversized partitions at runtime, but only for sort-merge
  * joins after materialization; explicit salting is the portable fix when
  * the skew is known (and the only fix for aggregate-then-join shapes).
  */
object JoinOps {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt in
    * [0, salts) derived from its full row hash; the other side is
    * replicated `salts` times. The join key becomes (key, salt), spreading
    * each hot key over `salts` partitions. Equivalent to
    * `skewed.join(other, key)` for any 1:N relationship where `other` has
    * unique keys (each skewed row meets each matching other row exactly
    * once, in exactly one salt bucket).
    *
    * Cost: `other` is shuffled/broadcast `salts` times — size accordingly
    * (dim tables, pre-aggregated sides).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
