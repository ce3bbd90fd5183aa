package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew-mitigation
  * technique for when AQE's skew-join splitting can't apply (e.g. the
  * skewed side feeds a window or the join is inside a cached subplan).
  *
  * The big/skewed LEFT side appends a deterministic content-derived salt
  * in [0, saltBuckets); the smaller RIGHT side replicates once per salt
  * value (a map-side explode — no shuffle). The join key becomes
  * (keys…, salt), so one hot key's rows spread over `saltBuckets`
  * reducers instead of landing on one. Result rows are EXACTLY the plain
  * inner join's: every left row still meets every matching right row —
  * in precisely one salt bucket.
  *
  * Cost model: right side ×saltBuckets rows (choose saltBuckets ≪
  * left-rows-per-hot-key; the right side should be the dimension-ish
  * side — if it's too big to replicate, broadcast thresholds were never
  * the problem and range/bucket layouts are the right tool instead).
  * The salt is hashed from the left row's full content, not `rand()`, so
  * retried tasks place rows identically — required for deterministic
  * shuffle outputs at scale.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    val lSalted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(saltBuckets.toLong)))
    val rExploded = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1))))
    lSalted.join(rExploded, keys :+ "_salt").drop("_salt")
  }
}
