package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Temporal join operators Spark's built-in join strategies don't express
  * directly: the as-of join (each left row picks the LATEST right row at or
  * before its timestamp) and the bounded range join (all pairs within a
  * fixed time window), both composed from equi-join/window primitives so
  * Catalyst plans them with ordinary shuffles — never a per-key nested
  * loop.
  *
  * The reference resolves "latest version at or before t" per entity inside
  * its KV index (crux-core/src/crux/kv/index_store.clj:507-540, the
  * entity-as-of seek); [[graft.bitemp.Bitemp.asOf]] re-expresses that as an
  * aggregate. These operators are the GENERAL form over any two tables —
  * the shape a feature pipeline needs ("join each label to the latest
  * feature row at or before label time").
  *
  * All window/tolerance arithmetic runs in exact integer epoch-micros
  * (timestamps) or the column's own numeric unit — no double rounding at
  * window boundaries, so results are bit-stable at any parallelism.
  */
object TemporalJoin {

  /** Exact epoch-micros for timestamp columns (sessions run UTC, so the
    * NTZ→instant cast is the identity mapping); numeric columns are taken
    * as seconds and scaled. */
  private def epochMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast("timestamp"))
    case _ => (c.cast("double") * 1e6).cast("long")
  }

  /** Backward as-of join: for every left row, attach the right row with the
    * greatest `rightTs <= leftTs` within the same `keys` group (ties on the
    * same instant match, like DuckDB/kdb ASOF semantics). Right columns
    * come back `rightPrefix`-ed and are null when no prior row exists
    * (left-outer semantics). With `toleranceSeconds`, matches further than
    * the tolerance in the past are nulled out (pandas merge_asof
    * tolerance).
    *
    * Plan shape (the scale story): tag both inputs, union, ONE shuffle on
    * `keys`, one within-partition sort, then `last(_, ignoreNulls)` over a
    * running window fills each left row with the most recent right payload
    * — the classic sorted-merge as-of. No range-condition join (which
    * Catalyst would execute as a per-key nested loop: every left row
    * scanning every right row in its key group), no per-key collect. Cost
    * is O(n log n) per partition; a key group never has to fit anywhere
    * special — the window streams it. At 100 TB the shuffle is the only
    * data movement, identical to what a plain equi-join would pay.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    val lCols = left.columns.toSeq
    val rPayCols = right.columns.toSeq.filterNot(keys.contains)
    // _side orders right rows BEFORE left rows at an equal timestamp, so a
    // left row at exactly rightTs sees it (>= / <= semantics include the
    // same instant). Equal right timestamps within a key tie-break by
    // input order — callers wanting full determinism there ensure
    // (keys, rightTs) is unique, same as every as-of implementation.
    // Forward direction ("earliest right row at or after") is the same
    // merge with the time axis reversed: sort descending, so the running
    // last() carries the NEAREST FUTURE right payload down to each left
    // row.
    val rTag = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(rPayCols.map(col): _*).as("_rpay")): _*)
    val lTag = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side"),
        struct(lCols.map(col): _*).as("_lpay")): _*)
    val u = rTag.unionByName(lTag, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (fwd) col("_ts").desc else col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_m", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val withTol = toleranceSeconds match {
      case Some(sec) =>
        val lUs = epochMicros(col("_ts"), left.schema(leftTs).dataType)
        val rUs = epochMicros(col("_m")(rightTs), right.schema(rightTs).dataType)
        val gap = if (fwd) rUs - lUs else lUs - rUs
        matched.withColumn("_m",
          when(col("_m").isNotNull && gap <= sec * 1000000L, col("_m")))
      case None => matched
    }
    withTol.select(
      lCols.map(c => col("_lpay")(c).as(c)) ++
        rPayCols.map(c => col("_m")(c).as(rightPrefix + c)): _*)
  }

  /** Bounded range join: all (left, right) pairs with equal `keys` and
    * `rightTs` in `[leftTs, leftTs + windowSeconds]` (inner join; right
    * columns `rightPrefix`-ed).
    *
    * Plan shape: both sides bucket into `windowSeconds`-wide epochs; a
    * right row in bucket b can only match left rows in buckets b-1 or b,
    * so the left side explodes ×2 onto (keys, bucket) and the join is a
    * plain EQUI-join on the composite key, followed by the exact range
    * filter. Catalyst executes `l.k = r.k AND r.ts BETWEEN …` as an
    * equi-join on k alone with the range as a per-group post-filter — for
    * a skewed key (one user with 10M events) that's a 10M × 10M pair scan
    * in ONE task. Bucketing makes the join key (k, epoch), so the same
    * hot key spreads across time and AQE's skew splitting can cut it
    * further. The ×2 row duplication is the entire extra cost — fixed,
    * visible, and map-side.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, windowSeconds: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    val windowMicros = windowSeconds * 1000000L
    val rPayCols = right.columns.toSeq.filterNot(keys.contains)
    val lUs = epochMicros(col(leftTs), left.schema(leftTs).dataType)
    val rUsIn = epochMicros(col(rightTs), right.schema(rightTs).dataType)
    // `div` = exact integer division (epochs are nonnegative); a double
    // divide could mis-bucket a row sitting within rounding distance of a
    // bucket boundary
    val lExp = left
      .withColumn("_lus", lUs)
      .withColumn("_b0", expr(s"_lus div $windowMicros"))
      .withColumn("_bucket", explode(array(col("_b0"), col("_b0") + 1)))
      .drop("_b0")
    val rRen = rPayCols.foldLeft(right.withColumn("_rus", rUsIn)) {
      (df, c) => df.withColumnRenamed(c, rightPrefix + c)
    }.withColumn("_bucket", expr(s"_rus div $windowMicros"))
    lExp.join(rRen, keys :+ "_bucket")
      .filter(col("_rus") >= col("_lus") &&
        col("_rus") <= col("_lus") + windowMicros)
      .drop("_bucket", "_lus", "_rus")
  }
}
