package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-arithmetic helpers for oracle-comparable aggregates.
  *
  * Summing IEEE doubles is order-dependent, and Spark's partition order is
  * nondeterministic — so `sum(double)` can differ from DuckDB's sum at the
  * ulp level and break hash comparison. The fix: cast to decimal *before*
  * aggregating (exact, order-independent), and cast the final sum back to
  * double. Both engines then compute bit-identical results.
  *
  * Scale note: decimal sums are also the right call at 100 TB — Spark's
  * decimal `sum` is a partial-aggregatable exact accumulator (map-side
  * combine works), so there is no distributed-correctness tradeoff.
  */
object Exact {
  /** Money-ish values, |x| < 1e10, 4 decimal places kept. */
  val M: DecimalType = DecimalType(14, 4)
  /** Rates/discounts, |x| < 1e4. */
  val R: DecimalType = DecimalType(8, 4)

  def money(c: Column): Column = c.cast(M)
  def rate(c: Column): Column = c.cast(R)

  /** Exact sum, returned as double (deterministic).
    *
    * The sum is first re-scaled to 6 decimal places: a scale-12 decimal sum
    * has ~21 significant digits, and decimal→double conversion of such
    * values is rounded differently by Spark (BigDecimal.doubleValue) vs
    * DuckDB (hugeint/10^s float division). At scale 6 with |v| < 9e9 the
    * scaled integer fits in 53 bits, so the conversion is exact everywhere.
    * Scale 6 (not 4) because money products are naturally 6dp (2dp price ×
    * 2dp rate × 2dp rate) — rescaling those to 4dp would sit exactly on
    * .00005 rounding boundaries where Spark (HALF_UP) and DuckDB disagree;
    * at 6dp clean values need no rounding at all.
    */
  def dsum(c: Column): Column =
    sum(c).cast(DecimalType(24, 6)).cast(DoubleType)

  /** Deterministic average = exact decimal sum / count, in double. */
  def davg(c: Column): Column = dsum(money(c)) / count(lit(1))

  // SQL-side (DuckDB dialect) equivalents, kept adjacent so the two
  // dialects stay in lockstep.
  def sqlMoney(e: String): String = s"CAST($e AS DECIMAL(14,4))"
  def sqlRate(e: String): String = s"CAST($e AS DECIMAL(8,4))"
  def sqlDsum(e: String): String = s"CAST(CAST(SUM($e) AS DECIMAL(24,6)) AS DOUBLE)"
  def sqlDavg(e: String): String = s"${sqlDsum(sqlMoney(e))} / COUNT(*)"
}
