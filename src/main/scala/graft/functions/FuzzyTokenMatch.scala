package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `fuzzy_token_match(tokens, target, maxEdits)`: does any token of the
  * array sit within unrestricted Damerau-Levenshtein distance `maxEdits`
  * of `target`?
  *
  * This is the match kernel of Lucene-style fuzzy search (`term~N`,
  * crux-lucene/src/crux/lucene.clj:135-144): Lucene's `FuzzyQuery` counts
  * an adjacent transposition as ONE edit (and the transposed pair may be
  * edited again — `ca`~2 matches `abc`), the same semantics as DuckDB's
  * `damerau_levenshtein`, which the correctness oracle asserts against.
  * A native expression rather than a UDF because Spark higher-order
  * lambdas can't call UDFs and the per-token loop belongs inside
  * whole-stage codegen.
  */
case class FuzzyTokenMatch(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType match {
      case ArrayType(StringType, _) => true; case _ => false
    }) && second.dataType == StringType && third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fuzzy_token_match expects (array<string>, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "fuzzy_token_match"

  override protected def nullSafeEval(arr: Any, target: Any, edits: Any): Any =
    FuzzyOps.anyWithin(arr.asInstanceOf[ArrayData],
      target.asInstanceOf[UTF8String], edits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, t, e) => {
      s"${ev.value} = graft.functions.FuzzyOps.anyWithin($arr, $t, $e);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): FuzzyTokenMatch =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object FuzzyOps {

  /** Codegen entry point: any non-null token within `maxEdits`. */
  def anyWithin(arr: ArrayData, target: UTF8String, maxEdits: Int): Boolean = {
    val t = target.toString
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && within(arr.getUTF8String(i).toString, t, maxEdits))
        return true
      i += 1
    }
    false
  }

  /** Unrestricted Damerau-Levenshtein distance(a, b) <= maxEdits.
    * Full DP with the alphabet-indexed `da` table (the classic
    * Lowrance-Wagner formulation) — tokens are short, so the O(n*m)
    * table is a handful of cache lines; the length-difference guard
    * rejects most candidates before any allocation. */
  def within(a: String, b: String, maxEdits: Int): Boolean = {
    val n = a.length; val m = b.length
    if (math.abs(n - m) > maxEdits) return false
    if (maxEdits <= 0) return a == b
    val inf = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w) // d(i)(j) = d[i*w + j]
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= m) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      val ac = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bc = b.charAt(j - 1)
        val kBox = da.get(Character.valueOf(bc))
        val k = if (kBox == null) 0 else kBox.intValue()
        val l = db
        var cost = 1
        if (ac == bc) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        d((i + 1) * w + j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da.put(Character.valueOf(ac), Integer.valueOf(i))
      i += 1
    }
    d((n + 1) * w + m + 1) <= maxEdits
  }
}
