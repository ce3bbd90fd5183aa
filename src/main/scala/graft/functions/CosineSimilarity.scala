package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for cosine similarity over double arrays —
  * the "(b) custom Catalyst `Expression`" extension point (SURVEY §7.3):
  * `doGenCode` emits a primitive loop that stays inside whole-stage
  * codegen, vs a Scala UDF's boxed Row round-trip per call. Used by the
  * ANN/similarity operators wherever the relational (non-broadcast-kernel)
  * path runs.
  *
  * Float inputs are cast to `array<double>` by the registration builder
  * (embeddings are `array<float>` on disk). Zero-norm vectors yield NULL.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<double> arguments, got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // zero-norm → null
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx * ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName everywhere: two cosine_sim calls may share one codegen
      // scope, and fixed locals would redeclare
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $a.getDouble($i);
          double $yv = $b.getDouble($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        double $denom = java.lang.Math.sqrt($nx * $ny);
        if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $denom; }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Single source of truth for both registration paths (live session and
    * SparkSessionExtensions) — the builder's arity check and the
    * cast-to-array<double> wrapping must never diverge between them. */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes exactly 2 arguments")
        CosineSimilarity(castToDoubleArray(children.head), castToDoubleArray(children(1)))
      }),
    (FunctionIdentifier("fuzzy_token_match"),
      new ExpressionInfo(classOf[FuzzyTokenMatch].getName, "fuzzy_token_match"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "fuzzy_token_match takes exactly 3 arguments")
        FuzzyTokenMatch(children.head, children(1), Cast(children(2), IntegerType))
      }),
    (FunctionIdentifier("morton_z"),
      new ExpressionInfo(classOf[MortonZ].getName, "morton_z"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "morton_z takes exactly 2 arguments")
        MortonZ(children.head, children(1))
      }))

  private def castToDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  /** Register on a live session (tests, gate queries). */
  def register(spark: SparkSession): Unit =
    entries.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * SparkSessionExtensions registration path for cluster deployments. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.entries.foreach(ext.injectFunction)
}
