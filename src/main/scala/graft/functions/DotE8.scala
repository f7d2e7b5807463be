package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `dot_e8(a, b)` — exact quantized dot product of two float arrays:
  * Σᵢ round(aᵢ·10⁴) · round(bᵢ·10⁴) as int64.
  *
  * This is the hot inner loop of the similarity operators. The
  * `aggregate(zip_with(…))` formulation runs as an interpreted
  * higher-order function (two lambda invocations per element); this
  * native expression stays inside whole-stage codegen — one fused Java
  * loop per row, no per-element closures, no intermediate array.
  *
  * Determinism: integer products and sums only, so the result is
  * independent of accumulation order and bit-identical across engines.
  * `Math.round` (half-up) differs from away-from-zero rounding only on
  * exact .5 ties, which cannot occur here: a tie needs x = (2k+1)/2·10⁻⁴
  * and no such value is a dyadic rational, so no float hits one.
  */
case class DotE8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_e8 requires two array<float> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_e8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += Math.round(x.getFloat(i).toDouble * 10000.0) *
        Math.round(y.getFloat(i).toDouble * 10000.0)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Math.round((double) $a.getFloat($i) * 10000.0)
         |    * java.lang.Math.round((double) $b.getFloat($i) * 10000.0);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotE8 = copy(left = newLeft, right = newRight)
}

object DotE8 {
  private val info = new ExpressionInfo(classOf[DotE8].getName, "dot_e8")
  private val builder = (args: Seq[Expression]) => {
    require(args.length == 2, "dot_e8 takes exactly 2 arguments")
    DotE8(args.head, args(1))
  }

  /** Idempotent per-session registration, for sessions the engine did
    * not create (the driver owns ours). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_e8", builder, "built-in")
}

/** `SparkSessionExtensions` hook — the supported way to ship the
  * function into sessions built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("dot_e8"),
      new ExpressionInfo(classOf[DotE8].getName, "dot_e8"),
      (args: Seq[Expression]) => DotE8(args.head, args(1))))
}
