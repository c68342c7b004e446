package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The built-in spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0L,
  * (acc,v) -> acc+v)` materialises an intermediate array per row pair
  * and evaluates two lambda chains; this expression emits a single
  * fused loop into whole-stage codegen — the hot inner kernel of the
  * ANN / embedding-dedup operators, where it runs once per candidate
  * pair. Null-safe; arrays of unequal length use the common prefix.
  *
  * This is deliberately the (c)-tier extension point of the build
  * doctrine: compose built-ins where they express the semantics, drop
  * to a native `Expression` with `doGenCode` only where the built-in
  * form leaves real performance on the table.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}_acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** Registration surfaces for graft's native functions. */
object GraftFunctions {

  private val dotLongInfo = new ExpressionInfo(classOf[DotLong].getName, "dot_long")
  private val dotLongBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"dot_long expects 2 arguments, got ${args.length}")
    DotLong(args.head, args(1))
  }

  /** Idempotent in-session registration; afterwards
    * `expr("dot_long(a, b)")` / SQL `dot_long(a, b)` resolve. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_long"), dotLongInfo, dotLongBuilder)

  /** For `spark.sql.extensions=graft.functions.GraftExtensions`. */
  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("dot_long"), dotLongInfo, dotLongBuilder))
}

/** Session-extensions entry point (config-time injection, the way a
  * deployment ships these functions to every session on a cluster). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
