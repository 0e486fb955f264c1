package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd integer dot product over two `array<bigint>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * materializes an intermediate array per row and evaluates two
  * higher-order lambdas; this expression is the fused kernel (one loop,
  * no allocation) for the embedding-similarity hot path (SURVEY.md §7.4:
  * custom `Expression` only for hot per-block kernels where codegen
  * wins matter). Whole-stage codegen emits the loop inline via
  * [[doGenCode]]; `eval` provides the interpreted fallback.
  *
  * Semantics match the composable form exactly: null if either side is
  * null, sum over the common prefix length, null array elements count
  * as 0 (quantized embeddings are never null in practice).
  */
case class ArrayDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "array_dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value}Acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArrayDotLong =
    copy(left = newLeft, right = newRight)
}

object ArrayDotLong {
  val name = "array_dot_long"

  /** Register through the public extension point
    * (`SparkSession.builder.withExtensions`). */
  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[ArrayDotLong].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name takes exactly 2 arguments")
        ArrayDotLong(args(0), args(1))
      }))

  /** Column-API entry point (resolves via the registered function). */
  def dotLong(a: Column, b: Column): Column = F.call_function(name, a, b)
}
