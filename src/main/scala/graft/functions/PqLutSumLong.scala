package graft.functions

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd PQ symmetric-distance gather-sum:
  * `pq_lut_sum_long(table, a, b, k)` = Σᵢ table[i·k² + a[i]·k + b[i]]
  * over i < min(|a|,|b|) — the per-candidate approximate dot of the
  * dense-core pre-verify ([[graft.operators.Similarity.pqPreVerify]]).
  *
  * The composable form —
  * `aggregate(transform(zip_with(a, b, …), (v, s) -> element_at(…)), …)`
  * — evaluates THREE interpreted higher-order lambdas and allocates two
  * intermediate arrays per candidate pair; on a quadratic candidate
  * stream that interpretation cost dominates the whole pre-verify. This
  * is the fused kernel (one loop, no allocation), the [[ArrayDotLong]]
  * discipline applied to the LUT gather. An out-of-range gather (only
  * possible when table and codes disagree on k — a caller bug) FAILS
  * LOUDLY: zeroing a positive centroid-dot term would LOWER the upper
  * bound the pre-verify relies on, i.e. the fail-soft direction would
  * be false negatives (silently dropped true pairs), the one thing the
  * consumer's contract forbids.
  */
case class PqLutSumLong(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>, array<bigint>, int), got " +
        Seq(first, second, third, fourth).map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_lut_sum_long"

  override def nullSafeEval(t: Any, a: Any, b: Any, kv: Any): Any = {
    val table = t.asInstanceOf[ArrayData]
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val k = kv.asInstanceOf[Int]
    val n = math.min(x.numElements(), y.numElements())
    val tn = table.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val idx = i.toLong * k * k + x.getLong(i) * k + y.getLong(i)
      if (idx < 0 || idx >= tn)
        throw new IllegalArgumentException(
          s"pq_lut_sum_long: gather index $idx out of table range [0, $tn) " +
            s"at sub $i (k=$k) — table and codes disagree on the codebook")
      acc += table.getLong(idx.toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a, b, kv) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val tn = ctx.freshName("tn")
      val idx = ctx.freshName("idx")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $tn = $t.numElements();
         |long ${ev.value}Acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $idx = (long) $i * $kv * $kv + $a.getLong($i) * $kv + $b.getLong($i);
         |  if ($idx < 0 || $idx >= $tn) {
         |    throw new IllegalArgumentException(
         |      "pq_lut_sum_long: gather index " + $idx + " out of table range [0, " +
         |      $tn + ") at sub " + $i + " (k=" + $kv + "): table and codes disagree on the codebook");
         |  }
         |  ${ev.value}Acc += $t.getLong((int) $idx);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): PqLutSumLong =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object PqLutSumLong {
  val name = "pq_lut_sum_long"

  def register(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[PqLutSumLong].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 4, s"$name takes exactly 4 arguments")
        PqLutSumLong(args(0), args(1), args(2), args(3))
      }))

  def lutSum(table: Column, a: Column, b: Column, k: Int): Column =
    F.call_function(name, table, a, b, F.lit(k))
}
