package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayDotLongSpec extends SparkSpec {

  test("matches the composable zip_with/aggregate form on random arrays") {
    import spark.implicits._
    val df = (0 until 200).map { i =>
      (i.toLong,
       Array.tabulate(64)(j => graft.array.DMatrix.lcg(i, j, 64, 3L) % 2000L - 1000L),
       Array.tabulate(64)(j => graft.array.DMatrix.lcg(i, j, 64, 9L) % 2000L - 1000L))
    }.toDF("id", "a", "b")
    val native = ArrayDotLong.dotLong(col("a"), col("b"))
    val composed = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
                             lit(0L), (acc, v) => acc + v)
    val diff = df.select(native.as("n"), composed.as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(diff == 0)
  }

  test("null and length edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1L, 2L, 3L), Array(4L, 5L, 6L)),       // 32
      (2L, Array(1L, 2L), Array(10L, 10L, 99L)),        // common prefix: 30
      (3L, Array.empty[Long], Array(1L)),               // 0
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), ArrayDotLong.dotLong(col("a"), col("b")).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 32L, 2L -> 30L, 3L -> 0L))
    val withNull = df.withColumn("b2", when(col("id") === 1, col("b")))
      .select(col("id"), ArrayDotLong.dotLong(col("a"), col("b2")).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(withNull == Map(1L -> false, 2L -> true, 3L -> true), "null array -> null result")
  }

  test("type check rejects non-long arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(ArrayDotLong.dotLong(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), s"unexpected: ${e.getMessage}")
  }

  test("whole-stage codegen compiles the fused loop (no fallback)") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L), Array(3L, 4L))).toDF("a", "b")
      .select(ArrayDotLong.dotLong(col("a"), col("b")).as("d"))
    assert(df.head.getLong(0) == 11L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Fallback"), "expression fell out of codegen")
  }
}
