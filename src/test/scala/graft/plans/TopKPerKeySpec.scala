package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rank-filter rewrite must (a) fire on the canonical pattern,
  * (b) produce exactly row_number's answer on a total order, and
  * (c) never sort the RAW input — the only Sort in the plan is the
  * stock external (spillable) sort of the partial-pass-reduced stream
  * that feeds the O(1)-state final pass. */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  private def data = (1 to 5000).map { i =>
    val key = i % 97
    // mixed-hash value → total order per key via (value desc, id)
    val v = graft.array.DMatrix.mix64(i.toLong * 31L) % 100000L
    (key, v, i.toLong)
  }.toDF("key", "v", "id")

  test("rewritten top-k matches a driver-side row_number reference") {
    val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))
    val df = data.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
    val got = df.select("key", "id", "rank").as[(Int, Long, Int)].collect().toSet
    val want = data.as[(Int, Long, Long)].collect()
      .groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        rows.sortBy(r => (-r._2, r._3)).take(3).zipWithIndex
          .map { case (r, i) => (k, r._3, i + 1) }
      }.toSet
    assert(got == want)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rewrite did not fire:\n$plan")
    // The partial pass (last TopKPerKey line) must sit directly on the
    // source: any Sort may only appear ABOVE it, i.e. over the reduced
    // shuffle stream, never over the raw input.
    val belowPartial = plan.substring(plan.lastIndexOf("TopKPerKey"))
    assert(!belowPartial.contains("Sort "),
      s"raw input must not be sorted below the partial pass:\n$plan")
    assert(plan.indexOf("Sort ") > plan.indexOf("TopKPerKey"),
      s"the reduced-stream sort must sit below the final pass:\n$plan")
  }

  test("top-1 via rank = 1 and k beyond group size both match row_number") {
    val w = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
    val top1 = data.withColumn("rank", row_number().over(w)).filter(col("rank") === 1)
    assert(top1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got1 = top1.select("key", "id").as[(Int, Long)].collect().toSet
    val want1 = data.as[(Int, Long, Long)].collect()
      .groupBy(_._1).map { case (k, rows) => (k, rows.minBy(r => (r._2, r._3))._3) }.toSet
    assert(got1 == want1)
    // k larger than every group: all rows come back, ranks dense from 1
    val all = data.withColumn("rank", row_number().over(w)).filter(col("rank") <= 9999)
    assert(all.count() == 5000)
    assert(all.groupBy(col("key")).agg(max(col("rank")).as("m"), count(lit(1)).as("n"))
      .filter(col("m") =!= col("n")).isEmpty, "ranks must stay dense per key")
  }

  test("partial-pass overflow path (key map capped) still matches row_number") {
    System.setProperty("graft.topk.maxPartialKeys", "8")
    try {
      val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))
      val df = data.withColumn("rank", row_number().over(w)).filter(col("rank") <= 2)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      val got = df.select("key", "id", "rank").as[(Int, Long, Int)].collect().toSet
      val want = data.as[(Int, Long, Long)].collect()
        .groupBy(_._1).toSeq.flatMap { case (k, rows) =>
          rows.sortBy(r => (-r._2, r._3)).take(2).zipWithIndex
            .map { case (r, i) => (k, r._3, i + 1) }
        }.toSet
      assert(got == want, "overflow keys must still produce exact top-k")
    } finally System.clearProperty("graft.topk.maxPartialKeys")
  }

  test("non-matching shapes are left alone (rank emitted, other window funcs)") {
    val w = Window.partitionBy(col("key")).orderBy(col("v"), col("id"))
    // rank() is not row_number: must not rewrite
    val r = data.withColumn("rank", rank().over(w)).filter(col("rank") <= 2)
    assert(!r.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // unfiltered row_number: must not rewrite
    val unfiltered = data.withColumn("rn", row_number().over(w))
    assert(!unfiltered.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
