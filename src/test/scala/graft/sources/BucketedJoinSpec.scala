package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of bucketing is the ABSENCE of a shuffle: after both sides
  * are written bucketed on the join key, the sort-merge join must read
  * buckets 1:1 with no Exchange on either input. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed sort-merge join runs with no exchange on either side") {
    import spark.implicits._
    FileFormats.dropTableAndLocation(spark, "spec_orders_bkt")
    FileFormats.dropTableAndLocation(spark, "spec_lineitem_bkt")
    (1L to 1000L).map(k => (k, s"p${k % 5}")).toDF("o_orderkey", "prio")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "o_orderkey").saveAsTable("spec_orders_bkt")
    (1L to 4000L).map(i => (i % 1000L + 1L, i)).toDF("l_orderkey", "cents")
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "l_orderkey").saveAsTable("spec_lineitem_bkt")
    val joined = spark.table("spec_lineitem_bkt")
      .join(spark.table("spec_orders_bkt").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == 4000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle or broadcast either side:\n$plan")
  }
}
