package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The point of a partitioned layout is planning-time pruning: a filter
  * on the partition column must become a PartitionFilter on the scan
  * (directories never listed into the plan), not a post-scan Filter. */
class PartitionPruneSpec extends SparkSpec {

  test("partition-column predicate prunes directories at plan time") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftsrc04").toString
    (1L to 300L).map(i => (i, s"t${i % 3}", i * 10L))
      .toDF("event_id", "event_type", "cents")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)

    val pruned = spark.read.parquet(tmp).filter(col("event_type") === "t1")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("t1"),
      s"expected the type predicate as a PartitionFilter on the scan:\n$scan")
    // one of three directories survives pruning
    assert(pruned.count() == 100L)
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.forall(_.contains("event_type=t1")),
      s"pruned scan must only read the t1 partition, got: ${files.mkString(", ")}")
  }

  test("src06 dim-join prunes fact partitions at RUNTIME via dynamicpruningexpression") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graftsrc06").toString
    (1L to 300L).map(i => (i, i % 7, Seq("click", "view", "purchase", "signup",
        "error")((i % 5).toInt), i * 10L))
      .toDF("event_id", "user_id", "event_type", "cents")
      .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    val dimTmp = java.nio.file.Files.createTempDirectory("graftsrc06d").toString
    FileFormats.typeDim(spark).write.mode("overwrite").parquet(dimTmp)
    val dim = spark.read.parquet(dimTmp)
    val df = FileFormats.dppAggregate(spark.read.parquet(tmp), dim)
    df.collect() // executed plan: DPP decision is made at runtime
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("dynamicpruning"),
      s"fact scan must carry a dynamicpruningexpression PartitionFilter:\n$scan")
    // and the pruned scan really reads only the two engagement partitions
    val typed = spark.read.parquet(tmp)
      .withColumn("f", input_file_name())
      .join(dim.filter(col("category") === "engagement"), Seq("event_type"))
      .select(col("f")).distinct().collect().map(_.getString(0))
    assert(typed.nonEmpty && typed.forall(f =>
        f.contains("event_type=click") || f.contains("event_type=view")),
      s"runtime-pruned scan read beyond click/view: ${typed.mkString(", ")}")
  }

  test("src04 pruned aggregate matches the unpartitioned equivalent") {
    val got = FileFormats.partitionedPrune(spark, sfDir).collect().head
    val want = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), sum(round(col("value") * 100).cast("long")),
           sum(col("event_id")), countDistinct(col("user_id")))
      .collect().head
    assert(got == want)
  }

  test("src12 dynamic overwrite replaces only the click partition, idempotently") {
    def profile() = FileFormats.dynamicOverwrite(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = profile()
    val expect = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
              round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, g) =>
        val mult = if (t == "click") 2L else 1L
        t -> ((g.length.toLong, g.map(_._3 * mult).sum, g.map(_._2).sum))
      }
    assert(got == expect,
      "click cells must double exactly once; sibling partitions must survive")
    // the whole entry is an idempotent backfill: a re-run converges
    assert(profile() == got, "second run must reproduce the same table")
    // the conf flip must not leak into later entries
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .contains("dynamic"), "partitionOverwriteMode leaked")
  }
}
