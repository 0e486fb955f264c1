package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Iterative-session semantics (SURVEY.md §3.3): persisted reuse across
  * jobs, broadcast scatter, bounded lineage under iteration. */
class SessionSpec extends SparkSpec {

  test("normalizeTs: Long nanos, TIMESTAMP_NTZ, and TIMESTAMP all normalize to the same instant") {
    // the regression class that broke st01/st06/st07/st09 in round 9: the
    // driver's events fixture has shipped ts as BOTH nanos-as-Long and
    // timestamp[us] isAdjustedToUTC=false (read as NTZ). All encodings of
    // the same instant must come out as identical TimestampType values.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val micros = 1700000000123456L                 // 2023-11-14T22:13:20.123456Z
    val fromLong = graft.core.Tables.normalizeTs(
      spark.range(1).select((lit(micros) * 1000L).as("ts")))
    val fromNtz = graft.core.Tables.normalizeTs(
      spark.range(1).select(timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts")))
    val fromTz = graft.core.Tables.normalizeTs(
      spark.range(1).select(timestamp_micros(lit(micros)).as("ts")))
    for (df <- Seq(fromLong, fromNtz, fromTz)) {
      assert(df.schema("ts").dataType == TimestampType, df.schema("ts").dataType.toString)
      assert(df.select(unix_micros(col("ts"))).head().getLong(0) == micros)
    }
  }

  test("persist pins data: cached frame survives source deletion (no re-scan)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftsess").toString
    Seq(1L, 2L, 3L).toDF("v").write.mode("overwrite").parquet(s"$dir/t.parquet")
    val ctx = new GraftContext(spark)
    val df = ctx.persist(spark.read.parquet(s"$dir/t.parquet"))
    assert(df.count() == 3)
    // Delete the files behind Spark's back (a same-session Spark overwrite
    // would trigger refreshByPath and legitimately recache): any re-scan
    // now throws FileNotFound, so a correct answer proves cache service.
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$dir/t.parquet")).deleteRecursively()
    assert(df.count() == 3, "persisted frame must not re-scan the source")
    assert(df.agg(sum("v")).head.getLong(0) == 6L)
    ctx.stop()
  }

  test("scatter ships a model once and executors read it") {
    val ctx = new GraftContext(spark)
    val b = ctx.scatter(Array(1.0, 2.0, 3.0))
    val s = spark.sparkContext.parallelize(1 to 3, 3).map(i => b.value(i - 1)).sum()
    assert(s == 6.0)
    ctx.stop()
  }

  test("iterate: 10 steps converge, lineage stays bounded via checkpoints") {
    import spark.implicits._
    val ctx = new GraftContext(spark)
    val init = spark.range(1024).toDF("v")
    // halve the row count every step: after 10 steps exactly 1 row
    val out = ctx.iterate(init, steps = 10, checkpointEvery = 3) { (cur, _) =>
      cur.filter(col("v") % 2 === 0).select((col("v") / 2).cast("long").as("v"))
    }
    assert(out.count() == 1)
    // localCheckpoint truncation: the final plan must not contain the
    // full 10-step filter chain
    val planDepth = out.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planDepth < 12, s"lineage not truncated: plan depth $planDepth")
    ctx.stop()
  }

  test("iterative trim matches a driver-side reference loop") {
    val got = IterativeQueries.iterativeTrim(spark, sfDir).head()
    // reference computation, single-node
    var cents = graft.core.Tables.orders(spark, sfDir)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).toSeq
    for (_ <- 1 to 3) {
      val n = cents.size; val s = cents.sum
      cents = cents.filter(c => c * 2 * n <= 3 * s)
    }
    assert(got.getLong(0) == cents.size.toLong)
    assert(got.getLong(1) == cents.sum)
  }

  test("i06 k-core peel matches a local reference loop and strictly shrinks") {
    val got = IterativeQueries.kcorePeel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // same generator, peeled locally
    var edges = (0L until 600L).map { e =>
      val u = (e * 2 * 1103515245L + 17L) % 2147483647L % 200L
      val v = ((e * 2 + 1) * 1103515245L + 17L) % 2147483647L % 200L
      (math.min(u, v), math.max(u, v))
    }.filter(p => p._1 != p._2).distinct
    val expect = (1 to 3).map { r =>
      val deg = edges.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size }
      val keep = deg.filter(_._2 >= 4).keySet
      edges = edges.filter(p => keep(p._1) && keep(p._2))
      (r.toLong, keep.size.toLong, edges.size.toLong)
    }
    assert(got.toSeq == expect, s"got ${got.toSeq}")
    // the peel must do real work on this graph at every round
    assert(expect.map(_._2).distinct.size == 3, "node counts must strictly shrink")
  }
}
