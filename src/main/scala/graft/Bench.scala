package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark harness (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  *  - Action is a `noop` sink write, not `count()`: count() lets Catalyst
  *    prune all columns and drop sorts, so projection-heavy queries would
  *    measure a fraction of their real work. The noop sink materializes
  *    every output row/column without disk I/O.
  *  - One unmeasured warmup pass (flagship join + a text query) eats
  *    session/JIT/codegen warmup so per-query numbers are comparable.
  *  - Each entry runs REPS times (default 3); "queries" reports the
  *    per-entry MEDIAN and "spread" reports [min,max]. Single-shot
  *    numbers in this suite historically swing 2-3× between rounds on
  *    identical plans (shared-JVM noise — see BENCH_NOTES.md), which
  *    made a 2× perf bar unadjudicable; medians restore that.
  *  - Failures are reported per-query in an "errors" map instead of
  *    being silently swallowed as fast wall-times.
  *  - The JSON line is also written to bench_out.json so the driver can
  *    parse it even if sbt noise mangles stdout.
  */
object Bench {
  private def runNoop(spark: SparkSession, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, sfDir: String): Unit =
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // flagship-scale linalg entries (10k² GEMM, 200k×1000 SVD, …) run
    // once per pass: each is tens of seconds of deliberate compute, so a
    // single rep both bounds suite time and is already noise-robust.
    val heavyReps = sys.env.getOrElse("SPARK_GRAFT_BENCH_HEAVY_REPS", "1").toInt.max(1)
    val spark = graft.core.GraftSession.local()
    // optional args: entry names — restricts the run for local iteration
    // (the driver always invokes with no args = full suite).
    val qs0 = SparkEntry.queries
    val qs = if (args.isEmpty) qs0
             else qs0.filter { case (n, _) => args.contains(n) }
    // warmup: exercise scan+join+agg+window+regex codegen paths once,
    // plus the block-algebra stack (Block encoder, Kryo shuffle, dgemm,
    // QR) so the single-rep flagship entries don't pay first-use JIT
    Seq("q03_revenue_by_nation", "q08_rolling_avg_user", "t05_dedup_exact",
        "a01_matmul", "a06_tsqr_gram")
      .foreach(k => qs.get(k).foreach(fn => try runNoop(spark, fn, sfDir) catch { case _: Throwable => () }))
    val errors = scala.collection.mutable.Map[String, String]()
    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      val nReps = if (graft.array.ArrayQueries.flagship.contains(name)) heavyReps else reps
      System.err.println(s"[bench] running $name x$nReps")
      val times = (1 to nReps).flatMap { _ =>
        // GC OUTSIDE the timed region: ~70 queries leave unreferenced
        // checkpoint blocks / broadcasts that only the ContextCleaner can
        // reclaim, and it only runs on driver GC — without this, queries
        // late in the run pay accumulated cleanup debt (measured ~10×
        // inflation on the final queries vs their isolated cost).
        System.gc()
        val t0 = System.nanoTime()
        try {
          runNoop(spark, fn, sfDir)
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[bench]   $name rep: $dt%.3f s")
          Some(dt)
        }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          None
        }
      }
      val sorted = times.sorted
      val median = if (sorted.isEmpty) 0.0 else sorted(sorted.size / 2)
      (name, median, sorted.headOption.getOrElse(0.0), sorted.lastOption.getOrElse(0.0))
    }
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val qJson = results.map { case (k, med, _, _) => s"${jstr(k)}:$med" }.mkString("{", ",", "}")
    val sJson = results.map { case (k, _, lo, hi) => s"${jstr(k)}:[$lo,$hi]" }.mkString("{", ",", "}")
    val eJson = errors.toSeq.sortBy(_._1).map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"spread":$sJson,"reps":$reps,"heavy_reps":$heavyReps,"errors":$eJson,"sf":${jstr(sfDir)}}"""
    println(line)
    Files.writeString(Paths.get("bench_out.json"), line)
    spark.stop()
  }
}
