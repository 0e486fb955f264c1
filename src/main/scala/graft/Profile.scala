package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    val qs = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary", "s01_make_timeseries")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup as in Bench
    Seq("q03_revenue_by_nation", "q08_rolling_avg_user", "t05_dedup_exact").foreach(run)
    names.foreach { n =>
      val times = (1 to 3).map(_ => run(n))
      println(f"[profile] $n%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    names.foreach { n => println(s"==== $n plan ===="); qs(n)(spark, sfDir).explain("formatted") }
    spark.stop()
  }
}
