package graft.tools

/** Ad-hoc executed-plan probe for scale review during development:
  * `sbt "runMain graft.tools.PlanPeek q62_spearman t45_weighted_sample"`
  * runs each named gate entry at sf0.01 and prints its executed physical
  * plan (post-AQE). PlanDump regenerates the curated PLANS.md; this is
  * the quick per-entry view for iterating on a plan before curating it. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (n <- args) {
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.collect()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
