package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Single registration point for every Catalyst extension the library
  * ships (`SparkSession.builder.withExtensions(GraftExtensions.register)`):
  * the fused [[graft.functions.ArrayDotLong]] and
  * [[graft.functions.PqLutSumLong]] kernels, and the
  * [[RewriteRankFilterToTopK]] rule + [[TopKPerKeyStrategy]] planner
  * strategy that turn rank-filter windows into shuffle-light top-k. */
object GraftExtensions {
  def register(ext: SparkSessionExtensions): Unit = {
    graft.functions.ArrayDotLong.register(ext)
    graft.functions.PqLutSumLong.register(ext)
    ext.injectOptimizerRule(_ => RewriteRankFilterToTopK)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
