package graft.delayed

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** Driver-gate entries for the delayed/futures surface (SURVEY.md §2.B5).
  * Semantics mirror reference workloads; results are exactly
  * SQL-expressible so they join the DuckDB hash gate.
  */
object DelayedQueries {
  type Q = (SparkSession, String) => DataFrame

  /** 1024-leaf pairwise tree reduction (reference README.md:180-201) —
    * the distributed form: leaves are deterministic values in a Dataset,
    * reduced with `treeReduce` (log-depth combiner tree, the Spark analog
    * of the delayed pairwise-add DAG; depth 5 ≈ the reference's tree). */
  def treeReduceSum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val total = s.range(1024)
      .rdd.map(i => (i * 1103515245L + 5L) % 2147483647L % 100000L)
      .treeReduce(_ + _, depth = 5)
    s.createDataset(Seq(total)).toDF("total")
  }

  /** A delayed DAG whose nodes are Spark actions: two independent counts
    * run in parallel (the "invoke" fan-out), then a dependent combiner
    * (the "become" chain) — delayed(f)(g(), h()) over real jobs. */
  def delayedDag(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigOrders = Delayed {
      Tables.orders(s, d).filter(org.apache.spark.sql.functions.col("o_totalprice") > 300000.0).count()
    }
    val customers = Delayed { Tables.customer(s, d).count() }
    val combined = bigOrders.zip(customers)((a, b) => a + 2 * b)
    s.createDataset(Seq(combined.compute())).toDF("combined")
  }

  val queries: Map[String, Q] = Map(
    "d01_tree_reduce" -> (treeReduceSum _),
    "d02_delayed_dag" -> (delayedDag _),
  )

  val oracles: Map[String, String] = Map(
    "d01_tree_reduce" ->
      """SELECT CAST(sum(((r.range*1103515245+5)%2147483647)%100000) AS BIGINT) AS total
         FROM range(1024) r""",
    "d02_delayed_dag" ->
      """SELECT (SELECT count(*) FROM orders WHERE o_totalprice > 300000.0)
              + 2 * (SELECT count(*) FROM customer) AS combined""",
  )
}
