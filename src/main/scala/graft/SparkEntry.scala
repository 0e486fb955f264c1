package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Relational, TextOps, TextSim, Similarity, Apply, MultiModal}
import graft.core.IterativeQueries
import graft.sources.{Generators, FileFormats}
import graft.streaming.Streams
import graft.ml.{Cluster, Predict}
import graft.array.ArrayQueries
import graft.delayed.DelayedQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator module's inventory;
  * `oracleSql` carries the DuckDB-equivalent SQL for each key that is
  * SQL-expressible (the driver's correctness gate). Keys without oracle
  * SQL get a weaker rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ TextSim.queries ++
      Similarity.queries ++ ArrayQueries.queries ++ DelayedQueries.queries ++
      Apply.queries ++ Generators.queries ++ Predict.queries ++ Cluster.queries ++
      IterativeQueries.queries ++ MultiModal.queries ++ FileFormats.queries ++
      Streams.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ TextSim.oracles ++
      Similarity.oracles ++ ArrayQueries.oracles ++ DelayedQueries.oracles ++
      Apply.oracles ++ Generators.oracles ++ Predict.oracles ++ Cluster.oracles ++
      IterativeQueries.oracles ++ MultiModal.oracles ++ FileFormats.oracles ++
      Streams.oracles
}
