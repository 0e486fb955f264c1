package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.array.DMatrix

/** Synthetic data generators — SURVEY.md §2.B1.2-B1.5, the rebuild of
  * `da.random` / `dd.demo.make_timeseries` / `make_classification`
  * (reference README.md:220,290-292; tests/test_collections.py:115-122).
  *
  * All generators are seeded per-element functions of the row index over
  * `spark.range`, so any partition regenerates independently on any
  * executor (dask chunk semantics) and outputs are reproducible at any
  * parallelism. Matrix generators live on DMatrix (rand/randInt/ones/eye).
  */
object Generators {
  type Q = (SparkSession, String) => DataFrame

  private val Names = Seq("alice", "bob", "carol", "dan", "erin")

  /** make_timeseries analog: rows every `freqSeconds` from startEpoch,
    * columns (ts, id, name, value) — value integer-valued for exact
    * cross-engine aggregation. LCG-derived, SQL-expressible. */
  def makeTimeseries(s: SparkSession, n: Long, startEpoch: Long, freqSeconds: Long,
                     seed: Long): DataFrame = {
    val lcg = (salt: Int) => (col("id") * 1103515245L + lit(seed + salt)) % 2147483647L
    s.range(n)
      .select(
        timestamp_seconds(lit(startEpoch) + col("id") * freqSeconds).as("ts"),
        (lcg(1) % 100L).as("series_id"),
        element_at(array(Names.map(lit): _*), (lcg(2) % Names.size).cast("int") + 1).as("name"),
        (lcg(3) % 1000L).cast("double").as("value"))
  }

  /** make_classification analog: n rows of d features in [-1,1) with a
    * deterministic linear ground truth (label = sign of w·x), the shape
    * the reference's 800k-sample ParallelPostFit demo consumes. Uses the
    * mixed hash — numerically well-behaved, not SQL-expressible. */
  def makeClassification(s: SparkSession, n: Long, d: Int, seed: Long): DataFrame = {
    import s.implicits._
    s.range(n).map { i =>
      val x = Array.tabulate(d)(j => DMatrix.mixedUniform(i, j, d, seed) * 2.0 - 1.0)
      val w = Array.tabulate(d)(j => DMatrix.mixedUniform(9999L, j, d, seed) - 0.5)
      var dot = 0.0; var j = 0
      while (j < d) { dot += w(j) * x(j); j += 1 }
      (i, x, if (dot > 0) 1.0 else 0.0)
    }.toDF("row_id", "features", "label")
  }

  /** Integer-domain make_classification: features are centered LCG
    * integers in [-500, 499] and the ground truth is label = sign(wg·x)
    * with wg from the same LCG family — every dot product is an exact
    * 64-bit integer (|dot| ≤ 5e6), so the full confusion matrix is
    * SQL-expressible and hash-matchable cross-engine. The mixed-hash
    * variant above stays for numerically-shaped specs. */
  def makeClassificationLcg(s: SparkSession, n: Long, d: Int, seed: Long): DataFrame = {
    import s.implicits._
    val dd = d
    s.range(n).map { i =>
      val x = Array.tabulate(dd)(j => ((i * dd + j) * 1103515245L + seed) % 2147483647L % 1000L - 500L)
      val wg = Array.tabulate(dd)(j => ((9999L * dd + j) * 1103515245L + seed) % 2147483647L % 1000L - 500L)
      var dot = 0L; var j = 0
      while (j < dd) { dot += wg(j) * x(j); j += 1 }
      (i, x, if (dot > 0L) 1L else 0L)
    }.toDF("row_id", "features", "label")
  }

  /** s01: timeseries generator profile — 20,000 2-hourly rows from
    * 2000-01-01, grouped by name (the reference make_timeseries shape). */
  def timeseriesProfile(s: SparkSession, d: String): DataFrame =
    makeTimeseries(s, 20000, 946684800L, 7200L, 2024L)
      .groupBy(col("name"))
      .agg(count(lit(1)).as("n_rows"),
           sum(col("value")).as("sum_value"),
           // epoch seconds, not a raw timestamp: Spark writes instant-
           // adjusted TIMESTAMP_MICROS which DuckDB renders as TIMESTAMPTZ,
           // while a generated oracle timestamp is naive — compare integers
           max(unix_timestamp(col("ts"))).as("last_epoch"))

  val queries: Map[String, Q] = Map(
    "s01_make_timeseries" -> (timeseriesProfile _),
  )

  val oracles: Map[String, String] = Map(
    "s01_make_timeseries" ->
      """WITH t AS (
           SELECT 946684800 + r.range * 7200 AS epoch,
                  ['alice','bob','carol','dan','erin']
                    [CAST((r.range*1103515245 + 2026) % 2147483647 % 5 AS INT) + 1] AS name,
                  CAST((r.range*1103515245 + 2027) % 2147483647 % 1000 AS DOUBLE) AS value
           FROM range(20000) r)
         SELECT name, count(*) AS n_rows, sum(value) AS sum_value,
                CAST(max(epoch) AS BIGINT) AS last_epoch
         FROM t GROUP BY name""",
  )
}
