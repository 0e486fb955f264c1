package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Iterative-session surface — SURVEY.md §3.3 / §2.B1.6-B1.7: the
  * rebuild of Wukong's persist/scatter/gather and Lambda-reuse iteration
  * semantics (reference: X.persist() examples.rst:46,58; client.scatter/
  * gather client.py:2072,1902; iteration counters + cached leaf reuse
  * TE/function.py:258-382, SS/wukong/scheduler.py:2794-2848).
  *
  * Spark executors are already long-lived, so "Lambda reuse" parity is
  * about the *semantics*: data pinned across jobs (persist + eager
  * materialization), values shipped once (broadcast), and iteration
  * loops whose lineage cannot grow unboundedly (localCheckpoint every N
  * steps — SURVEY §7.5 known-hard #5). `stop()` is the explicit
  * iteration-terminator (`<key>---iteration = -1`).
  */
final class GraftContext(val spark: SparkSession) {
  private val pinned = mutable.ListBuffer[DataFrame]()

  /** persist: pin and eagerly materialize (Wukong persisted eagerly —
    * the flag forced executor-side writes). Returns the same frame. */
  def persist(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    df.count()
    pinned += df
    df
  }

  /** scatter: ship a value to every executor once. */
  def scatter[T: scala.reflect.ClassTag](v: T): Broadcast[T] =
    spark.sparkContext.broadcast(v)

  /** gather: small final results back to the driver. */
  def gather(df: DataFrame): Array[Row] = df.collect()

  /** Iterative driver loop over a persisted frame: each step's output is
    * materialized and pinned, its predecessor released, and lineage is
    * truncated every `checkpointEvery` steps so 1000-iteration sessions
    * do not accumulate a 1000-stage plan. */
  def iterate(init: DataFrame, steps: Int, checkpointEvery: Int = 8)
             (step: (DataFrame, Int) => DataFrame): DataFrame = {
    var cur = init
    cur.persist(StorageLevel.MEMORY_AND_DISK)
    cur.count()
    for (i <- 0 until steps) {
      var next = step(cur, i)
      if ((i + 1) % checkpointEvery == 0)
        next = next.localCheckpoint(false)
      next.persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      cur.unpersist(false)
      cur = next
    }
    pinned += cur   // released by stop() — the final frame stays pinned
                    // only for the session's lifetime, not the JVM's
    cur
  }

  /** Explicit session stop: release every pinned dataset (the
    * iteration-counter `-1` terminator analog). */
  def stop(): Unit = {
    pinned.foreach(_.unpersist(false))
    pinned.clear()
  }
}

object IterativeQueries {
  import org.apache.spark.sql.functions._
  type Q = (SparkSession, String) => DataFrame

  /** i01: iterative outlier trimming — 3 rounds of "drop orders above
    * 1.5× the running average", entirely in the exact integer-cents
    * domain (2·cents·n > 3·sum ⇔ cents > 1.5·avg). Each round reuses the
    * previous round's *persisted* frame: one scan of parquet total, then
    * cached iterations — the Wukong iterative-session shape. */
  def iterativeTrim(s: SparkSession, d: String): DataFrame = {
    val ctx = new GraftContext(s)
    val init = Tables.orders(s, d)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
    val result = ctx.iterate(init, steps = 3, checkpointEvery = 2) { (cur, _) =>
      val r = cur.agg(count(lit(1)).as("n"), sum(col("cents")).as("s")).head()
      val (n, sum0) = (r.getLong(0), r.getLong(1))
      cur.filter(col("cents") * (2L * n) <= lit(3L * sum0))
    }
    val out = result.agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
    val materialized = out.head()
    ctx.stop()
    import s.implicits._
    Seq((materialized.getLong(0), materialized.getLong(1))).toDF("n_orders", "sum_cents")
  }

  val queries: Map[String, Q] = Map("i01_iterative_trim" -> (iterativeTrim _))

  val oracles: Map[String, String] = Map(
    "i01_iterative_trim" ->
      """WITH o0 AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
         o1 AS (SELECT cents FROM o0
                WHERE cents * (2 * (SELECT count(*) FROM o0)) <= 3 * (SELECT sum(cents) FROM o0)),
         o2 AS (SELECT cents FROM o1
                WHERE cents * (2 * (SELECT count(*) FROM o1)) <= 3 * (SELECT sum(cents) FROM o1)),
         o3 AS (SELECT cents FROM o2
                WHERE cents * (2 * (SELECT count(*) FROM o2)) <= 3 * (SELECT sum(cents) FROM o2))
         SELECT count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS sum_cents FROM o3""",
  )
}
