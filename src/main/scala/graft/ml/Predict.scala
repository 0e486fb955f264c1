package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.Generators

/** ML parallel batch prediction — SURVEY.md §2.B4, the rebuild of the
  * reference's ParallelPostFit demo: fit a small model, broadcast it,
  * score a large dataset embarrassingly parallel
  * (reference README.md:277-295, docs/examples/examples.rst:119-142,
  * 800k samples / 20 chunks).
  *
  * The fit itself is distributed (one exact integer-domain aggregate
  * over the data — never a driver-side loop); only the closed-form
  * coefficients (two doubles) come back to the driver, then ship to
  * executors inside the scoring closure (the `scatter`/broadcast step).
  * Scoring runs in `mapPartitions` — the per-partition imperative shape
  * the reference used for chunked predict.
  */
object Predict {
  type Q = (SparkSession, String) => DataFrame

  final case class LinearModel(intercept: Double, slope: Double) {
    def predict(x: Double): Double = intercept + slope * x
  }

  /** Least-squares fit of yCents ≈ a + b·xCents from exact integer sums
    * (order-independent ⇒ identical coefficients on any cluster layout
    * or engine). One aggregation job over the data. */
  def fitCents(df: DataFrame, xCol: String, yCol: String): LinearModel = {
    // sxx/sxy accumulate in DECIMAL(38,0): per-row cents products reach
    // ~5e10, so a LongType sum silently wraps around sf>=200 under
    // non-ANSI Spark (the DuckDB oracle promotes to HUGEINT) — the
    // decimal path keeps the closed-form solve exact at warehouse scale.
    val xd = col("x").cast("decimal(19,0)")
    val yd = col("y").cast("decimal(19,0)")
    val r = df.select(
        round(col(xCol) * 100).cast("long").as("x"),
        round(col(yCol) * 100).cast("long").as("y"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
           sum(xd * xd).as("sxx"), sum(xd * yd).as("sxy"))
      .head()
    val n = r.getLong(0).toDouble
    val sx = r.getLong(1).toDouble; val sy = r.getLong(2).toDouble
    val sxx = r.getDecimal(3).doubleValue(); val sxy = r.getDecimal(4).doubleValue()
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n
    LinearModel(intercept, slope)
  }

  /** ml01: fit spend-per-quantity on lineitem, then broadcast-score every
    * row with mapPartitions. Exact-oracle: the coefficients come from
    * exact integer sums and the per-row arithmetic is a fixed IEEE
    * expression shape mirrored in SQL. */
  def predictLineitem(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    val model = fitCents(li, "l_quantity", "l_extendedprice")
    val bc = s.sparkContext.broadcast(model)
    li.select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity") * 100).cast("long").as("xc"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (ok, ln, xc) => (ok, ln, m.predict(xc.toDouble)) }
      }
      .toDF("l_orderkey", "l_linenumber", "pred_cents")
  }

  /** ml02: the reference's headline predict scale — 800k generated
    * samples, broadcast linear scorer, one aggregated profile row.
    * Rows-only gate (mixed-hash features are not SQL-expressible);
    * exactness covered by MlSpec. */
  def predictGenerated(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val data = Generators.makeClassification(s, 800000L, 20, seed = 5L)
    val w = Array.tabulate(20)(j => graft.array.DMatrix.mixedUniform(9999L, j, 20, 5L) - 0.5)
    val bc = s.sparkContext.broadcast(w)
    data.select(col("row_id"), col("features"), col("label"))
      .as[(Long, Array[Double], Double)]
      .mapPartitions { it =>
        val ww = bc.value
        it.map { case (_, x, label) =>
          var dot = 0.0; var j = 0
          while (j < ww.length) { dot += ww(j) * x(j); j += 1 }
          val pred = if (dot > 0) 1.0 else 0.0
          (pred, label, if (pred == label) 1L else 0L)
        }
      }
      .toDF("pred", "label", "hit")
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("n_correct"),
           sum(col("pred")).as("n_pos"))
  }

  val queries: Map[String, Q] = Map(
    "ml01_predict"       -> (predictLineitem _),
    "ml02_predict_bench" -> (predictGenerated _),
  )

  val oracles: Map[String, String] = Map(
    "ml01_predict" ->
      """WITH c AS (SELECT l_orderkey, l_linenumber,
                CAST(round(l_quantity * 100) AS BIGINT) AS x,
                CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(x*y) AS DOUBLE) AS sxy
           FROM c),
         m AS (SELECT (n*sxy - sx*sy) / (n*sxx - sx*sx) AS slope,
                      (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n AS intercept
           FROM s)
         SELECT c.l_orderkey, c.l_linenumber,
                m.intercept + m.slope * CAST(c.x AS DOUBLE) AS pred_cents
         FROM c, m""",
  )
}
