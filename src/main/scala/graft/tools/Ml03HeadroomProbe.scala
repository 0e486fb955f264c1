package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: quantifies ml03's convergence headroom (ADVICE r8).
  *
  * The ml03 oracle asserts n_correct == n on the |wg·x| > 2e5 margin
  * slice — an empirical convergence property of the 25-iteration
  * LinearSVC fit, not a mathematical guarantee. This probe measures how
  * much slack that assertion has, so a future flake (Spark version bump,
  * CPU-count change, float-reduction-order shift) is diagnosable:
  *
  *  - cos(ŵ, wg): alignment of the fitted separator with ground truth.
  *  - min |ŵ·x + b| over margin points, and the same normalized by the
  *    decision values' own scale (headroom: how far the nearest margin
  *    point sits from the fitted boundary — a flip needs this to cross 0).
  *  - margin-point misclassifications (must be 0 for the gate to hold).
  *
  * Run: sbt "runMain graft.tools.Ml03HeadroomProbe"
  * Observed numbers are recorded in predictSvc's scaladoc (Predict.scala).
  */
object Ml03HeadroomProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local()
    import org.apache.spark.ml.functions.vector_to_array
    // the fixture, margin cut and fit come from the gate's own code —
    // never duplicated here, or the probe would silently measure a
    // different model than the one the oracle asserts on
    val (data, model, wg) = graft.ml.Predict.svcMarginFixture(s)
    val w = model.coefficients.toArray
    val cos = {
      val num = w.indices.map(j => w(j) * wg(j)).sum
      num / (math.sqrt(w.map(x => x * x).sum) * math.sqrt(wg.map(x => x.toDouble * x).sum))
    }
    val scored = model.transform(data)
      .withColumn("raw", element_at(vector_to_array(col("rawPrediction")), 2))
    val stats = scored.agg(
      count(lit(1)).as("n"),
      sum(when(col("prediction") =!= col("label"), 1L).otherwise(0L)).as("n_wrong"),
      min(abs(col("raw"))).as("min_absraw"),
      expr("percentile_approx(abs(raw), 0.5)").as("med_absraw"),
      max(abs(col("raw"))).as("max_absraw")).first()
    println(f"[ml03-headroom] cos(w_hat, wg) = $cos%.6f")
    println(s"[ml03-headroom] margin points n=${stats.getLong(0)} misclassified=${stats.getLong(1)}")
    println(f"[ml03-headroom] |decision| over margin points: min=${stats.getDouble(2)}%.4f " +
      f"median=${stats.getDouble(3)}%.4f max=${stats.getDouble(4)}%.4f " +
      f"(headroom min/median = ${stats.getDouble(2) / stats.getDouble(3)}%.4f)")
    s.stop()
  }
}
