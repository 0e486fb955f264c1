package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Similarity

/** Planted DENSE-DIRECTIONAL-CORE corpus generator — the adversarial
  * embedding shape the occupancy law cannot split (round-12 finding:
  * hottest LSH bucket grew 260 → 686 → 1529 across 1×/4×/16× despite
  * +3 planes), used by DenseCoreSpec and the ScaleProbe dense-core
  * section to prove the e04/e06 occupancy-cap + PQ pre-verify guard.
  *
  * Construction (seeded, deterministic):
  *  - `u`: a unit vector in the SPAN of the first 32 LSH hyperplanes
  *    ([[Similarity.planeWeights]] 0..31 — every plane any gate/probe
  *    band width ≤ 8 can use), rejection-sampled until its dot with
  *    every plane has margin ≥ 200 (quantization can perturb a plane
  *    dot by ≤ 32 in these units — 400 ≫ 32 at amp 2, so bucket signs
  *    are u's alone, provably);
  *  - `kTemplates` orthonormal template directions t_j and per-vector
  *    jitter, all projected into the exact NULL SPACE of those planes —
  *    they move cosines without touching any bucket bit;
  *  - core vector i = 2·u + 3·t_{i mod k} + 0.05·jitter_i. Every core
  *    vector lands in the SAME (band, bucket) for every band — one
  *    bucket of occupancy nCore that no added plane splits — while
  *    cross-template cosine ≈ (4)/(4+9) ≈ 0.31·…, tuned below τ, and
  *    within-template cosine ≈ 1 ≥ τ: the candidate mass is quadratic
  *    but only the within-template slice is the true answer — the
  *    WASTE case the pre-verify exists to bound.
  *  - core ids 0..nCore-1 (so the PqK lowest-id codebook vectors sample
  *    the core's templates — exactly what a trained codebook does to a
  *    dense mass), background ids after, isotropic gaussian.
  *
  * With amp ratio 3: cross-template cos = |2u|²/(|2u|²+|3t|²) =
  * 4/13 ≈ 0.308 — keep τ well above (default fixture τ = 0.5) so
  * cross-template pairs are the planted waste.
  */
object DenseCore {
  private val Dim = 64
  private val NPlanes = 32

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < Dim) { s += a(i) * b(i); i += 1 }
    s
  }
  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
  private def scaled(a: Array[Double], c: Double): Array[Double] = a.map(_ * c)
  private def minus(a: Array[Double], b: Array[Double], c: Double): Array[Double] = {
    val out = a.clone(); var i = 0
    while (i < Dim) { out(i) -= c * b(i); i += 1 }
    out
  }
  /** v minus its projection onto each (orthonormal) basis vector. */
  private def projectOut(v: Array[Double], basis: Seq[Array[Double]]): Array[Double] =
    basis.foldLeft(v.clone())((acc, b) => minus(acc, b, dot(acc, b)))

  private def gramSchmidt(vs: Seq[Array[Double]]): Seq[Array[Double]] =
    vs.foldLeft(Vector.empty[Array[Double]]) { (basis, v) =>
      val r = projectOut(v, basis)
      val n = norm(r)
      if (n < 1e-9) basis else basis :+ scaled(r, 1.0 / n)
    }

  /** (vec_id, embedding FLOAT[64], label) — label = template id for core
    * vectors, -1 for background. */
  def corpus(spark: SparkSession, nCore: Int, nBackground: Int,
             kTemplates: Int = 8, seed: Long = 42L): DataFrame = {
    require(kTemplates <= Similarity.PqK && nCore >= Similarity.PqK,
      "codebook (lowest PqK ids) must be able to sample every template")
    val rng = new scala.util.Random(seed)
    val planes: Seq[Array[Double]] =
      (0 until NPlanes).map(p => Similarity.planeWeights(p).map(_.toDouble))
    val planeBasis = gramSchmidt(planes)

    // u in plane span with guaranteed EQUAL sign margins against every
    // plane: solve G·a = 1 where G[p][q] = <w_p, b_q>, u = Σ a_q b_q —
    // deterministic, every plane dot identical by construction
    require(planeBasis.size == NPlanes, "dense-core: dependent planes")
    val g = breeze.linalg.DenseMatrix.tabulate(NPlanes, NPlanes)(
      (p, q) => dot(planes(p), planeBasis(q)))
    val a = g \ breeze.linalg.DenseVector.ones[Double](NPlanes)
    val uRaw = new Array[Double](Dim)
    var q = 0
    while (q < NPlanes) {
      var d = 0
      while (d < Dim) { uRaw(d) += a(q) * planeBasis(q)(d); d += 1 }
      q += 1
    }
    val u = scaled(uRaw, 1.0 / norm(uRaw))
    val margin = planes.map(w => math.abs(dot(u, w))).min
    require(margin >= 200.0, s"dense-core: equal margin $margin below the quantization-safe floor")

    def nullSpaceUnit(): Array[Double] = {
      val r = projectOut(Array.fill(Dim)(rng.nextGaussian()), planeBasis)
      scaled(r, 1.0 / norm(r))
    }
    val templates = gramSchmidt(Seq.fill(kTemplates)(nullSpaceUnit()))
    require(templates.size == kTemplates, "dense-core: template collapse")

    val rows = new scala.collection.mutable.ArrayBuffer[(Long, Array[Float], Long)]
    var i = 0
    while (i < nCore) {
      val t = templates(i % kTemplates)
      val j = nullSpaceUnit()
      val v = new Array[Float](Dim)
      var d = 0
      while (d < Dim) { v(d) = (2.0 * u(d) + 3.0 * t(d) + 0.05 * j(d)).toFloat; d += 1 }
      rows += ((i.toLong, v, (i % kTemplates).toLong))
      i += 1
    }
    var b = 0
    while (b < nBackground) {
      rows += (((nCore + b).toLong,
                Array.fill(Dim)((rng.nextGaussian() * 0.5).toFloat), -1L))
      b += 1
    }
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding", "label")
  }
}
