package graft.operators

import graft.SparkSpec
import graft.tools.DenseCore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dense-directional-core guard (round-13 directive #1): a planted
  * core that every band hashes into ONE bucket — the shape the
  * occupancy law cannot split — must be handled by the occupancy-cap +
  * conservative PQ pre-verify without changing any output.
  *
  * The load-bearing property is CONSERVATIVENESS: pqPreVerify may admit
  * extra pairs (they still face the exact verify) but must never drop a
  * pair the exact verify would keep — that is what makes
  * embedNearDupsCapped ≡ embedNearDups bit-for-bit at any cap.
  */
class DenseCoreSpec extends SparkSpec {

  import spark.implicits._

  private val Tau = 0.5
  private lazy val core = DenseCore.corpus(spark, nCore = 160, nBackground = 200,
    kTemplates = 8, seed = 42L).cache()

  /** All same-(band,bucket) candidate pairs via the public bandedLsh. */
  private def candidatesOf(emb: DataFrame, ppb: Int): DataFrame = {
    val b = Similarity.bandedLsh(emb, ppb, 4)
    b.select(col("band"), col("bucket"), col("vec_id").as("vec_a"))
      .join(b.select(col("band").as("b2"), col("bucket").as("k2"),
                     col("vec_id").as("vec_b")),
            col("band") === col("b2") && col("bucket") === col("k2") &&
              col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
  }

  test("planted core defeats plane-splitting: one bucket holds the whole core at 4 and 8 planes/band") {
    for (ppb <- Seq(4, 8)) {
      val hot = Similarity.bandedLsh(core, ppb, 4)
        .groupBy("band", "bucket").count()
        .groupBy("band").agg(max("count").as("hottest"))
        .collect().map(_.getAs[Long]("hottest"))
      assert(hot.length == 4 && hot.forall(_ >= 160L),
        s"ppb=$ppb: every band's hottest bucket must hold the 160-vector core, got ${hot.toSeq}")
    }
  }

  test("conservativeness: exact-verify survivors are a subset of pre-verify survivors (random corpus, several taus)") {
    val rnd = new scala.util.Random(11)
    val emb = (0 until 120).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * (0.3 + 0.7 * rnd.nextDouble())).toFloat), 0L)
    }.toDF("vec_id", "embedding", "label").cache()
    val ids = emb.select(col("vec_id").as("vec_a"))
    val allPairs = ids.crossJoin(emb.select(col("vec_id").as("vec_b")))
      .filter(col("vec_a") < col("vec_b")).cache()
    val summ = Similarity.pqSummary(emb).cache()
    val table = Similarity.pqCentDotTable(emb)
    val q = Similarity.quantize(col("embedding"))
    val withQ = emb.select(col("vec_id"), q.as("qv"))
      .withColumn("qn", graft.functions.ArrayDotLong.dotLong(col("qv"), col("qv")))
    def exactPairs(tau: Double): Set[(Long, Long)] = allPairs
      .join(withQ.select(col("vec_id").as("vec_a"), col("qv").as("qa"), col("qn").as("na")), "vec_a")
      .join(withQ.select(col("vec_id").as("vec_b"), col("qv").as("qb"), col("qn").as("nb")), "vec_b")
      .filter(graft.functions.ArrayDotLong.dotLong(col("qa"), col("qb")).cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))) >= tau)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    for (tau <- Seq(0.0, 0.1, 0.3, 0.6, 0.9)) {
      val kept = Similarity.pqPreVerify(allPairs, summ, table, tau)
        .as[(Long, Long)].collect().toSet
      val exact = exactPairs(tau)
      val dropped = exact -- kept
      assert(dropped.isEmpty,
        s"tau=$tau: pre-verify dropped ${dropped.size} true pairs (e.g. ${dropped.take(3)})")
    }
  }

  test("capped == uncapped on the dense core (cap engaged), and pre-verify prunes the cross-template waste") {
    val uncapped = Similarity.embedNearDups(core, Tau, 4, 4)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    val capped = Similarity.embedNearDupsCapped(core, Tau, 4, 4, occupancyCap = 64L)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(capped == uncapped, s"capped path changed the output: " +
      s"${(capped -- uncapped).size} extra, ${(uncapped -- capped).size} missing")

    // effectiveness ON THE CORE (the mass an oversized bucket routes
    // through the pre-verify): its quadratic candidate set is mostly
    // cross-template (below tau) and must die before the exact stage;
    // within-template true pairs = 8 * C(20,2) = 1520. Background pairs
    // are NOT asserted: PQ cannot represent vectors the codebook never
    // sampled, so the conservative bound rightly keeps them — and in
    // the capped operator their buckets sit below the cap anyway.
    val cand = candidatesOf(core, 4)
      .filter(col("vec_a") < 160L && col("vec_b") < 160L).cache()
    val summ = Similarity.pqSummaryOf(core, core).cache()
    val kept = Similarity.pqPreVerify(cand, summ, Similarity.pqCentDotTable(core), Tau)
    val (nCand, nKept) = (cand.count(), kept.count())
    assert(nCand >= 11000L, s"fixture must plant a quadratic candidate mass, got $nCand")
    assert(nKept <= 2500L, s"pre-verify must prune the cross-template waste, kept $nKept of $nCand")
    assert(nKept >= 1520L, s"pre-verify must keep every true pair, kept $nKept < 1520")
  }

  test("pq_lut_sum_long: fused kernel matches the composable HOF form") {
    val rnd = new scala.util.Random(5)
    val k = Similarity.PqK
    val table = Array.fill(Similarity.PqM * k * k)(rnd.nextLong() % 1000000L)
    val rows = (0 until 50).map { i =>
      (i.toLong,
       Array.fill(Similarity.PqM)(rnd.nextInt(k).toLong),
       Array.fill(Similarity.PqM)(rnd.nextInt(k).toLong))
    }.toDF("id", "pca", "pcb").withColumn("cdots", lit(table))
    val both = rows.select(col("id"),
      graft.functions.PqLutSumLong.lutSum(col("cdots"), col("pca"), col("pcb"), k).as("fused"),
      expr(s"""aggregate(
                 transform(zip_with(pca, pcb, (x, y) -> x * $k + y),
                           (v, s) -> element_at(cdots, CAST(s * ${k * k} + v + 1 AS INT))),
                 CAST(0 AS BIGINT), (acc, e) -> acc + e)""").as("hof"))
      .collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"id=${r.getLong(0)}: fused ${r.getLong(1)} != hof ${r.getLong(2)}"))
  }

  test("pq_lut_sum_long: out-of-range gather fails loudly (never silently lowers the bound)") {
    // zeroing a positive centroid-dot term would LOWER the pre-verify's
    // upper bound — i.e. silent false negatives. The kernel must throw.
    val k = Similarity.PqK
    val table = Array.fill(Similarity.PqM * k * k)(1L)
    val bad = Seq((0L, Array.fill(Similarity.PqM)(k.toLong),   // code == k: out of range
                        Array.fill(Similarity.PqM)(0L)))
      .toDF("id", "pca", "pcb").withColumn("cdots", lit(table))
    val ex = intercept[Exception] {
      bad.select(graft.functions.PqLutSumLong.lutSum(
        col("cdots"), col("pca"), col("pcb"), k)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
             c.getMessage.contains("pq_lut_sum_long")),
      s"expected the loud pq_lut_sum_long range error, got $ex")
  }

  test("codebook-less corpus (ids above PqK): capped falls back to exact, drops nothing; table builder fails loudly") {
    // the ADVICE scenario: every vec_id >= PqK, so centsFrom yields an
    // empty codebook — pqSummaryOf's inner joins would silently drop
    // every big-bucket candidate. The capped operator must detect this
    // and take the exact path (bit-identical output); the table builder
    // must refuse rather than hand back an all-zero table.
    val shifted = core.withColumn("vec_id", col("vec_id") + 1000L).cache()
    val uncapped = Similarity.embedNearDups(shifted, Tau, 4, 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val capped = Similarity.embedNearDupsCapped(shifted, Tau, 4, 4, occupancyCap = 64L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(uncapped.nonEmpty, "fixture must still produce near-dup pairs after the id shift")
    assert(capped == uncapped, s"codebook-less fallback changed the output: " +
      s"${(capped -- uncapped).size} extra, ${(uncapped -- capped).size} missing")
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqCentDotTable(shifted)
    }
    assert(ex.getMessage.contains("codebook is empty"))
  }

  test("negative minCos routes to the uncapped path (cap is an optimization, not an API change)") {
    val uncapped = Similarity.embedNearDups(core, -0.5, 4, 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val capped = Similarity.embedNearDupsCapped(core, -0.5, 4, 4, occupancyCap = 64L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(capped == uncapped,
      s"negative-threshold fallback diverged: ${(capped -- uncapped).size} extra, " +
        s"${(uncapped -- capped).size} missing")
  }

  test("semanticDedup: capped == exact path on the dense core") {
    val viaExact = graft.ml.Cluster.semanticDedup(core, Tau, k = 8, iters = 2,
      occupancyCap = Long.MaxValue)
      .as[(Long, Long)].collect().toSet
    val viaCap = graft.ml.Cluster.semanticDedup(core, Tau, k = 8, iters = 2,
      occupancyCap = 32L)
      .as[(Long, Long)].collect().toSet
    assert(viaCap == viaExact,
      s"capped semanticDedup diverged: ${(viaCap -- viaExact).size} extra, ${(viaExact -- viaCap).size} missing")
  }
}
