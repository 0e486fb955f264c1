package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Tables
import graft.functions.ArrayDotLong
import graft.operators.{Similarity, TextSim}

/** Distributed Lloyd k-means over the embeddings table — the clustering
  * primitive a training-data pipeline uses to structure a corpus (topic
  * balancing, diversity sampling, IVF codebook training for
  * [[graft.operators.Similarity.ivfTopK]]). Reference analog: the
  * iterative dask-ml jobs the reference runs over its futures facade
  * (`/root/reference/README.md:277-295` trains an estimator, and
  * Wukong's paper workloads include iterative ML); re-expressed
  * Spark-first.
  *
  * Distributed shape per iteration — the canonical scalable k-means:
  *  - ASSIGN is map-only: the k×64 codebook rides in the closure as
  *    literal arrays; each row evaluates k fused [[ArrayDotLong]] dots
  *    and a `least()` packed argmin (`d²·8 + id`, the e05 trick — exact
  *    integers, deterministic ties toward the lower cell id). The corpus
  *    is never shuffled to be assigned.
  *  - UPDATE is one partial-aggregated shuffle: posexplode to
  *    (cell, dim, v) rows, map-side-combined `sum/count` per (cell, dim)
  *    — at most k·64 groups regardless of corpus size — then a k·64-row
  *    collect builds the next codebook on the driver (the same
  *    small-model residency as [[Predict]]'s broadcast-score contract).
  *  - Centroid components are FLOORED integer means (`floor(sum/cnt)`):
  *    sums of quantized ints are < 2^53, so the double division is
  *    correctly rounded and bit-equal on any IEEE engine — which is what
  *    makes a 2-iteration clustering exact-oracle checkable end to end.
  *
  * Empty cells simply drop out of the codebook (their id is not
  * reassigned — the packed key keeps ORIGINAL cell ids), matching the
  * oracle's GROUP BY semantics.
  */
object Cluster {
  type Q = (SparkSession, String) => DataFrame

  private val KPack = 8L

  /** Map-only assignment against a driver-resident codebook: packed
    * argmin over `d²(q, C_j)·8 + j` — requires staged (qv, qn) columns. */
  private def cellOf(cents: Seq[(Long, Array[Long])]): Column = {
    require(cents.nonEmpty && cents.forall(_._1 < KPack))
    val keys = cents.map { case (id, cv) =>
      val cn = cv.map(x => x * x).sum // ≤ 64·(10^4)² ≈ 6.4e9 — packs safely
      (col("qn") - lit(2L) * ArrayDotLong.dotLong(col("qv"), lit(cv)) + lit(cn)) *
        lit(KPack) + lit(id)
    }
    (if (keys.size == 1) keys.head else least(keys: _*)) % lit(KPack)
  }

  /** One codebook update: partial-aggregated (cell, dim) sums — k·64
    * groups — collected to the driver as floored integer means. */
  private[graft] def updateCents(assigned: DataFrame): Seq[(Long, Array[Long])] =
    assigned
      .select(col("cell"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getAs[Long]("cell"))
      .toSeq
      .map { case (cell, rows) =>
        val cv = new Array[Long](64)
        rows.foreach { r =>
          cv(r.getAs[Int]("dim")) =
            math.floor(r.getAs[Long]("s").toDouble / r.getAs[Long]("c")).toLong
        }
        cell -> cv
      }
      .sortBy(_._1)

  /** The assignment after `iters` Lloyd rounds from the deterministic
    * `vec_id < k` seed: (vec_id, qv, qn, cell), eagerly materialized
    * (localCheckpoint) so downstream consumers — the kmeans stats
    * aggregation, e06's within-cluster self-join — never re-drive the
    * iteration lineage. */
  private[graft] def assignDF(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    require(k <= KPack, s"packed argmin reserves ${KPack} cell ids")
    val staged = emb
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("qn", ArrayDotLong.dotLong(col("qv"), col("qv")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seed: Seq[(Long, Array[Long])] = staged
      .filter(col("vec_id") < k)
      .select(col("vec_id"), col("qv"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
      .toSeq

    // iters-1 full (assign + update) rounds, then the final assignment.
    val cents = (1 until iters).foldLeft(seed) { (c, _) =>
      updateCents(staged.withColumn("cell", cellOf(c)))
    }
    val out = staged.withColumn("cell", cellOf(cents)).localCheckpoint(true)
    staged.unpersist(false)
    out
  }

  /** `iters` Lloyd iterations from the deterministic `vec_id < k` seed;
    * returns per-cell membership stats of the LAST assignment plus the
    * final codebook's component-sum checksum — every column an exact
    * integer. */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val lastAssign = assignDF(emb, k, iters)
    val finalCents = updateCents(lastAssign)

    import spark.implicits._
    val centSums = finalCents.map { case (id, cv) => (id, cv.sum) }
      .toDF("cell", "cent_sum")
    val out = lastAssign
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"), sum(col("vec_id")).as("sum_vec_id"))
      .join(broadcast(centSums), "cell")
      .select(col("cell"), col("n_members"), col("sum_vec_id"), col("cent_sum"))
      .localCheckpoint(true)
    out
  }

  def kmeansQuery(s: SparkSession, d: String): DataFrame =
    kmeans(TextSim.spread(Tables.embeddings(s, d)), k = 8, iters = 2)

  /** e06: SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public method): k-means the embedding corpus,
    * then prune, WITHIN each cluster only, every vector that has a
    * lower-id near-duplicate at cosine ≥ τ; survivors keep the corpus.
    * Composes the gate's own primitives — the ml04 Lloyd assignment and
    * the e04 quantized-cosine scorer (the cosine is the same fixed IEEE
    * expression `dot/(√qnₐ·√qn_b)` mirrored bit-for-bit in the oracle).
    *
    * Scale story: the cluster count is THE knob — per-cluster pairwise
    * work is O(N²/k), so production sizes k ∝ N (SemDeDup itself runs
    * 50k clusters over 5B embeddings; cf. [[Similarity.numCellsFor]]'s
    * occupancy law for the same reasoning on IVF cells) and the
    * self-join below is an equi-join on `cell` — candidates never leave
    * their cluster, there is no global all-pairs anywhere. τ = 0.3
    * plays the role ~0.95 would on a real corpus (the synthetic
    * embeddings are mean-centered; max pairwise cos ≈ 0.46 — same
    * calibration note as e04). */
  def semanticDedup(emb: DataFrame, tau: Double = 0.3,
                    k: Int = 8, iters: Int = 2,
                    occupancyCap: Long = 4096L): DataFrame = {
    val assigned = assignDF(emb, k, iters)
    val cosOf = ArrayDotLong.dotLong(col("qva"), col("qvb")).cast("double") /
      (sqrt(col("qna").cast("double")) * sqrt(col("qnb").cast("double")))
    // within-cell pairwise scoring, vectors carried through the equi-join
    def pairsExact(df: DataFrame): DataFrame =
      df.select(col("vec_id").as("va"), col("qv").as("qva"),
                col("qn").as("qna"), col("cell"))
        .join(df.select(col("vec_id").as("vb"), col("qv").as("qvb"),
                        col("qn").as("qnb"), col("cell")), Seq("cell"))
        .filter(col("va") < col("vb"))
        .withColumn("cos", cosOf).filter(col("cos") >= tau)
        .select(col("vb"))
    // cell-occupancy audit: ≤ k rows — the bounded-collect discipline.
    // A dense directional core piles into one cell no matter how the
    // occupancy law sizes k (the e04 failure shape); cells above the cap
    // spill their pairs through the CONSERVATIVE PQ pre-verify
    // ([[Similarity.pqPreVerify]] — no false negatives) so the wasted
    // below-threshold candidates are pruned before any vector ships.
    // Output is bit-identical at any cap.
    val occs = assigned.groupBy(col("cell")).agg(count(lit(1)).as("occ"))
      .collect().map(r => r.getAs[Long]("cell") -> r.getAs[Long]("occ")).toMap
    val bigCells = occs.collect { case (c, n) if n > occupancyCap => c }.toSeq
    val pruned =
      (if (bigCells.isEmpty) pairsExact(assigned)
       else {
         val small = assigned.filter(!col("cell").isin(bigCells: _*))
         val big = assigned.filter(col("cell").isin(bigCells: _*))
         val summ = Similarity.pqSummaryOf(emb,
           emb.join(big.select(col("vec_id")), Seq("vec_id"), "left_semi"))
         val candBig = big.select(col("cell"), col("vec_id").as("vec_a"))
           .join(big.select(col("cell").as("cell2"), col("vec_id").as("vec_b")),
                 col("cell") === col("cell2") && col("vec_a") < col("vec_b"))
           .select(col("vec_a"), col("vec_b"))
         val kept = Similarity.pqPreVerify(candBig, summ,
           Similarity.pqCentDotTable(emb), tau)
         val exactBig = kept   // survivors fetch vectors once per side
           .join(assigned.select(col("vec_id").as("vec_a"), col("qv").as("qva"),
                                 col("qn").as("qna")), "vec_a")
           .join(assigned.select(col("vec_id").as("vec_b"), col("qv").as("qvb"),
                                 col("qn").as("qnb")), "vec_b")
           .withColumn("cos", cosOf).filter(col("cos") >= tau)
           .select(col("vec_b").as("vb"))
         pairsExact(small).unionByName(exactBig)
       }).distinct()
    assigned.join(pruned, assigned("vec_id") === pruned("vb"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** e06 entry: runs the occupancy-scaled cell count
    * ([[Similarity.numCellsFor]] — resolves to the pinned 8 cells at
    * every gate sf, grows linearly with N, the e04/e05 discipline). */
  def semanticDedupQuery(s: SparkSession, d: String): DataFrame = {
    val emb = TextSim.spread(Tables.embeddings(s, d))
    val k = Similarity.requirePinned("e06", Similarity.numCellsFor(
      emb.select(col("vec_id")).count()), 8)
    semanticDedup(emb, k = k)
  }

  /** e11: clustering QUALITY profile — per-cell inertia (Σ‖q − c‖²),
    * squared radius (max member distance) and membership, the
    * k-means diagnostics (elbow curves, Davies–Bouldin inputs, cell
    * rebalancing decisions) read off a fitted codebook. Every distance
    * is EXACT INTEGER (quantized vectors × floored integer centroids:
    * qn − 2·q·c + cn), so the profile hash-matches the oracle's
    * closed-form reconstruction of the same two Lloyd rounds. Scale
    * shape: the codebook broadcasts (k rows), distances evaluate
    * map-side in the fused dot-product kernel, and one k-row aggregate
    * leaves the cluster — the corpus never shuffles. */
  def clusterProfile(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val lastAssign = assignDF(emb, k, iters)
    val cents = updateCents(lastAssign)
    val centDf = cents.map { case (cell, cv) => (cell, cv) }.toDF("cell", "cv")
    val sq = col("qn") -
      lit(2L) * graft.functions.ArrayDotLong.dotLong(col("qv"), col("cv")) +
      graft.functions.ArrayDotLong.dotLong(col("cv"), col("cv"))
    lastAssign
      .join(broadcast(centDf), "cell")
      .withColumn("sq", sq)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"),
           sum(col("sq")).as("inertia"),
           max(col("sq")).as("max_sq_radius"))
  }

  def clusterProfileQuery(s: SparkSession, d: String): DataFrame =
    clusterProfile(TextSim.spread(Tables.embeddings(s, d)), k = 8, iters = 2)

  val queries: Map[String, Q] = Map(
    "e11_cluster_profile" -> (clusterProfileQuery _),
    "ml04_kmeans" -> (kmeansQuery _),
    "e06_semantic_dedup" -> (semanticDedupQuery _),
  )

  /** Unrolled 2-iteration Lloyd assignment CTE chain — ONE definition
    * shared by the ml04 and e06 oracles, so the two entries can never
    * assert against divergent clusterings: same quantization, same
    * packed argmin, same floored integer means (`//`-free: floor of a
    * correctly rounded double division, identical to Spark's). Ends at
    * `a2` = the final (vec_id, qv, cell) assignment. */
  private val assignCte =
    """WITH q AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5) AS BIGINT)) AS qv
            FROM embeddings),
          dims AS (SELECT UNNEST(generate_series(1, 64)) AS i),
          c0 AS (SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < 8),
          a1 AS (SELECT v.vec_id, v.qv,
                   CAST(min((list_dot_product(v.qv, v.qv)
                             - 2*list_dot_product(v.qv, c.cv)
                             + list_dot_product(c.cv, c.cv)) * 8 + c.cell) % 8
                        AS BIGINT) AS cell
                 FROM q v, c0 c GROUP BY v.vec_id, v.qv),
          c1 AS (SELECT cell, list(comp ORDER BY i) AS cv FROM (
                   SELECT a1.cell, d.i,
                          CAST(floor(CAST(sum(a1.qv[d.i]) AS DOUBLE) / count(*)) AS BIGINT) AS comp
                   FROM a1, dims d GROUP BY a1.cell, d.i) t
                 GROUP BY cell),
          a2 AS (SELECT v.vec_id, v.qv,
                   CAST(min((list_dot_product(v.qv, v.qv)
                             - 2*list_dot_product(v.qv, c.cv)
                             + list_dot_product(c.cv, c.cv)) * 8 + c.cell) % 8
                        AS BIGINT) AS cell
                 FROM q v, c1 c GROUP BY v.vec_id, v.qv)"""

  val oracles: Map[String, String] = Map(
    // same two Lloyd rounds, same floored integer codebook, same exact
    // integer distances — inertia/radius are pure BIGINT sums
    "e11_cluster_profile" -> (assignCte + """,
          c2 AS (SELECT cell, list(comp ORDER BY i) AS cv FROM (
                   SELECT a2.cell, d.i,
                          CAST(floor(CAST(sum(a2.qv[d.i]) AS DOUBLE) / count(*)) AS BIGINT) AS comp
                   FROM a2, dims d GROUP BY a2.cell, d.i) t
                 GROUP BY cell)
          SELECT a2.cell, count(*) AS n_members,
                 CAST(sum(CAST(list_dot_product(a2.qv, a2.qv) AS BIGINT)
                          - 2*CAST(list_dot_product(a2.qv, c2.cv) AS BIGINT)
                          + CAST(list_dot_product(c2.cv, c2.cv) AS BIGINT)) AS BIGINT) AS inertia,
                 CAST(max(CAST(list_dot_product(a2.qv, a2.qv) AS BIGINT)
                          - 2*CAST(list_dot_product(a2.qv, c2.cv) AS BIGINT)
                          + CAST(list_dot_product(c2.cv, c2.cv) AS BIGINT)) AS BIGINT) AS max_sq_radius
          FROM a2 JOIN c2 USING (cell)
          GROUP BY a2.cell"""),
    "ml04_kmeans" -> (assignCte + """,
          c2 AS (SELECT cell, list(comp ORDER BY i) AS cv FROM (
                   SELECT a2.cell, d.i,
                          CAST(floor(CAST(sum(a2.qv[d.i]) AS DOUBLE) / count(*)) AS BIGINT) AS comp
                   FROM a2, dims d GROUP BY a2.cell, d.i) t
                 GROUP BY cell)
          SELECT a2.cell, count(*) AS n_members,
                 CAST(sum(a2.vec_id) AS BIGINT) AS sum_vec_id,
                 CAST(max(list_sum(c2.cv)) AS BIGINT) AS cent_sum
          FROM a2 JOIN c2 USING (cell)
          GROUP BY a2.cell"""),
    // within-cluster pairwise only (equi-join on cell), cosine as the
    // same fixed IEEE expression as the Spark side; prune any vector
    // with a lower-id near-dup in its cluster, survivors pass through.
    "e06_semantic_dedup" -> (assignCte + """,
          scored AS (SELECT x.vec_id AS va, y.vec_id AS vb,
                       CAST(list_dot_product(x.qv, y.qv) AS DOUBLE)
                       / (sqrt(CAST(list_dot_product(x.qv, x.qv) AS DOUBLE))
                          * sqrt(CAST(list_dot_product(y.qv, y.qv) AS DOUBLE))) AS cos
                     FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id),
          pruned AS (SELECT DISTINCT vb FROM scored WHERE cos >= 0.3)
          SELECT a2.vec_id, a2.cell
          FROM a2 LEFT JOIN pruned ON a2.vec_id = pruned.vb
          WHERE pruned.vb IS NULL"""),
  )
}
