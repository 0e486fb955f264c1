package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Scaling-exponent probe: measures how the heaviest pipeline entries'
  * wall time grows with INPUT VOLUME, turning the repo's plan-shape
  * scale arguments (PlanAuditSpec-pinned) into observed curves.
  *
  * Corpus: the sf0.1 fixtures replicated K ∈ {1, 4, 16} times with a
  * per-replica token transform that keeps the workload's STRUCTURE
  * constant while scaling its volume:
  *  - documents: every token gets a replica suffix, so the vocabulary,
  *    shingle space and LSH bucket keys of different replicas are
  *    DISJOINT — duplicate-cluster sizes, per-shingle document
  *    frequencies and bucket occupancies stay what sf0.1 planted,
  *    which is how a real 100 TB corpus scales (dup rate roughly
  *    constant, clusters bounded — NOT every document gaining 16
  *    near-identical twins, which would quadratically inflate any
  *    pairwise stage and measure the corpus, not the operator);
  *  - orders: keys offset per replica, so customer cardinality (q37's
  *    rank input) scales with volume.
  *
  * Per (entry, K): `reps` noop-sink runs, MIN wall time (the probe asks
  * what the plan costs, not what host noise adds), plus the A19
  * breakdown (shuffle bytes, GC, spill) for the last rep window.
  * Exponents are pairwise log-ratios e = ln(t_b/t_a)/ln(b/a) and the
  * 3-point OLS slope of ln t vs ln K. Linear scaling reads e ≈ 1
  * (fixed 32-way parallelism, so time tracks volume); sub-linear means
  * fixed per-suite overhead still dominates at 16×.
  *
  * Output: one JSON line to scale_probe.json (entries × scales: sec,
  * shuffle MB, exponents) — the evidence artifact BENCH_NOTES cites.
  */
object ScaleProbe {

  private val Entries = Seq(
    "t21_dedup_clusters", // LSH band → candidate → CC: the dedup kernel
    "t30_prefix_join",    // rarest-shingle inverted index exact Jaccard
    "t44_containment",    // one-sided containment prefix filter
    "q37_global_rank",    // two-pass salted global rank
    "t20_pack_sequences", // distributed prefix-scan packing
    "e04_embed_neardup",  // sign-bit banded LSH embedding dedup
    "i03_triangles"       // degree-oriented triangle counting
  )

  private def gen(spark: SparkSession, srcDir: String, outDir: String, k: Int): Unit = {
    val doneMarker = Paths.get(outDir, "_GENERATED")
    if (Files.exists(doneMarker)) return
    Files.createDirectories(Paths.get(outDir))
    val reps = explode(sequence(lit(0), lit(k - 1))).as("r")
    // documents: disjoint token space per replica (suffix every token),
    // ids offset so replicas never collide
    spark.read.parquet(s"$srcDir/documents.parquet")
      .select(col("*"), reps)
      .select(
        (col("doc_id") + col("r").cast("long") * 10000000L).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"), concat(lit("$1q"), col("r"))))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // orders: key-offset replicas (customer cardinality scales)
    spark.read.parquet(s"$srcDir/orders.parquet")
      .select(col("*"), reps)
      .select(
        (col("o_orderkey") + col("r").cast("long") * 100000000L).as("o_orderkey"),
        (col("o_custkey") + col("r").cast("long") * 100000000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    // lineitem: order AND supplier keys offset per replica, so the i03
    // supplier co-purchase graph becomes K disjoint copies — degree
    // distribution, orientation ranks and per-node out-lists are what
    // sf0.1 planted, volume (and triangle count) scale linearly
    spark.read.parquet(s"$srcDir/lineitem.parquet")
      .select(col("*"), reps)
      .withColumn("l_orderkey", col("l_orderkey") + col("r").cast("long") * 100000000L)
      .withColumn("l_suppkey", col("l_suppkey") + col("r").cast("long") * 100000000L)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    // embeddings: per-replica deterministic sign-flip pattern — an
    // orthogonal transform, so every intra-replica cosine (and hence
    // e04's near-dup pair structure) is EXACTLY preserved per replica
    // while cross-replica vectors scatter; volume scales, geometry
    // doesn't
    spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select(col("*"), reps)
      .select(
        (col("vec_id") + col("r").cast("long") * 10000000L).as("vec_id"),
        expr("""transform(embedding, (x, i) ->
                  CASE WHEN r = 0 THEN x
                       WHEN (CAST(i+1 AS BIGINT)*(r+13)*1103515245) % 2147483647 % 2 = 0
                       THEN -x ELSE x END)""").as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    Files.createFile(doneMarker)
    ()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,4,16").split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt.max(1)
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scaleprobe")
    val only = if (args.isEmpty) Entries else Entries.filter(args.contains)
    val spark = graft.core.GraftSession.local()
    val metrics = new graft.core.EntryMetrics()
    spark.sparkContext.addSparkListener(metrics)
    val qs = graft.SparkEntry.queries

    scales.foreach { k =>
      System.err.println(s"[scale] generating x$k corpus")
      gen(spark, srcDir, s"$base/x$k", k)
    }
    // warmup at 1x: absorb JIT/codegen so the 1x timings aren't inflated
    // (an inflated 1x point biases every exponent DOWN)
    if (sys.env.getOrElse("SPARK_GRAFT_SCALE_WARMUP", "1") != "0")
      only.foreach(n => try qs(n)(spark, s"$base/x1").write.format("noop").mode("overwrite").save()
                        catch { case _: Throwable => () })

    val results = for (name <- only; k <- scales) yield {
      val fn = qs(name)
      val times = (1 to reps).map { _ =>
        System.gc()
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        fn(spark, s"$base/x$k").write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        metrics.window(s"$name@x$k", w0, System.currentTimeMillis())
        dt
      }
      System.err.println(f"[scale] $name x$k: min ${times.min}%.2f s (${times.map(t => f"$t%.2f").mkString(", ")})")
      (name, k, times.min)
    }
    metrics.drain(spark)
    val bd = metrics.breakdowns

    def jstr(s: String) = "\"" + s + "\""
    val byEntry = results.groupBy(_._1)
    val entryJson = only.map { name =>
      val pts = byEntry(name).sortBy(_._2)
      val lnPts = pts.map { case (_, k, t) => (math.log(k.toDouble), math.log(t)) }
      val n = lnPts.size
      val (sx, sy) = (lnPts.map(_._1).sum, lnPts.map(_._2).sum)
      val sxy = lnPts.map(p => p._1 * p._2).sum
      val sxx = lnPts.map(p => p._1 * p._1).sum
      val slope = if (n >= 2) (n * sxy - sx * sy) / (n * sxx - sx * sx) else 0.0
      val pair = pts.sliding(2).collect { case Seq((_, ka, ta), (_, kb, tb)) =>
        f""""x$ka->x$kb":${math.log(tb / ta) / math.log(kb.toDouble / ka)}%.3f"""
      }.mkString(",")
      val perScale = pts.map { case (_, k, t) =>
        // windows share a key across reps, so breakdown sums over reps —
        // divide back to per-rep averages for comparability with `sec`
        val b = bd.get(s"$name@x$k")
        val extra = b.map(x => f""","shuffle_mb":${x.shuffleReadBytes / 1e6 / reps}%.1f,"gc_sec":${x.gcMs / 1e3 / reps}%.2f,"spill_mb":${(x.spillMemBytes + x.spillDiskBytes) / 1e6 / reps}%.1f,"input_mb":${x.inputBytes / 1e6 / reps}%.1f""").getOrElse("")
        f""""x$k":{"sec":$t%.3f$extra}"""
      }.mkString(",")
      f"""${jstr(name)}:{"ols_exponent":$slope%.3f,$pair,$perScale}"""
    }.mkString(",")
    val line = s"""{"src":${jstr(srcDir)},"scales":[${scales.mkString(",")}],"reps":$reps,"entries":{$entryJson}}"""
    println(line)
    Files.writeString(Paths.get("scale_probe.json"), line)
    spark.stop()
  }
}
