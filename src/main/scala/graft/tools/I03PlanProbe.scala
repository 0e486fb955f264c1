package graft.tools
import org.apache.spark.sql.functions._

/** Scratch probe behind the BENCH_NOTES i03 scaling analysis: executed
  * join mixes AND per-step shuffle attribution at 1x vs 4x corpus
  * volume (each pipeline step materialized in its own EntryMetrics
  * window, so the step whose bytes drive the x1->x4 jump is named, not
  * guessed). Reads the corpora ScaleProbe generates. */
object I03PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val metrics = new graft.core.EntryMetrics()
    spark.sparkContext.addSparkListener(metrics)
    def timed[T](name: String)(f: => T): T = {
      val w0 = System.currentTimeMillis()
      val r = f
      metrics.window(name, w0, System.currentTimeMillis()); r
    }
    for (k <- Seq(1, 4)) {
      val li = spark.read.parquet(s"/tmp/graft_scaleprobe/x$k/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
      val e0 = li.select(col("l_orderkey"), col("l_suppkey").as("a"))
        .join(li.select(col("l_orderkey"), col("l_suppkey").as("b")), "l_orderkey")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed(s"x$k:1_e0")(e0.count())
      val deg = e0.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed(s"x$k:2_deg")(deg.count())
      val withDeg = e0
        .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      val oriented = withDeg.select(
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
               struct(col("a").as("u"), col("b").as("w")))
            .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
        .select(col("e.u").as("u"), col("e.w").as("w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed(s"x$k:3_oriented")(oriented.count())
      val adj = oriented.groupBy(col("u"))
        .agg(sort_array(collect_list(col("w"))).as("nbrs"), count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed(s"x$k:4_adj")(adj.count())
      val tri = oriented
        .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
        .join(adj.select(col("u").as("w"), col("nbrs").as("nw")), Seq("w"))
        .select(size(array_intersect(col("nu"), col("nw"))).as("t"))
        .agg(sum(col("t")).cast("long").as("n_triangles"))
      timed(s"x$k:5_tri")(tri.write.format("noop").mode("overwrite").save())
      Seq(e0, deg, oriented, adj).foreach(_.unpersist(true))
    }
    metrics.drain(spark)
    metrics.breakdowns.toSeq.sortBy(_._1).foreach { case (n, b) =>
      if (n != "_other")
        println(f"[i03step] $n%-16s shuffle_read=${b.shuffleReadBytes / 1e6}%9.1f MB  write=${b.shuffleWriteBytes / 1e6}%9.1f MB  tasks=${b.tasks}")
    }
    spark.stop()
  }
}
