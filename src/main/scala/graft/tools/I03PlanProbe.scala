package graft.tools
import org.apache.spark.sql.functions._

/** Scratch probe: which of i03's inner joins broadcast at 1x vs 4x —
  * backs the BENCH_NOTES x1-vs-x4 shuffle-jump attribution. */
object I03PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    for (k <- Seq(1, 4)) {
      val li = spark.read.parquet(s"/tmp/graft_scaleprobe/x$k/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"))
      val e0 = li.select(col("l_orderkey"), col("l_suppkey").as("a"))
        .join(li.select(col("l_orderkey"), col("l_suppkey").as("b")), "l_orderkey")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
      val deg = e0.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val withDeg = e0
        .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      val oriented = withDeg.select(
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
               struct(col("a").as("u"), col("b").as("w")))
            .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
        .select(col("e.u").as("u"), col("e.w").as("w"))
      val adj = oriented.groupBy(col("u"))
        .agg(sort_array(collect_list(col("w"))).as("nbrs"), count(lit(1)).as("c"))
      val tri = oriented
        .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
        .join(adj.select(col("u").as("w"), col("nbrs").as("nw")), Seq("w"))
        .select(size(array_intersect(col("nu"), col("nw"))).as("t"))
        .agg(sum(col("t")).cast("long").as("n_triangles"))
      tri.write.format("noop").mode("overwrite").save()
      val plan = tri.queryExecution.executedPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
      val smj = "SortMergeJoin".r.findAllIn(plan).size
      println(s"[i03plan] x$k full-tri plan: BHJ=$bhj SMJ=$smj")
    }
    spark.stop()
  }
}
