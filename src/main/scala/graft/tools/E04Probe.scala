package graft.tools
import org.apache.spark.sql.functions._

/** Scratch probe behind the BENCH_NOTES round-12 e04 scaling analysis:
  * per scale, the pre-distinct candidate-pair mass (sum of c*(c-1)/2
  * over LSH buckets), the hottest bucket occupancies, and the verified
  * output split into intra-/cross-replica pairs. Reads the corpora
  * ScaleProbe generates under /tmp/graft_scaleprobe. */
object E04Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    for (k <- Seq(1, 4, 16)) {
      val emb = spark.read.parquet(s"/tmp/graft_scaleprobe/x$k/embeddings.parquet")
      val n = emb.count()
      val planes = graft.operators.Similarity.planesPerBandFor(n)
      // pre-distinct candidate-pair mass = sum over (band,bucket) of c*(c-1)/2
      val occ = graft.operators.Similarity.bandedLsh(emb, planes, 4)
        .groupBy("band", "bucket").agg(count(lit(1)).as("c"))
      val cand = occ.agg(sum(col("c") * (col("c") - 1) / 2).cast("long")).head.getLong(0)
      val hot = occ.orderBy(col("c").desc).limit(3).collect().map(_.getLong(2)).mkString(",")
      val out = graft.operators.Similarity.embedNearDupsScaled(emb, 0.3).count()
      val crossOut = graft.operators.Similarity.embedNearDupsScaled(emb, 0.3)
        .filter(expr("vec_a div 10000000 != vec_b div 10000000")).count()
      println(s"[e04probe] x$k n=$n planes=$planes cand_pairs=$cand hot_buckets=$hot out=$out cross_out=$crossOut")
    }
    spark.stop()
  }
}
