package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Where does an st entry's wall time go? Runs named streaming entries
  * and prints every micro-batch's `durationMs` breakdown (addBatch /
  * getBatch / latestOffset / queryPlanning / walCommit / commitOffsets /
  * triggerExecution) plus the entry wall — the streaming analog of the
  * stage profile (trigger overhead is invisible to stage metrics).
  * Usage: sbt "runMain graft.tools.StProbe st07_stream_join ..."  */
object StProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"  [query ${e.id.toString.take(8)} started]")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dm = p.durationMs.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"  batch ${p.batchId}: rows=${p.numInputRows} $dm")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"  [query ${e.id.toString.take(8)} terminated]")
    })
    for (n <- args) {
      val fn = graft.SparkEntry.queries(n)
      val t0 = System.nanoTime()
      fn(spark, d).write.format("noop").mode("overwrite").save()
      println(f"$n wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
