package graft.tools

import org.apache.spark.scheduler._
import graft.array.{DMatrix, LinAlg}

/** Isolates choleskyLower's own shuffle traffic (r15): a18's bench
  * number bundles two SUMMA GEMMs (SPD build + L·Lᵀ reconstruction)
  * around the factorization, so the per-step trailing-update cost is
  * invisible in bench_metrics. Builds the SPD input, caches it, then
  * runs ONLY the factorization under a job group and reports the
  * group's shuffle read/write bytes and wall time. Sizes via
  * SPARK_GRAFT_CHOL_N / _BS (default the a18 shape 2048/256).
  */
object CholeskyProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_CHOL_N", "2048").toInt
    val bs = sys.env.getOrElse("SPARK_GRAFT_CHOL_BS", "256").toInt
    val spark = graft.core.GraftSession.local()
    val base = DMatrix.randInt(spark, n, n, bs, 97L, mod = 10L)
    val spd = (base.transpose.multiply(base) + (DMatrix.eye(spark, n, bs) * (10.0 * n))).persist()
    spd.blocks.rdd.count(): Unit

    val group = s"chol-probe-${System.nanoTime}"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val read = new java.util.concurrent.atomic.AtomicLong()
    val write = new java.util.concurrent.atomic.AtomicLong()
    val lis = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (group == Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull)
          j.stageIds.foreach(id => stages.add(id): Unit)
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (stages.contains(s.stageInfo.stageId)) {
          read.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead): Unit
          write.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
        }
    }
    spark.sparkContext.addSparkListener(lis)
    spark.sparkContext.setJobGroup(group, "cholesky factorization only")
    val t0 = System.nanoTime()
    val l = LinAlg.choleskyLower(spd)
    val nBlocks = l.blocks.rdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.clearJobGroup()
    Thread.sleep(1500)   // settle the async listener bus
    val aBytes = 8L * n * n
    println(f"""{"kernel":"cholesky","n":$n,"bs":$bs,"blocks":$nBlocks,""" +
      f""""sec":$sec%.2f,"shuffle_read_mb":${read.get() / 1e6}%.1f,""" +
      f""""shuffle_write_mb":${write.get() / 1e6}%.1f,"a_mb":${aBytes / 1e6}%.1f}""")
    spark.stop()
  }
}
