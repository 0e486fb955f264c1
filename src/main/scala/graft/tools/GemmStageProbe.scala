package graft.tools

import graft.array.DMatrix
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Scratch probe: which stage of the flagship 10k² GEMM dominates —
  * generation, shuffle, or compute — with per-stage Spark metrics. */
object GemmStageProbe {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val bs = if (args.nonEmpty) args(0).toInt else 1000
    val s = graft.core.GraftSession.local()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.submissionTime; z <- si.completionTime)
          yield (z - a) / 1000.0).getOrElse(-1.0)
        System.err.println(
          f"[stage] ${si.stageId}%3d ${si.name.take(40)}%-40s tasks=${si.numTasks}%4d " +
          f"wall=$wall%7.1fs " +
          f"run=${m.executorRunTime / 1000.0}%8.1fs gc=${m.jvmGCTime / 1000.0}%7.1fs " +
          f"deser=${m.executorDeserializeTime / 1000.0}%6.1fs " +
          f"serRes=${m.resultSerializationTime / 1000.0}%5.1fs " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e9}%6.2fGB " +
          f"shWt=${m.shuffleWriteMetrics.writeTime / 1e9}%6.1fs " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e9}%6.2fGB " +
          f"shRwait=${m.shuffleReadMetrics.fetchWaitTime / 1000.0}%5.1fs " +
          f"spillMem=${m.memoryBytesSpilled / 1e9}%6.2fGB spillDisk=${m.diskBytesSpilled / 1e9}%6.2fGB")
      }
    })
    val n = if (args.length > 1) args(1).toInt else 10000
    val a = DMatrix.randInt(s, n, n, bs, 51L, mod = 100L)
    val b = DMatrix.randInt(s, n, n, bs, 53L, mod = 100L)
    time(s"multiply n=$n bs=$bs + sum") { println("checksum " + a.multiply(b).sum) }
    if (!sys.env.contains("SPARK_GRAFT_PROBE_ONCE"))
      time(s"multiply n=$n bs=$bs + sum (2nd)") { println("checksum " + a.multiply(b).sum) }
    s.stop()
  }
}
