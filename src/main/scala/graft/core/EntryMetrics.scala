package graft.core

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-entry runtime breakdown (SURVEY §2A A19): the rebuild's analog of
  * the reference's per-task execution records — `TaskExecutionBreakdown` /
  * `LambdaExecutionBreakdown` in `TE/wukong_metrics.py:1-320`, which the
  * scheduler ingests per task (`SS/wukong/scheduler.py:4164-4435`) to
  * explain where a job's wall time went. Here the unit of account is the
  * benchmark ENTRY, and the breakdown per entry is the Spark-native
  * decomposition: stage/task counts, executor run + GC time, shuffle
  * bytes read/written, fetch-wait, spill, and scan input bytes.
  *
  * Mechanics: stage-completion events arrive asynchronously on the
  * listener bus, so live "current entry" tagging would misattribute any
  * stage whose event lands after the entry returns. Instead the harness
  * records wall-clock WINDOWS (entry name, start, end) around each rep,
  * the listener buffers every stage's metrics keyed by its SUBMISSION
  * time, and attribution joins the two after the suite — entries run
  * sequentially, so windows are disjoint and the join is exact. `drain`
  * runs a marker job and waits for its event, proving (by per-queue
  * event ordering) every earlier stage event has been delivered.
  *
  * Scale note: this is driver-side accounting of already-aggregated
  * per-stage metrics (Spark sums task metrics into `StageInfo` for us) —
  * O(stages) memory, no per-task state, so it costs the same on a
  * 1000-executor cluster as on local[32]. */
final class EntryMetrics extends SparkListener {

  final case class Breakdown(stages: Int, tasks: Int, runMs: Long, gcMs: Long,
                             shuffleReadBytes: Long, shuffleWriteBytes: Long,
                             fetchWaitMs: Long, shuffleWriteMs: Long,
                             spillMemBytes: Long, spillDiskBytes: Long,
                             inputBytes: Long, peakMemBytes: Long) {
    def +(o: Breakdown): Breakdown = Breakdown(
      stages + o.stages, tasks + o.tasks, runMs + o.runMs, gcMs + o.gcMs,
      shuffleReadBytes + o.shuffleReadBytes, shuffleWriteBytes + o.shuffleWriteBytes,
      fetchWaitMs + o.fetchWaitMs, shuffleWriteMs + o.shuffleWriteMs,
      spillMemBytes + o.spillMemBytes, spillDiskBytes + o.spillDiskBytes,
      inputBytes + o.inputBytes,
      // peak is a per-stage pressure indicator: take the worst stage,
      // never a sum across stages that ran at different times
      math.max(peakMemBytes, o.peakMemBytes))
  }

  private final case class StageRec(submittedMs: Long, b: Breakdown)

  // listener-bus thread writes, harness thread reads after drain()
  private val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRec]()
  private val windows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long)]()

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    if (m != null) stages.add(StageRec(
      si.submissionTime.getOrElse(-1L),
      Breakdown(1, si.numTasks, m.executorRunTime, m.jvmGCTime,
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
        m.shuffleReadMetrics.fetchWaitTime, m.shuffleWriteMetrics.writeTime / 1000000L,
        m.memoryBytesSpilled, m.diskBytesSpilled,
        m.inputMetrics.bytesRead, m.peakExecutionMemory)))
  }

  /** Record that `name` owned the wall-clock interval [startMs, endMs). */
  def window(name: String, startMs: Long, endMs: Long): Unit =
    windows.add((name, startMs, endMs))

  /** Run a marker job and wait for its stage event: per-queue ordering
    * guarantees every stage completed before it has been delivered. */
  def drain(spark: SparkSession, timeoutMs: Long = 10000L): Unit = {
    val markerStart = System.currentTimeMillis()
    spark.sparkContext.parallelize(1 to 2, 1).count()
    val deadline = markerStart + timeoutMs
    import scala.jdk.CollectionConverters._
    while (System.currentTimeMillis() < deadline &&
           !stages.asScala.exists(_.submittedMs >= markerStart))
      Thread.sleep(50)
  }

  /** Join stages to windows by submission time and aggregate. Stages
    * outside every window (session setup, the drain marker, warmup) land
    * under "_other" (summed). Per entry, the reported breakdown is the
    * BEST rep's — the window with the smallest wall duration — not a sum
    * across reps: summing made gc_sec accumulate every loaded rep and
    * outlier re-run (r15 VERDICT #4: a16 gc_sec read 100.3 s while its
    * wall fell), and since every rep executes the identical plan, byte
    * metrics are per-rep quantities anyway. The best rep is the one the
    * recorded wall time comes closest to, so attribution and timing
    * describe the same execution. */
  def breakdowns: Map[String, Breakdown] = {
    import scala.jdk.CollectionConverters._
    val ws = windows.asScala.toVector.sortBy(_._2)
    val byWindow = stages.asScala.toVector.groupBy { rec =>
      ws.find(w => rec.submittedMs >= w._2 && rec.submittedMs < w._3)
    }
    val other = byWindow.collect { case (None, recs) =>
      "_other" -> recs.map(_.b).reduce(_ + _)
    }
    val perEntry = byWindow.collect { case (Some(w), recs) =>
      (w, recs.map(_.b).reduce(_ + _))
    }.groupBy(_._1._1).map { case (name, reps) =>
      name -> reps.minBy { case ((_, s, e), _) => e - s }._2
    }
    perEntry ++ other
  }

  /** One JSON object per entry, seconds/MB units, sorted by key — the
    * file the bench writes next to bench_out.json. */
  def toJson(extra: Map[String, String]): String = {
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    def mb(b: Long) = f"${b / 1e6}%.2f"
    def sec(ms: Long) = f"${ms / 1e3}%.3f"
    val entries = breakdowns.toSeq.sortBy(_._1).map { case (k, b) =>
      s"${jstr(k)}:{" +
        s""""stages":${b.stages},"tasks":${b.tasks},""" +
        s""""run_sec":${sec(b.runMs)},"gc_sec":${sec(b.gcMs)},""" +
        s""""shuffle_read_mb":${mb(b.shuffleReadBytes)},"shuffle_write_mb":${mb(b.shuffleWriteBytes)},""" +
        s""""fetch_wait_sec":${sec(b.fetchWaitMs)},"shuffle_write_sec":${sec(b.shuffleWriteMs)},""" +
        s""""spill_mem_mb":${mb(b.spillMemBytes)},"spill_disk_mb":${mb(b.spillDiskBytes)},""" +
        s""""input_mb":${mb(b.inputBytes)},"peak_mem_mb":${mb(b.peakMemBytes)}}"""
    }.mkString(",")
    val head = extra.toSeq.sortBy(_._1).map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString(",")
    // empty extra must not leave a leading comma (invalid JSON)
    Seq(head, s"\"entries\":{$entries}").filter(_.nonEmpty).mkString("{", ",", "}")
  }
}
