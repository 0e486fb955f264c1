package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.scheduler._

/** Writes the plan evidence of named gate entries to files — the
  * before/after artifacts under plans/r<round>/. Usage:
  *   sbt "runMain graft.tools.PlanSnap <outDir> <suffix> <entry> [entry...]"
  * For each entry it runs the query under a job group, then writes
  * `<outDir>/<entry>_<suffix>.txt` containing (a) the formatted explain of
  * the final (post-AQE) SQL plan and (b) a per-stage execution profile
  * (callsite + task count + shuffle read/write bytes). The RDD-backed
  * linalg entries reduce to a LocalTableScan checksum on the SQL side, so
  * (b) is where their actual distributed shape — which operations shuffled
  * and how many bytes — is visible and checkable. SF dir via
  * SPARK_GRAFT_SF_DIR (default sf0.01). */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <outDir> <suffix> <entry> [entry...]")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    val suffix = args(1)
    val spark = graft.core.GraftSession.local()
    val sc = spark.sparkContext
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    // stage profile, keyed by job group
    case class StageRow(id: Int, name: String, tasks: Int, readMb: Double, writeMb: Double,
                        wallMs: Long, runMs: Long, gcMs: Long)
    val stagesByGroup = new java.util.concurrent.ConcurrentHashMap[String, java.util.List[StageRow]]()
    val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    sc.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val g = Option(j.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null) j.stageIds.foreach(id => stageGroup.put(id, g): Unit)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val g = stageGroup.get(s.stageInfo.stageId)
        if (g != null) {
          val m = s.stageInfo.taskMetrics
          stagesByGroup
            .computeIfAbsent(g, _ => java.util.Collections.synchronizedList(new java.util.ArrayList[StageRow]()))
            .add(StageRow(s.stageInfo.stageId, s.stageInfo.name, s.stageInfo.numTasks,
              m.shuffleReadMetrics.totalBytesRead / 1e6,
              m.shuffleWriteMetrics.bytesWritten / 1e6,
              (for { a <- s.stageInfo.submissionTime; b <- s.stageInfo.completionTime }
                 yield b - a).getOrElse(-1L),
              m.executorRunTime, m.jvmGCTime)): Unit
        }
      }
    })

    // Deterministic listener drain (r15 ADVICE #2 — a fixed sleep
    // silently drops stage events that arrive late under load, so the
    // shuffle totals written as plan evidence could under-report): run a
    // marker job under its own group and poll until ITS stage event has
    // been captured — per-queue event ordering then guarantees every
    // earlier stage event has been delivered too (same proof as
    // EntryMetrics.drain).
    var markerSeq = 0
    def drain(timeoutMs: Long = 15000L): Unit = {
      markerSeq += 1
      val mg = s"plansnap-marker-$markerSeq"
      sc.setJobGroup(mg, mg)
      sc.parallelize(1 to 2, 1).count(): Unit
      sc.clearJobGroup()
      val deadline = System.currentTimeMillis() + timeoutMs
      while (System.currentTimeMillis() < deadline && !stagesByGroup.containsKey(mg))
        Thread.sleep(25)
      stagesByGroup.remove(mg): Unit
    }

    for (n <- args.drop(2)) {
      val group = s"plansnap-$n"
      sc.setJobGroup(group, n)
      val df = graft.SparkEntry.queries(n)(spark, d)
      df.collect(): Unit   // execute so AQE's final plan is what we print
      sc.clearJobGroup()
      drain()              // all of this entry's stage events delivered
      val qe = df.queryExecution
      val formatted = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      val rows = Option(stagesByGroup.get(group))
        .map(l => { val a = new java.util.ArrayList(l); a })
        .map(_.toArray(Array.empty[StageRow]).sortBy(_.id)).getOrElse(Array.empty[StageRow])
      val totalR = rows.map(_.readMb).sum
      val totalW = rows.map(_.writeMb).sum
      val profile = rows.map(r =>
        f"  stage ${r.id}%4d  tasks=${r.tasks}%-5d shuffleRead=${r.readMb}%9.2f MB  shuffleWrite=${r.writeMb}%9.2f MB  wall=${r.wallMs}%6d ms run=${r.runMs}%7d ms gc=${r.gcMs}%5d ms  ${r.name}")
        .mkString("\n")
      val body =
        s"""== $n (formatted explain, post-execution) ==
           |$formatted
           |== executed plan (final, post-AQE) ==
           |${qe.executedPlan.toString}
           |== stage profile (this entry's jobs: callsite, tasks, shuffle bytes) ==
           |${if (rows.isEmpty) "  (no stages captured)" else profile}
           |  TOTAL shuffleRead=${f"$totalR%.2f"} MB shuffleWrite=${f"$totalW%.2f"} MB over ${rows.length} stages
           |""".stripMargin
      Files.write(outDir.resolve(s"${n}_$suffix.txt"), body.getBytes("UTF-8")): Unit
      println(s"wrote ${outDir.resolve(s"${n}_$suffix.txt")} (stages=${rows.length}, read=${f"$totalR%.1f"} MB)")
    }
    spark.stop()
  }
}
