package graft.tools

import graft.array.DMatrix

/** Chunk-size sweep for the flagship 10,000² GEMM (VERDICT r8 #2).
  *
  * The reference publishes the same multiply at both 1,000² chunks
  * (README.md:265-267) and 2,000² chunks (docs examples); `chunks` is the
  * one tuning knob its users hold. This sweep times a13's exact shape at
  * 500²/1,000²/2,000² blocks, median of 3 passes each, to ground the
  * library's default. Grid/task geometry at local[32]:
  *   500²  → 20×20 C grid = 400 tasks, 20-deep dgemm per task, ~2 MB blocks
  *   1000² → 10×10 C grid = 100 tasks, 10-deep dgemm per task, ~8 MB blocks
  *   2000² →  5×5  C grid =  25 tasks,  5-deep dgemm per task, ~32 MB blocks
  *     (25 tasks < 32 cores: the tail underuses the box by design — shows up
  *      directly in the numbers)
  * Run: sbt "runMain graft.tools.GemmChunkSweep" — results recorded in
  * BENCH_NOTES.md.
  */
object GemmChunkSweep {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local()
    import s.implicits._
    val reps = 3
    // warmup: full-size pass at 1000² pays JIT/codegen/shuffle-path setup
    run(s, 1000)
    for (bs <- Seq(500, 1000, 2000)) {
      val times = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        val c = run(s, bs)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[gemm-sweep] bs=$bs rep: $dt%.2f s (checksum $c)")
        dt
      }.sorted
      println(f"[gemm-sweep] bs=$bs median=${times(reps / 2)}%.2f s min=${times.head}%.2f max=${times.last}%.2f")
    }
    s.stop()
  }

  private def run(s: SparkSession, bs: Int): Long = {
    val a = DMatrix.randInt(s, 10000, 10000, bs, 51L, mod = 100L)
    val b = DMatrix.randInt(s, 10000, 10000, bs, 53L, mod = 100L)
    math.round(a.multiply(b).sum)
  }
  private type SparkSession = org.apache.spark.sql.SparkSession
}
