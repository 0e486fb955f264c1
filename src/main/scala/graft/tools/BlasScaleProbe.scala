package graft.tools

import breeze.linalg.{DenseMatrix => BDM}
import java.util.concurrent.{Executors, TimeUnit}

/** Scratch probe: aggregate DGEMM throughput vs thread count — sizes the
  * flagship GEMM entry's achievable wall time on this box. */
object BlasScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    for (threads <- Seq(1, 4, 8, 16, 32)) {
      val pool = Executors.newFixedThreadPool(threads)
      val repsPerThread = 3
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val a = BDM.tabulate(n, n)((i, j) => ((i * n + j + t) % 1000).toDouble)
            val b = BDM.tabulate(n, n)((i, j) => ((i * n + j + 7 * t) % 1000).toDouble)
            var r = 0
            while (r < repsPerThread) { val c = a * b; r += 1; if (c(0, 0) < -1) println("x") }
          }
        })
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      val dt = (System.nanoTime() - t0) / 1e9
      val gflops = 2.0 * n * n * n * threads * repsPerThread / dt / 1e9
      println(f"threads=$threads%2d n=$n: $dt%.2f s aggregate ${gflops}%.1f GFLOP/s")
    }
  }
}
