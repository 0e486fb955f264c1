package graft.tools

/** Microbenchmark: single-threaded dgemm GFLOP/s vs block size for the
  * JVM BLAS the executors actually get (JNI absent on this box → the
  * dev.ludovic.netlib Java fallback). Pins down whether the 20k² grid-held
  * GEMM's collapse is the per-block kernel (2000² blocks) or Spark-side.
  * No SparkSession — pure JVM.
  */
object DgemmMicro {
  def main(args: Array[String]): Unit = {
    val blas = dev.ludovic.netlib.blas.BLAS.getInstance
    System.err.println(s"[micro] BLAS impl: ${blas.getClass.getName}")
    val sizes = if (args.nonEmpty) args(0).split(",").map(_.toInt) else Array(500, 1000, 1500, 2000)
    for (n <- sizes) {
      val a = Array.fill(n * n)(scala.util.Random.nextInt(100).toDouble)
      val b = Array.fill(n * n)(scala.util.Random.nextInt(100).toDouble)
      val c = new Array[Double](n * n)
      // warmup
      blas.dgemm("N", "N", n, n, n, 1.0, a, n, b, n, 0.0, c, n)
      val reps = math.max(1, (1500 / n) * (1500 / n) * (1500 / n)) max 1
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) {
        blas.dgemm("N", "N", n, n, n, 1.0, a, n, b, n, 1.0, c, n)
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val gflops = 2.0 * n * n * n * reps / sec / 1e9
      System.err.println(f"[micro] n=$n%5d reps=$reps%2d ${sec / reps}%8.3f s/rep  $gflops%7.2f GFLOP/s (1 thread)")
    }
    // Same total flops as one 2000^3, issued as 8 panel calls of 1000^3
    // addressed in place via (offset, ld=2000): does the collapse follow
    // the LOGICAL panel size (paneling fixes it) or the STRIDE (it
    // doesn't, and panels must be packed into contiguous buffers)?
    {
      val n = 2000; val p = 1000
      val a = Array.fill(n * n)(scala.util.Random.nextInt(100).toDouble)
      val b = Array.fill(n * n)(scala.util.Random.nextInt(100).toDouble)
      val c = new Array[Double](n * n)
      val t0 = System.nanoTime()
      for (i <- 0 until 2; j <- 0 until 2; k <- 0 until 2)
        blas.dgemm("N", "N", p, p, p, 1.0,
          a, k * p * n + i * p, n,
          b, j * p * n + k * p, n,
          1.0, c, j * p * n + i * p, n)
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[micro] 2000^3 as 8x 1000-panels (ld=2000): $sec%8.3f s  ${2.0 * n * n * n / sec / 1e9}%7.2f GFLOP/s (1 thread)")
    }
  }
}
