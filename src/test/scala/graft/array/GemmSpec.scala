package graft.array

import breeze.linalg.{DenseMatrix => BDM}
import org.scalatest.funsuite.AnyFunSuite

/** The paneled dgemm (Gemm.scala) vs Breeze — pure-JVM, no Spark.
  * Exercises the >1024-dim regime where paneling actually kicks in,
  * uneven panel tails, α/β handling, and (offset, ld) sub-matrix
  * addressing. Integer-domain inputs so equality is exact. */
class GemmSpec extends AnyFunSuite {

  private def randM(rows: Int, cols: Int, seed: Int): BDM[Double] = {
    val r = new scala.util.Random(seed)
    BDM.fill(rows, cols)(r.nextInt(10).toDouble)
  }

  test("small call (no paneling) matches Breeze") {
    val a = randM(37, 23, 1); val b = randM(23, 19, 2)
    val got = new BDM(37, 19, Gemm.multiply(a.data, 37, 23, b.data, 19))
    assert(got == a * b)
  }

  test("paneled call with uneven tails matches Breeze (1500x1300 * 1300x1100)") {
    val m = 1500; val k = 1300; val n = 1100
    val a = randM(m, k, 3); val b = randM(k, n, 4)
    val got = new BDM(m, n, Gemm.multiply(a.data, m, k, b.data, n))
    assert(got == a * b)
  }

  test("beta=1 accumulates into existing C across repeated paneled calls") {
    val m = 1100; val k = 1050; val n = 1030
    val a = randM(m, k, 5); val b = randM(k, n, 6)
    val c = randM(m, n, 7)
    val acc = c.copy
    Gemm.dgemm(m, n, k, 1.0, a.data, 0, m, b.data, 0, k, 1.0, acc.data, 0, m)
    Gemm.dgemm(m, n, k, 1.0, a.data, 0, m, b.data, 0, k, 1.0, acc.data, 0, m)
    assert(acc == c + (a * b) * 2.0)
  }

  test("alpha scaling and beta=0 overwrite") {
    val m = 1040; val k = 30; val n = 1200
    val a = randM(m, k, 8); val b = randM(k, n, 9)
    val acc = randM(m, n, 10) // junk that beta=0 must overwrite
    Gemm.dgemm(m, n, k, 2.0, a.data, 0, m, b.data, 0, k, 0.0, acc.data, 0, m)
    assert(acc == (a * b) * 2.0)
  }

  test("k=0 paneled call applies beta (C := beta*C), matching the BLAS contract") {
    // ADVICE r14: the kk-loop never runs at k=0, so beta needs explicit
    // handling in the paneled branch (m or n > panel) to match the
    // monolithic path.
    val m = 1100; val n = 40
    val c0 = randM(m, n, 13)
    val halved = c0.copy
    Gemm.dgemm(m, n, 0, 1.0, Array.empty[Double], 0, m,
      Array.empty[Double], 0, 1, 0.5, halved.data, 0, m)
    assert(halved == c0 * 0.5)
    val zeroed = c0.copy
    Gemm.dgemm(m, n, 0, 1.0, Array.empty[Double], 0, m,
      Array.empty[Double], 0, 1, 0.0, zeroed.data, 0, m)
    assert(zeroed == BDM.zeros[Double](m, n))
  }

  test("(offset, ld) addressing multiplies an interior sub-matrix in place") {
    val host = randM(200, 200, 11)
    val a = host.copy; val b = randM(80, 60, 12)
    // A-sub = host[20..99, 30..109] (80x80), C-sub written at [5..84, 90..149]
    val c = BDM.zeros[Double](200, 200)
    Gemm.dgemm(80, 60, 80, 1.0,
      a.data, 30 * 200 + 20, 200,
      b.data, 0, 80,
      0.0, c.data, 90 * 200 + 5, 200)
    val want = a(20 until 100, 30 until 110) * b
    assert(c(5 until 85, 90 until 150) == want)
  }
}
