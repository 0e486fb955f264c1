package graft.array

import graft.SparkSpec
import breeze.linalg.{DenseMatrix => BDM}

/** r15 SYRK kernel: [[DMatrix.gramian]] must equal the full
  * transpose·multiply product EXACTLY on the integer-domain fixtures the
  * gate entries use (all sums of integer products ≪ 2⁵³ — any fold order
  * yields the same double), on every dispatch regime (single-block-column
  * local syrk, triangular tiled SUMMA at t=1 and t>1, sparse triangular
  * input), and be exactly symmetric by construction. */
class GramSpec extends SparkSpec {

  test("gramian == transpose·multiply exactly on a ragged multi-block grid") {
    val a = DMatrix.randInt(spark, 37, 23, 8, 3L, mod = 10L)   // 5×3 blocks, ragged edges
    val got = a.gramian.toLocal
    val want = a.transpose.multiply(a).toLocal
    assert(got == want, "integer-domain gramian must be exact")
  }

  test("gramian on a single-block-column (tall-skinny QᵀQ shape): local-syrk path") {
    val a = DMatrix.randInt(spark, 64, 6, 8, 11L, mod = 10L)   // 8×1 blocks
    assert(a.nbCols == 1)
    val got = a.gramian.toLocal
    val want = a.transpose.multiply(a).toLocal
    assert(got == want)
  }

  test("L·Lᵀ via l.transpose.gramian on a sparse lower factor: absent means zero") {
    val base = DMatrix.randInt(spark, 48, 48, 8, 17L, mod = 10L)
    val l = base.tril                                          // upper blocks ABSENT
    val got = l.transpose.gramian.toLocal
    val want = l.toLocal * l.toLocal.t
    assert(got == want)
  }

  test("gramian output is exactly symmetric (the mirror IS the transpose)") {
    val a = DMatrix.randInt(spark, 40, 32, 8, 23L, mod = 97L)
    val g = a.gramian.toLocal
    for (i <- 0 until g.rows; j <- 0 until i)
      assert(g(i, j) == g(j, i), s"asymmetry at ($i,$j)")      // bitwise, not tolerance
  }

  test("triangular tile rule: ≥¾-wave over the LOWER grid, accumulator cap respected") {
    // 4 slots in tests → minTasks 3. The chooser is deterministic and
    // prefers the largest admissible t: t=8 → gT=2 → 3 lower tiles ≥ 3 ✓,
    // so exactly 8 (r15 ADVICE #3 — a slack `|| 4` arm would mask a
    // change to the preference order).
    assert(DMatrix.gramTileFor(10, 8, 4, Long.MaxValue) == 8)
    // cap forces t down: t=2 needs 2·2·8·8·8 = 2048 B; cap it below that
    assert(DMatrix.gramTileFor(10, 8, 4, 1024L) == 1)
    // big parts force t=1: 32 slots → 24 tasks; q=8 t=2 → 10 lower tiles < 24
    assert(DMatrix.gramTileFor(8, 256, 32, Long.MaxValue) == 1)
  }
}
