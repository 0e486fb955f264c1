package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NetcdfLite._

/** CDF-1 subset: byte-level round-trips, multi-variable files,
  * attribute skipping, and the explicit-failure contracts. */
class NetcdfLiteSpec extends AnyFunSuite {

  test("NC_INT rank-2 round-trip is exact") {
    val dims = Array(4L, 6L)
    val data = Array.tabulate(24)(k => ((k * 53 + 7) % 997).toDouble)
    val d = readVariable(write(Seq(("t", dims, data)), asInt = true), "t")
    assert(d.dims.sameElements(dims) && d.data.sameElements(data))
  }

  test("NC_DOUBLE rank-1 round-trip is bit-exact") {
    val data = Array(0.5, -2.75, math.E, 1e-300, -0.0)
    val d = readVariable(write(Seq(("v", Array(5L), data)), asInt = false), "v")
    assert(d.data.zip(data).forall { case (a, b) =>
      java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b) })
  }

  test("multiple variables resolve by name; odd-length data pads to 4 bytes") {
    // 3-element NC_INT vsize = 12 (already aligned); use a 1×1 to hit
    // padding (4 bytes, aligned) and a 3-long name (padded to 4)
    val bytes = write(Seq(
      ("abc", Array(3L), Array(1.0, 2.0, 3.0)),
      ("row0", Array(1L), Array(39.0)),
      ("m", Array(2L, 2L), Array(9.0, 8.0, 7.0, 6.0))), asInt = true)
    assert(readVariable(bytes, "abc").data.sameElements(Array(1.0, 2.0, 3.0)))
    assert(readVariable(bytes, "row0").data.sameElements(Array(39.0)))
    assert(readVariable(bytes, "m").dims.sameElements(Array(2L, 2L)))
    assert(read(bytes).map(_.name) == Seq("abc", "row0", "m"))
  }

  test("missing variable and bad magic fail with explicit messages") {
    val bytes = write(Seq(("x", Array(1L), Array(1.0))), asInt = true)
    val e1 = intercept[IllegalArgumentException](readVariable(bytes, "y"))
    assert(e1.getMessage.contains("y") && e1.getMessage.contains("x"))
    val e2 = intercept[IllegalArgumentException](read("not netcdf".getBytes))
    assert(e2.getMessage.contains("magic"))
  }

  test("a record (unlimited-dimension) variable is rejected, not misread") {
    // hand-build a header whose dim 0 has length 0 (the unlimited marker)
    val good = write(Seq(("x", Array(2L), Array(1.0, 2.0))), asInt = true)
    val buf = java.nio.ByteBuffer.wrap(good).order(java.nio.ByteOrder.BIG_ENDIAN)
    // layout: magic(4) numrecs(4) | dim_list: tag(4) count(4)
    // namelen(4) name "x_d0"(4, already aligned) -> length field at 24
    val dimLenPos = 4 + 4 + 4 + 4 + 4 + 4
    buf.putInt(dimLenPos, 0)
    val e = intercept[IllegalArgumentException](read(good))
    assert(e.getMessage.contains("unlimited"))
  }
}
