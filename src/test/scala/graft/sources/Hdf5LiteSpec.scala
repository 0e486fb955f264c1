package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Hdf5Lite._

/** Public-spec HDF5 subset: byte-level round-trips through the classic
  * format (superblock v0 / v1 object headers / symbol-table group /
  * contiguous layout) plus the explicit-failure contracts. */
class Hdf5LiteSpec extends AnyFunSuite {

  test("int64 rank-2 round-trip is exact") {
    val dims = Array(5L, 7L)
    val data = Array.tabulate(35)(k => ((k * 37 + 11) % 1000).toDouble)
    val bytes = write(Seq(("data", dims, data)), asInt = true)
    val d = readDataset(bytes, "data")
    assert(d.dims.sameElements(dims))
    assert(d.data.sameElements(data))
  }

  test("float64 rank-1 round-trip is bit-exact") {
    val data = Array(0.5, -1.25, math.Pi, 1e300, -0.0, 3e-200)
    val bytes = write(Seq(("v", Array(6L), data)), asInt = false)
    val d = readDataset(bytes, "v")
    assert(d.dims.sameElements(Array(6L)))
    assert(d.data.zip(data).forall { case (a, b) =>
      java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b) })
  }

  test("multiple datasets in one file resolve by name regardless of insertion order") {
    val bytes = write(Seq(
      ("zz_last", Array(2L), Array(9.0, 8.0)),
      ("aa_first", Array(3L), Array(1.0, 2.0, 3.0)),
      ("row0", Array(1L), Array(17.0))), asInt = true)
    assert(readDataset(bytes, "aa_first").data.sameElements(Array(1.0, 2.0, 3.0)))
    assert(readDataset(bytes, "zz_last").data.sameElements(Array(9.0, 8.0)))
    assert(readDataset(bytes, "row0").data.sameElements(Array(17.0)))
    assert(read(bytes).map(_.name).sorted == Seq("aa_first", "row0", "zz_last"))
  }

  test("missing dataset and non-HDF5 bytes fail with explicit messages") {
    val bytes = write(Seq(("data", Array(1L), Array(1.0))), asInt = true)
    val e1 = intercept[IllegalArgumentException](readDataset(bytes, "nope"))
    assert(e1.getMessage.contains("nope") && e1.getMessage.contains("data"))
    val e2 = intercept[IllegalArgumentException](read("not an hdf5 file at all..".getBytes))
    assert(e2.getMessage.contains("signature"))
  }

  test("row-major rank-2 layout: cell (i,j) reads back from offset i*cols+j") {
    val dims = Array(3L, 4L)
    val data = Array.tabulate(12)(_.toDouble) // row-major: row i = [4i, 4i+3]
    val d = readDataset(write(Seq(("m", dims, data)), asInt = true), "m")
    assert(d.data(1 * 4 + 2) == 6.0) // (1,2)
    assert(d.data(2 * 4 + 0) == 8.0) // (2,0)
  }
}
