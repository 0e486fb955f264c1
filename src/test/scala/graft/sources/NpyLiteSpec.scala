package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.NpyLite._

/** Public-spec NPY v1.0 subset: byte-exact round-trips, header-padding
  * correctness across name/shape widths, explicit-failure contracts. */
class NpyLiteSpec extends AnyFunSuite {

  test("int64 rank-1 and rank-2 round-trips are exact") {
    val v = Array.tabulate(7)(k => ((k * 31 + 5) % 1000).toDouble)
    val a1 = read(write(Array(7L), v, asInt = true))
    assert(a1.dims.sameElements(Array(7L)) && a1.data.sameElements(v))
    val m = Array.tabulate(12)(_.toDouble)
    val a2 = read(write(Array(3L, 4L), m, asInt = true))
    assert(a2.dims.sameElements(Array(3L, 4L)) && a2.data.sameElements(m))
  }

  test("float64 round-trip is bit-exact") {
    val v = Array(0.5, -1.25, math.Pi, 1e300, -0.0, 3e-200)
    val a = read(write(Array(6L), v, asInt = false))
    assert(a.data.zip(v).forall { case (x, y) =>
      java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y) })
  }

  test("property: random shapes round-trip; data always starts 64-aligned") {
    val rng = new scala.util.Random(4441)
    for (trial <- 1 to 20) {
      val rank = 1 + rng.nextInt(2)
      val dims = Array.fill(rank)(1L + rng.nextInt(50))
      val asInt = rng.nextBoolean()
      val data = Array.fill(dims.product.toInt)(
        if (asInt) (rng.nextInt(20001) - 10000).toDouble else rng.nextDouble() * 100 - 50)
      val bytes = write(dims, data, asInt)
      // spec: magic+version+hlen+header must be a multiple of 64
      val hlen = (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
      assert((10 + hlen) % 64 == 0, s"trial $trial header not 64-aligned")
      val a = read(bytes)
      assert(a.dims.sameElements(dims) && a.data.zip(data).forall { case (x, y) =>
        java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y) },
        s"trial $trial rank=$rank dims=${dims.mkString("x")} asInt=$asInt")
    }
  }

  test("NPY v2 header (u32 length) reads back — numpy emits v2 for huge headers") {
    // hand-build a v2 image: same dict header, u32 hlen instead of u16
    val data = Array(3.0, 1.0, 4.0, 1.0, 5.0)
    val dict = "{'descr': '<f8', 'fortran_order': False, 'shape': (5,), }"
    val unpadded = 12 + dict.length + 1
    val hlen = ((unpadded + 63) / 64) * 64 - 12
    val header = dict + (" " * (hlen - dict.length - 1)) + "\n"
    val buf = java.nio.ByteBuffer.allocate(12 + hlen + 40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(0x93.toByte).put("NUMPY".getBytes).put(2.toByte).put(0.toByte)
    buf.putInt(hlen)
    buf.put(header.getBytes)
    data.foreach(buf.putDouble)
    val a = read(buf.array())
    assert(a.dims.sameElements(Array(5L)) && a.data.sameElements(data))
  }

  test("torch checkpoint container (zip-of-pickles) is rejected loudly by BOTH model readers") {
    // a minimal zip local-file-header prefix — what the first bytes of a
    // torch.save artifact look like; the refusal must name the rationale
    // (untrusted pickle) and the supported safe forms.
    val torchLike = Array[Byte]('P', 'K', 0x03, 0x04) ++ Array.fill[Byte](32)(0)
    val e1 = intercept[IllegalArgumentException](read(torchLike))
    assert(e1.getMessage.contains("torch checkpoint container") &&
           e1.getMessage.contains("arbitrary") &&
           e1.getMessage.contains("NPY") && e1.getMessage.contains("HDF5"),
      s"rejection must cite the pickle rationale and the safe forms: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException](
      graft.sources.Hdf5Lite.readDataset(torchLike, "w"))
    assert(e2.getMessage.contains("torch checkpoint container"))
  }

  test("non-NPY bytes and unsupported descr fail with explicit messages") {
    val e1 = intercept[IllegalArgumentException](read("not an npy".getBytes))
    assert(e1.getMessage.contains("magic"))
    // patch the descr of a valid file to a big-endian type
    val bytes = write(Array(2L), Array(1.0, 2.0), asInt = false)
    val s = new String(bytes, 10, 60, java.nio.charset.StandardCharsets.US_ASCII)
    val off = 10 + s.indexOf("<f8")
    bytes(off) = '>'.toByte
    val e2 = intercept[IllegalArgumentException](read(bytes))
    assert(e2.getMessage.contains("descr"))
  }
}
