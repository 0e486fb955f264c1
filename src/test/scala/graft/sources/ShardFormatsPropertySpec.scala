package graft.sources

import graft.SparkSpec
import graft.array.DMatrix

/** Property coverage for the shard-format stack: random shapes, values,
  * dataset counts and stripe layouts must round-trip byte-exactly
  * through BOTH public-spec writers/readers and the full fromStripes
  * ingest path — format bugs (padding, alignment, offset math) show up
  * as value corruption under exactly this kind of fuzzing. */
class ShardFormatsPropertySpec extends SparkSpec {

  test("property: random multi-dataset files round-trip exactly through both formats") {
    val rng = new scala.util.Random(1117)
    for (trial <- 1 to 8) {
      val nDatasets = 1 + rng.nextInt(4)
      val datasets = (0 until nDatasets).map { k =>
        val rank = 1 + rng.nextInt(2)
        val dims = Array.fill(rank)(1L + rng.nextInt(9))
        // odd name lengths exercise name padding in both formats
        val name = ("v" * (1 + rng.nextInt(6))) + k
        val data = Array.fill(dims.product.toInt)((rng.nextInt(200001) - 100000).toDouble)
        (name, dims, data)
      }
      for (asInt <- Seq(true, false)) {
        val h5 = Hdf5Lite.write(datasets, asInt)
        val nc = NetcdfLite.write(datasets, asInt)
        datasets.foreach { case (name, dims, data) =>
          val dh = Hdf5Lite.readDataset(h5, name)
          assert(dh.dims.sameElements(dims) && dh.data.sameElements(data),
            s"trial $trial hdf5 asInt=$asInt dataset $name")
          val dn = NetcdfLite.readVariable(nc, name)
          assert(dn.dims.sameElements(dims) && dn.data.sameElements(data),
            s"trial $trial netcdf asInt=$asInt variable $name")
        }
      }
    }
  }

  test("property: random stripe layouts ingest to the exact matrix through both formats") {
    val rng = new scala.util.Random(2229)
    for (trial <- 1 to 3) {
      val m = 10 + rng.nextInt(50); val n = 3 + rng.nextInt(20)
      val bs = 4 + rng.nextInt(9)
      val stripe = 1 + rng.nextInt(m) // deliberately independent of bs
      val seed = rng.nextInt(1000) + 1
      val local = breeze.linalg.DenseMatrix.tabulate[Double](m, n)((i, j) =>
        (DMatrix.lcg(i, j, n, seed) % 1000L).toDouble)
      for (fmt <- Seq("h5", "nc")) {
        val dir = java.nio.file.Files.createTempDirectory(s"graft_prop_$fmt").toString
        var r0 = 0
        var k = 0
        while (r0 < m) {
          val p = math.min(stripe, m - r0)
          val data = Array.tabulate(p * n)(x => local(r0 + x / n, x % n))
          val payload = Seq(("data", Array(p.toLong, n.toLong), data),
                            ("row0", Array(1L), Array(r0.toDouble)))
          val bytes = if (fmt == "h5") Hdf5Lite.write(payload, asInt = true)
                      else NetcdfLite.write(payload, asInt = true)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, f"part-$k%03d.$fmt"), bytes)
          r0 += p; k += 1
        }
        val got = (if (fmt == "h5") DMatrix.fromHdf5(spark, dir, "data", bs)
                   else DMatrix.fromNetcdf(spark, dir, "data", bs))
        assert(got.nRows == m && got.nCols == n,
          s"trial $trial $fmt dims ($m,$n,bs=$bs,stripe=$stripe)")
        assert(got.toLocal == local,
          s"trial $trial $fmt values ($m,$n,bs=$bs,stripe=$stripe,seed=$seed)")
      }
    }
  }
}
