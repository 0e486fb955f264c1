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

  test("property: random Arrow IPC files round-trip exactly; footer probes match") {
    import ArrowLite._
    val rng = new scala.util.Random(2719)
    for (trial <- 1 to 8) {
      val n = rng.nextInt(50) // 0 rows legal: schema comes from the footer
      val nCols = 1 + rng.nextInt(5)
      val cols: Seq[Col] = (0 until nCols).map { k =>
        rng.nextInt(3) match {
          case 0 => LongCol(s"c$k", Array.fill(n)(rng.nextLong()))
          case 1 => DoubleCol(s"c$k", Array.fill(n)(
            java.lang.Double.longBitsToDouble(rng.nextLong()) match {
              case d if d.isNaN => 0.25 // NaN != NaN would fail the compare below
              case d => d
            }))
          case _ => StringCol(s"c$k", Array.fill(n)(
            rng.alphanumeric.take(rng.nextInt(12)).mkString + "é✓")) // non-ASCII utf8
        }
      }
      val batchRows = 1 + rng.nextInt(17)
      val bytes = write(cols, batchRows)
      // footer-only probes
      assert(schemaFields(bytes).map(_._1) == cols.map(_.name), s"trial $trial schema")
      assert(batchCount(bytes) == (n + batchRows - 1) / batchRows, s"trial $trial batches")
      val back = read(bytes)
      assert(back.size == cols.size)
      cols.zip(back).foreach {
        case (LongCol(nm, a), LongCol(nm2, b)) =>
          assert(nm == nm2 && a.sameElements(b), s"trial $trial long $nm")
        case (DoubleCol(nm, a), DoubleCol(nm2, b)) =>
          assert(nm == nm2 && a.zip(b).forall { case (x, y) =>
            java.lang.Double.doubleToRawLongBits(x) == java.lang.Double.doubleToRawLongBits(y) },
            s"trial $trial double $nm")
        case (StringCol(nm, a), StringCol(nm2, b)) =>
          assert(nm == nm2 && a.sameElements(b), s"trial $trial string $nm")
        case (c, r) => fail(s"trial $trial type drift: $c vs $r")
      }
    }
  }

  test("property: random chunk grids + shuffle/deflate round-trip exactly (h5py's gzip shape)") {
    val rng = new scala.util.Random(3331)
    for (trial <- 1 to 8) {
      val rows = 1L + rng.nextInt(40); val cols = 1L + rng.nextInt(40)
      // chunk dims independent of the data dims — edge chunks everywhere
      val chunk = (1L + rng.nextInt(13), 1L + rng.nextInt(13))
      val asInt = rng.nextBoolean()
      val data = Array.fill((rows * cols).toInt)(
        if (asInt) (rng.nextInt(200001) - 100000).toDouble else rng.nextDouble() * 1e6 - 5e5)
      val extra = ("row0", Array(1L), Array(trial.toDouble)) // contiguous sibling
      val bytes = Hdf5Lite.writeChunked(
        Seq(("data", Array(rows, cols), data), extra), asInt, chunk)
      val d = Hdf5Lite.readDataset(bytes, "data")
      assert(d.dims.sameElements(Array(rows, cols)), s"trial $trial dims chunk=$chunk")
      assert(d.data.zip(data).forall { case (a, b) =>
        java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b) },
        s"trial $trial values ${rows}x$cols chunk=$chunk asInt=$asInt")
      assert(Hdf5Lite.readDataset(bytes, "row0").data(0) == trial.toDouble)
      assert(Hdf5Lite.readDims(bytes, "data").sameElements(Array(rows, cols)))
    }
  }

  test("fromStripes rejects overlapping stripes and coverage gaps explicitly") {
    def stage(offsets: Seq[(Long, Int)]): String = { // (row0, rows) shards, 4 cols
      val dir = java.nio.file.Files.createTempDirectory("graft_badstripes").toString
      offsets.zipWithIndex.foreach { case ((r0, p), k) =>
        val bytes = Hdf5Lite.write(Seq(
          ("data", Array(p.toLong, 4L), Array.fill(p * 4)(1.0)),
          ("row0", Array(1L), Array(r0.toDouble))), asInt = true)
        java.nio.file.Files.write(java.nio.file.Paths.get(dir, f"part-$k%03d.h5"), bytes)
      }
      dir
    }
    val e1 = intercept[Exception] {
      DMatrix.fromHdf5(spark, stage(Seq((0L, 5), (3L, 5))), "data", bs = 4).toLocal }
    assert(e1.getMessage.contains("overlap"))
    val e2 = intercept[Exception] {
      DMatrix.fromHdf5(spark, stage(Seq((0L, 3), (5L, 3))), "data", bs = 4).toLocal }
    assert(e2.getMessage.contains("gap"))
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
