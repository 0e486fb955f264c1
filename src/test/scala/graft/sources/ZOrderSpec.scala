package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The point of the Z-order layout is stats-based skipping on TWO
  * dimensions at once. Proven from the parquet footers themselves: each
  * file's (user_id, hour_off) min/max envelope is read back with the
  * parquet-hadoop API, and the 2-D box must intersect only a fraction
  * of the z-clustered files while it intersects every unsorted one. */
class ZOrderSpec extends SparkSpec {

  /** Per-file [min,max] envelope of the two layout dimensions, straight
    * from the parquet row-group statistics (what the reader's row-group
    * pruning consults). */
  private def envelopes(dir: String): Seq[(Long, Long, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
      .toSeq.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        scala.util.Using.resource(org.apache.parquet.hadoop.ParquetFileReader.open(in)) { r =>
          val cols = r.getFooter.getBlocks.asScala
            .flatMap(_.getColumns.asScala)
            .map(c => c.getPath.toDotString -> c.getStatistics)
          def span(name: String): (Long, Long) = {
            val ss = cols.collect { case (n, st) if n == name => st }
            (ss.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
             ss.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
          }
          val (ul, uh) = span("user_id"); val (hl, hh) = span("hour_off")
          (ul, uh, hl, hh)
        }
      }
  }

  private def intersecting(env: Seq[(Long, Long, Long, Long)],
                           uLo: Long, uHi: Long, hLo: Long, hHi: Long): Int =
    env.count { case (ul, uh, hl, hh) =>
      ul <= uHi && uh >= uLo && hl <= hHi && hh >= hLo }

  test("z-clustered files carry tight 2-D envelopes; box skips most of them") {
    // sf0.001: users 0..14, hours 0..~743. Box = users 4..7 x hours 216..263.
    val (uLo, uHi, hLo, hHi) = (4L, 7L, 216L, 263L)
    val zDir = java.nio.file.Files.createTempDirectory("graftzord").toString
    FileFormats.writeZLayout(spark, sfDir, zDir, files = 32)

    // control: same columns, same file count, arrival order
    val plainDir = java.nio.file.Files.createTempDirectory("graftzplain").toString
    spark.read.parquet(zDir).repartition(32)
      .write.mode("overwrite").parquet(plainDir)

    val zHit = intersecting(envelopes(zDir), uLo, uHi, hLo, hHi)
    val pEnv = envelopes(plainDir)
    val pHit = intersecting(pEnv, uLo, uHi, hLo, hHi)
    assert(pHit == pEnv.size,
      s"unsorted control should have every file intersect the box, got $pHit/${pEnv.size}")
    assert(zHit * 2 <= pHit,
      s"z-layout must let the box skip at least half the files: z=$zHit plain=$pHit")

    // layout must not change answers
    val a = FileFormats.boxAggregate(spark.read.parquet(zDir), uLo, uHi, hLo, hHi).collect()
    val b = FileFormats.boxAggregate(spark.read.parquet(plainDir), uLo, uHi, hLo, hHi).collect()
    assert(a.sameElements(b), s"box aggregate differs across layouts: ${a.toSeq} vs ${b.toSeq}")
    assert(a.head.getLong(0) > 0, "box must be non-empty at sf0.001")
  }

  test("zorder2 interleaves bits (locality: nearby points share key prefixes)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (65535L, 65535L))
      .toDF("a", "b")
      .select(col("a"), col("b"), FileFormats.zorder2(col("a"), col("b")).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toMap2
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)       // a occupies even bits
    assert(got((0L, 1L)) == 2L)       // b occupies odd bits
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 3L)) == (4L | 2L | 8L)) // a=10 -> bit2; b=11 -> bits 1,3
    assert(got((65535L, 65535L)) == 0xFFFFFFFFL)
  }

  private implicit class Tup3Ops(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] = rows.map(t => ((t._1, t._2), t._3)).toMap
  }
}
