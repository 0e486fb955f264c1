package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** src10: PERMISSIVE corrupt-record quarantine — the accounting must be
  * exact (nothing dropped, nothing misrouted) and the torn payloads must
  * survive byte-for-byte in `_corrupt_record`. */
class PermissiveJsonSpec extends SparkSpec {

  test("src10: clean + corrupt partitions the file, and torn lines are preserved verbatim") {
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
              round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedCorrupt = orders.count(_._1 % 7 == 3).toLong
    val expectedCleanSum = orders.filter(_._1 % 7 != 3).map(_._2).sum

    val row = FileFormats.permissiveJson(spark, sfDir).collect().head
    assert(row.getLong(0) + row.getLong(2) == orders.length,
      "every staged line must land in exactly one of clean/corrupt")
    assert(row.getLong(2) == expectedCorrupt && expectedCorrupt > 0)
    assert(row.getLong(1) == expectedCleanSum)

    // the quarantined column carries the torn line text unmodified.
    // (Spark refuses a query whose referenced columns are ONLY the
    // internal corrupt column — keep a parsed column in the projection.)
    val staged = spark.read
      .schema("o_orderkey LONG, o_custkey LONG, cents LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(FileFormats.scratch("pjson"))
      .select(col("o_orderkey"), col("_corrupt_record"))
      .filter(col("_corrupt_record").isNotNull)
      .collect().map(_.getString(1)).sorted
    val want = orders.filter(_._1 % 7 == 3)
      .map(o => s"""{"o_orderkey":${o._1},"o_custkey":""").sorted
    assert(staged.toSeq == want.toSeq)
  }

  test("src13: XML round-trip is lossless and the part files are row-tagged XML") {
    val row = FileFormats.xmlRoundtrip(spark, sfDir).collect().head
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(row.getLong(0) == orders.length)
    assert(row.getLong(1) == orders.map(_._3).sum)
    assert(row.getLong(2) == orders.map(_._1).sum)
    assert(row.getLong(3) == orders.map(_._2).distinct.length)
    // on-disk files must really be XML documents carrying the row tag
    val files = java.nio.file.Files.list(
        java.nio.file.Paths.get(FileFormats.scratch("xml")))
      .toArray.map(_.toString).filter(_.endsWith(".xml"))
    assert(files.nonEmpty, "no .xml part files written")
    val body = java.nio.file.Files.readString(
      java.nio.file.Paths.get(files.head))
    assert(body.contains("<order>") && body.contains("</order>"))
  }

  test("src14: multiline CSV survives quoted embedded newlines losslessly") {
    val row = FileFormats.csvMultiline(spark, sfDir).collect().head
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
              (conv(substring(md5(when(col("doc_id") % 7 === 0,
                                       translate(col("text"), " ", "\n"))
                                    .otherwise(col("text"))), 1, 15), 16, 10)
                 .cast("long") % 1000000007L).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getLong(0) == docs.length)
    assert(row.getLong(1) == docs.map(_._1).sum)
    assert(row.getLong(2) == docs.map(_._2).sum)
    // the staged records really span physical lines: some part file has
    // more raw lines than records (quoted newlines inside fields)
    val dir = java.nio.file.Paths.get(FileFormats.scratch("csvml"))
    val rawLines = java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".csv"))
      .map(f => java.nio.file.Files.readAllLines(java.nio.file.Paths.get(f)).size().toLong)
      .sum
    assert(rawLines > docs.length, "no record spans lines — multiline path unexercised")
  }

  test("src11: the gzip codec is really applied and the round-trip is lossless") {
    val row = FileFormats.gzipCsvRoundtrip(spark, sfDir).collect().head
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
              round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getLong(0) == orders.length)
    assert(row.getLong(1) == orders.map(_._2).sum)
    assert(row.getLong(2) == orders.map(_._1).sum)
    // on-disk files must actually be gzip members (magic 1f 8b)
    val files = java.nio.file.Files.list(
        java.nio.file.Paths.get(FileFormats.scratch("csvgz")))
      .toArray.map(_.toString).filter(_.endsWith(".gz"))
    assert(files.nonEmpty, "no .gz part files written")
    files.foreach { f =>
      val head = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(f))
      val (b0, b1) = (head.read(), head.read()); head.close()
      assert(b0 == 0x1f && b1 == 0x8b, s"$f lacks the gzip magic")
    }
  }
}
