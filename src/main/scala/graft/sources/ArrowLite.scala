package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel

/** Arrow IPC *file* codec for staged landing-zone shards — the analog of
  * the reference's Arrow payload handler (`SS/wukong/protocol/arrow.py`),
  * which round-trips record batches through `pyarrow`'s IPC stream.
  * Built on the Apache Arrow Java library already on Spark's classpath
  * (Spark itself ships it for columnar interchange) — the IPC encoding
  * is the PUBLIC Arrow columnar format spec, so shards written by
  * pyarrow/arrow-rs/arrow-cpp read back identically.
  *
  * Scale stance (the src15/src16/src17 contract): one shard = one decode
  * call on one executor via binaryFile — files are the parallelism unit
  * and the decoder never touches the driver. The FOOTER carries the
  * schema and the record-batch block index, so [[schemaFields]] /
  * [[batchCount]] are metadata-only probes: they never map a batch body,
  * however large the shard. Per-shard allocators are closed on every
  * path (Arrow direct memory is off-heap — a leak would survive GC).
  */
object ArrowLite {

  /** One decoded/encodable column. Long, Double and UTF-8 string cover
    * the gate's shard payloads; nulls are out of scope (staged shards
    * are dense by contract — a null would fail loudly in [[read]]). */
  sealed trait Col { def name: String; def size: Int }
  final case class LongCol(name: String, values: Array[Long]) extends Col { def size: Int = values.length }
  final case class DoubleCol(name: String, values: Array[Double]) extends Col { def size: Int = values.length }
  final case class StringCol(name: String, values: Array[String]) extends Col { def size: Int = values.length }

  private def fieldOf(c: Col): Field = c match {
    case _: LongCol   => new Field(c.name, FieldType.notNullable(new ArrowType.Int(64, true)), null)
    case _: DoubleCol => new Field(c.name, FieldType.notNullable(
      new ArrowType.FloatingPoint(org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)), null)
    case _: StringCol => new Field(c.name, FieldType.notNullable(ArrowType.Utf8.INSTANCE), null)
  }

  /** Encode `cols` (equal lengths) as one Arrow IPC FILE image, split
    * into record batches of `batchRows` — multi-batch files are what a
    * real writer emits for anything non-trivial, and what keeps peak
    * encode memory at batch grain rather than shard grain. */
  def write(cols: Seq[Col], batchRows: Int = 4096): Array[Byte] = {
    require(cols.nonEmpty, "empty column list")
    val n = cols.head.size
    require(cols.forall(_.size == n), "ragged columns")
    require(batchRows > 0)
    val allocator = new RootAllocator()
    try {
      val schema = new Schema(cols.map(fieldOf).asJava)
      val root = VectorSchemaRoot.create(schema, allocator)
      try {
        val baos = new ByteArrayOutputStream()
        val writer = new ArrowFileWriter(root, null, Channels.newChannel(baos))
        writer.start()
        var off = 0
        while (off < n) {
          val m = math.min(batchRows, n - off)
          cols.zipWithIndex.foreach { case (c, k) =>
            val v = root.getVector(k)
            v.reset()
            c match {
              case LongCol(_, xs) =>
                val bv = v.asInstanceOf[BigIntVector]; bv.allocateNew(m)
                var i = 0; while (i < m) { bv.set(i, xs(off + i)); i += 1 }
              case DoubleCol(_, xs) =>
                val dv = v.asInstanceOf[Float8Vector]; dv.allocateNew(m)
                var i = 0; while (i < m) { dv.set(i, xs(off + i)); i += 1 }
              case StringCol(_, xs) =>
                val sv = v.asInstanceOf[VarCharVector]; sv.allocateNew(m)
                var i = 0; while (i < m) { sv.setSafe(i, xs(off + i).getBytes("UTF-8")); i += 1 }
            }
            v.setValueCount(m)
          }
          root.setRowCount(m)
          writer.writeBatch()
          off += m
        }
        writer.end(); writer.close()
        baos.toByteArray
      } finally root.close()
    } finally allocator.close()
  }

  /** Decode every record batch of one IPC file back to columns. */
  def read(bytes: Array[Byte]): Seq[Col] = {
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
      try {
        val root = reader.getVectorSchemaRoot
        val fields = root.getSchema.getFields.asScala.toSeq
        val longs = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuilder.ofLong]()
        val dbls = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuilder.ofDouble]()
        val strs = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[String]]()
        while (reader.loadNextBatch()) {
          val m = root.getRowCount
          fields.indices.foreach { k =>
            root.getVector(k) match {
              case bv: BigIntVector =>
                val b = longs.getOrElseUpdate(k, new scala.collection.mutable.ArrayBuilder.ofLong)
                var i = 0; while (i < m) {
                  require(!bv.isNull(i), s"null in dense column '${fields(k).getName}'")
                  b += bv.get(i); i += 1
                }
              case dv: Float8Vector =>
                val b = dbls.getOrElseUpdate(k, new scala.collection.mutable.ArrayBuilder.ofDouble)
                var i = 0; while (i < m) {
                  require(!dv.isNull(i), s"null in dense column '${fields(k).getName}'")
                  b += dv.get(i); i += 1
                }
              case sv: VarCharVector =>
                val b = strs.getOrElseUpdate(k, new scala.collection.mutable.ArrayBuffer[String])
                var i = 0; while (i < m) {
                  require(!sv.isNull(i), s"null in dense column '${fields(k).getName}'")
                  b += new String(sv.get(i), "UTF-8"); i += 1
                }
              case other => throw new IllegalArgumentException(
                s"column '${fields(k).getName}': vector ${other.getClass.getSimpleName} unsupported " +
                  "(int64/float64/utf8 shards only)")
            }
          }
        }
        fields.zipWithIndex.map { case (f, k) =>
          if (longs.contains(k)) LongCol(f.getName, longs(k).result())
          else if (dbls.contains(k)) DoubleCol(f.getName, dbls(k).result())
          else if (strs.contains(k)) StringCol(f.getName, strs(k).toArray)
          else f.getType match { // zero-batch file: type from the footer schema
            case _: ArrowType.Int => LongCol(f.getName, Array.empty)
            case _: ArrowType.FloatingPoint => DoubleCol(f.getName, Array.empty)
            case _ => StringCol(f.getName, scala.collection.mutable.ArrayBuffer.empty[String].toArray)
          }
        }
      } finally reader.close()
    } finally allocator.close()
  }

  /** Footer-only probe: (column name, arrow type string) pairs. Never
    * maps a record-batch body — the fromStripes-style metadata pass. */
  def schemaFields(bytes: Array[Byte]): Seq[(String, String)] = {
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
      try reader.getVectorSchemaRoot.getSchema.getFields.asScala.toSeq
        .map(f => (f.getName, f.getType.toString))
      finally reader.close()
    } finally allocator.close()
  }

  /** Footer-only probe: number of record batches (the footer's block
    * index length) — no batch body is read. */
  def batchCount(bytes: Array[Byte]): Int = {
    val allocator = new RootAllocator()
    try {
      val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), allocator)
      try reader.getRecordBlocks.size
      finally reader.close()
    } finally allocator.close()
  }
}
