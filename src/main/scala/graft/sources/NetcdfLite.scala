package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal NetCDF classic-format (CDF-1) reader/writer, from the public
  * NetCDF file format specification: the `'C' 'D' 'F' \x01` magic, the
  * tagged dim/attr/var header lists, big-endian fixed-size data with
  * 4-byte padding. This is the other half of the reference's
  * scientific-array ingestion surface (`SS/wukong/protocol/netcdf4.py`
  * next to the h5py handler) — climate/geo pipelines land exactly these
  * files.
  *
  * Subset: fixed dimensions only (no unlimited/record dimension — a
  * record variable fails with an explicit message, not a wrong answer),
  * rank ≤ 2 variables, all six classic numeric types on read
  * (byte/char/short/int/float/double), int or double on write.
  * Attributes are parsed past, not interpreted. Scale stance matches
  * Hdf5Lite: one shard = one executor decode; headers are O(KB). */
object NetcdfLite {

  final case class NcVariable(name: String, dims: Array[Long], data: Array[Double])

  private val NcDimension = 0x0A
  private val NcVariableTag = 0x0B
  private val NcAttribute = 0x0C

  // ---------------------------------------------------------------- write

  /** Write `vars` (name → dims → row-major doubles) as one CDF-1 image,
    * as NC_INT when `asInt` (values must fit; the exact-integer gate
    * domain does) else NC_DOUBLE. Each variable gets its own private
    * dimensions (`<name>_d0`, `<name>_d1`). */
  def write(vars: Seq[(String, Array[Long], Array[Double])], asInt: Boolean): Array[Byte] = {
    require(vars.nonEmpty && vars.forall(_._2.length <= 2))
    val elemSize = if (asInt) 4 else 8
    val ncType = if (asInt) 4 else 6 // NC_INT / NC_DOUBLE
    def padded(n: Int): Int = (n + 3) & ~3
    def nameBytes(s: String): Int = 4 + padded(s.length)
    // dims: one list entry per (var, axis)
    val dims = vars.flatMap { case (name, ds, _) =>
      ds.zipWithIndex.map { case (len, ax) => (s"${name}_d$ax", len) } }
    val dimIdOf = dims.map(_._1).zipWithIndex.toMap
    val headerSize =
      4 + 4 + // magic + numrecs
      8 + dims.map { case (n, _) => nameBytes(n) + 4 }.sum + // dim_list
      8 + // gatt_list ABSENT
      8 + vars.map { case (n, ds, _) =>
        nameBytes(n) + 4 + 4 * ds.length + 8 + 4 + 4 + 4 }.sum // var_list (begin = u32)
    val vsizes = vars.map { case (_, ds, _) => padded((ds.product * elemSize).toInt) }
    val begins = vsizes.map(_.toLong).scanLeft(headerSize.toLong)(_ + _).init
    // CDF-1 stores begin offsets as u32; a silent putInt truncation past
    // 2 GiB would corrupt the file — fail instead (CDF-2/-5 territory)
    require(begins.last + vsizes.last <= Int.MaxValue,
      s"CDF-1 offsets are 32-bit; total payload ${begins.last + vsizes.last} bytes too large")
    val buf = ByteBuffer.allocate(headerSize + vsizes.sum).order(ByteOrder.BIG_ENDIAN)
    def putName(s: String): Unit = {
      buf.putInt(s.length); buf.put(s.getBytes("UTF-8"))
      (s.length until padded(s.length)).foreach(_ => buf.put(0.toByte))
    }
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    buf.putInt(0) // numrecs
    buf.putInt(NcDimension).putInt(dims.length)
    dims.foreach { case (n, len) => putName(n); buf.putInt(len.toInt) }
    buf.putInt(0).putInt(0) // gatt_list ABSENT
    buf.putInt(NcVariableTag).putInt(vars.length)
    vars.zipWithIndex.foreach { case ((n, ds, _), k) =>
      putName(n)
      buf.putInt(ds.length)
      ds.indices.foreach(ax => buf.putInt(dimIdOf(s"${n}_d$ax")))
      buf.putInt(0).putInt(0) // vatt_list ABSENT
      buf.putInt(ncType)
      buf.putInt(vsizes(k))
      buf.putInt(begins(k).toInt)
    }
    vars.zipWithIndex.foreach { case ((_, _, data), k) =>
      buf.position(begins(k).toInt)
      if (asInt) data.foreach(v => buf.putInt(v.toInt)) else data.foreach(buf.putDouble)
    }
    buf.array()
  }

  // ----------------------------------------------------------------- read

  def read(bytes: Array[Byte]): Seq[NcVariable] =
    headers(bytes).map(h => decodeVar(bytes, h))

  /** One parsed variable header: everything needed to decode its
    * payload later (or to answer a dims-only probe without decoding). */
  private final case class VarHeader(name: String, dims: Array[Long], ncType: Int, begin: Long)

  /** Header-only parse: O(KB) regardless of payload size. */
  private def headers(bytes: Array[Byte]): Seq[VarHeader] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = new Array[Byte](3); buf.get(magic)
    require(new String(magic) == "CDF", "not a NetCDF classic file (bad magic)")
    val version = buf.get()
    require(version == 1 || version == 2,
      s"unsupported NetCDF version byte $version (HDF5-backed NetCDF-4 files parse via Hdf5Lite)")
    val numrecs = buf.getInt
    def name(): String = {
      val n = buf.getInt; val b = new Array[Byte](n); buf.get(b)
      buf.position(buf.position() + ((4 - n % 4) % 4))
      new String(b, "UTF-8")
    }
    // dim_list
    val dimTag = buf.getInt; val nDims = buf.getInt
    require(dimTag == NcDimension || (dimTag == 0 && nDims == 0), "bad dim_list tag")
    val dimLens = (0 until nDims).map { _ => name(); buf.getInt }
    skipAttributes(buf)
    val varTag = buf.getInt; val nVars = buf.getInt
    require(varTag == NcVariableTag || (varTag == 0 && nVars == 0), "bad var_list tag")
    val parsed = (0 until nVars).map { _ =>
      val vn = name()
      val rank = buf.getInt
      val dimIds = Array.fill(rank)(buf.getInt)
      skipAttributes(buf)
      val ncType = buf.getInt
      buf.getInt // vsize (recomputed from dims)
      val begin = if (version == 1) buf.getInt.toLong else buf.getLong
      require(dimIds.forall(id => dimLens(id) != 0),
        s"variable '$vn' uses the unlimited (record) dimension — unsupported")
      val dims = dimIds.map(id => dimLens(id).toLong)
      require(dims.length <= 2, s"variable '$vn': rank ${dims.length} unsupported")
      VarHeader(vn, dims, ncType, begin)
    }
    val _ = numrecs
    parsed
  }

  private def decodeVar(bytes: Array[Byte], h: VarHeader): NcVariable = {
    val n = h.dims.product.toInt.max(1)
    val db = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    db.position(h.begin.toInt)
    val out = new Array[Double](n)
    var i = 0
    h.ncType match {
      case 1 => while (i < n) { out(i) = db.get().toDouble; i += 1 }       // NC_BYTE
      case 2 => while (i < n) { out(i) = (db.get() & 0xFF).toDouble; i += 1 } // NC_CHAR
      case 3 => while (i < n) { out(i) = db.getShort.toDouble; i += 1 }    // NC_SHORT
      case 4 => while (i < n) { out(i) = db.getInt.toDouble; i += 1 }      // NC_INT
      case 5 => while (i < n) { out(i) = db.getFloat.toDouble; i += 1 }    // NC_FLOAT
      case 6 => while (i < n) { out(i) = db.getDouble; i += 1 }            // NC_DOUBLE
      case t => throw new IllegalArgumentException(s"variable '${h.name}': nc_type $t unsupported")
    }
    NcVariable(h.name, h.dims, out)
  }

  private def headerFor(bytes: Array[Byte], name: String): VarHeader = {
    val all = headers(bytes)
    all.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"variable '$name' not found; file has ${all.map(_.name).mkString(", ")}"))
  }

  def readVariable(bytes: Array[Byte], name: String): NcVariable =
    decodeVar(bytes, headerFor(bytes, name))

  /** Header-only probe: one variable's dims without decoding any
    * payload — the fromStripes metadata pass. */
  def readDims(bytes: Array[Byte], name: String): Array[Long] =
    headerFor(bytes, name).dims

  /** Parse past an attribute list (names, types, padded values). */
  private def skipAttributes(buf: ByteBuffer): Unit = {
    val tag = buf.getInt; val n = buf.getInt
    if (tag == 0 && n == 0) return
    require(tag == NcAttribute, s"bad attribute list tag $tag")
    def padded(k: Int): Int = (k + 3) & ~3
    (0 until n).foreach { _ =>
      val nameLen = buf.getInt
      buf.position(buf.position() + padded(nameLen))
      val ncType = buf.getInt
      val nelems = buf.getInt
      val elem = ncType match {
        case 1 | 2 => 1; case 3 => 2; case 4 | 5 => 4; case 6 => 8
        case t => throw new IllegalArgumentException(s"attribute nc_type $t unsupported")
      }
      buf.position(buf.position() + padded(nelems * elem))
    }
  }
}
