package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal NPY (NumPy array file) reader/writer from the public
  * `numpy.lib.format` specification, version 1.0: the `\x93NUMPY` magic,
  * a little-endian u16 header length, a Python-dict-literal header
  * (`descr`/`fortran_order`/`shape`) padded to a 64-byte boundary, then
  * the raw buffer.
  *
  * This is the model-payload half of the reference's protocol surface
  * (`SS/wukong/protocol/torch.py`, `keras.py`, `numpy.py` — externally
  * serialized model artifacts arriving as DATA): weight tensors land as
  * small binary artifacts, get decoded once, and broadcast into scoring
  * passes. Framework checkpoint containers (torch zip, keras HDF5)
  * reduce to exactly these raw tensors; NPY is the public, stable
  * interchange form of that tensor payload. Subset: C-order, rank ≤ 2,
  * little-endian f8/f4/i8/i4/i2/i1 — anything else fails loudly.
  *
  * Scale stance: model artifacts are dimension-table-sized (KB–MB); one
  * executor decode per file (the binaryFile pattern), then a broadcast —
  * the artifact never rides a shuffle. */
object NpyLite {

  final case class NpyArray(dims: Array[Long], data: Array[Double])

  private val Magic: Array[Byte] =
    Array(0x93.toByte) ++ "NUMPY".getBytes(StandardCharsets.US_ASCII)

  /** EXECUTABLE out-of-scope stance for torch checkpoint containers
    * (reference handler: `SS/wukong/protocol/torch.py`): `torch.save`
    * output is a zip archive of Python pickles, and deserializing
    * untrusted pickle streams executes arbitrary code — a security
    * anti-pattern this engine refuses by design rather than by prose.
    * Both model-artifact readers sniff the zip local-file-header magic
    * (`PK\x03\x04` — torch's container, and what a user who points the
    * ingestion at a `.pt`/`.pth` file actually feeds us) and reject it
    * loudly, pointing at the supported safe interchange forms: raw NPY
    * tensors (ml19) and keras-layout HDF5 weight trees (ml20). */
  def rejectTorchArtifact(bytes: Array[Byte]): Unit =
    if (bytes.length >= 4 && bytes(0) == 'P'.toByte && bytes(1) == 'K'.toByte &&
        bytes(2) == 0x03.toByte && bytes(3) == 0x04.toByte)
      throw new IllegalArgumentException(
        "torch checkpoint container detected (zip-of-pickles, the torch.save " +
          "layout): unpickling untrusted model artifacts executes arbitrary " +
          "code and is out of scope by design — export the tensors as NPY " +
          "(NpyLite) or keras-layout HDF5 (Hdf5Lite) instead")

  // ---------------------------------------------------------------- write

  /** One C-order array as NPY v1.0 bytes; `<i8` when `asInt` else `<f8`. */
  def write(dims: Array[Long], data: Array[Double], asInt: Boolean): Array[Byte] = {
    require(dims.nonEmpty && dims.length <= 2, s"rank ${dims.length} unsupported")
    require(dims.product == data.length, "shape/data length mismatch")
    val descr = if (asInt) "<i8" else "<f8"
    val shape = if (dims.length == 1) s"(${dims(0)},)" else s"(${dims(0)}, ${dims(1)})"
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shape, }"
    // magic(6) + version(2) + hlen(2) + header padded so data starts at 64n
    val unpadded = 10 + dict.length + 1 // trailing '\n'
    val hlen = ((unpadded + 63) / 64) * 64 - 10
    val header = dict + (" " * (hlen - dict.length - 1)) + "\n"
    val buf = ByteBuffer.allocate(10 + hlen + data.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).put(1.toByte).put(0.toByte)
    buf.putShort(hlen.toShort)
    buf.put(header.getBytes(StandardCharsets.US_ASCII))
    if (asInt) data.foreach(v => buf.putLong(v.toLong)) else data.foreach(buf.putDouble)
    buf.array()
  }

  // ----------------------------------------------------------------- read

  def read(bytes: Array[Byte]): NpyArray = {
    rejectTorchArtifact(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](6); buf.get(magic)
    require(magic.sameElements(Magic), "not an NPY file (bad magic)")
    val major = buf.get(); buf.get()
    val hlen = major match {
      case 1 => buf.getShort & 0xFFFF
      case 2 | 3 => buf.getInt // v2/v3 widen the header length to u32
      case v => throw new IllegalArgumentException(s"NPY version $v unsupported")
    }
    val hb = new Array[Byte](hlen); buf.get(hb)
    val header = new String(hb, StandardCharsets.US_ASCII)
    def field(name: String): String = {
      val i = header.indexOf(s"'$name':")
      require(i >= 0, s"NPY header missing '$name': $header")
      header.substring(i + name.length + 3).dropWhile(c => c == ' ')
    }
    val descr = field("descr").dropWhile(_ == '\'').takeWhile(_ != '\'')
    val fortran = field("fortran_order").takeWhile(c => c != ',').trim
    require(fortran == "False", "fortran_order arrays unsupported (C-order only)")
    val shapeStr = field("shape")
    val dims = shapeStr.dropWhile(_ != '(').drop(1).takeWhile(_ != ')')
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    require(dims.nonEmpty && dims.length <= 2, s"rank ${dims.length} unsupported")
    require(descr.length == 3 && (descr(0) == '<' || descr(0) == '|'),
      s"descr '$descr' unsupported (little-endian only)")
    val n = dims.product.toInt
    val out = new Array[Double](n)
    var i = 0
    (descr(1), descr(2)) match {
      case ('f', '8') => while (i < n) { out(i) = buf.getDouble; i += 1 }
      case ('f', '4') => while (i < n) { out(i) = buf.getFloat.toDouble; i += 1 }
      case ('i', '8') => while (i < n) { out(i) = buf.getLong.toDouble; i += 1 }
      case ('i', '4') => while (i < n) { out(i) = buf.getInt.toDouble; i += 1 }
      case ('i', '2') => while (i < n) { out(i) = buf.getShort.toDouble; i += 1 }
      case ('i', '1') => while (i < n) { out(i) = buf.get().toDouble; i += 1 }
      case _ => throw new IllegalArgumentException(s"descr '$descr' unsupported")
    }
    NpyArray(dims, out)
  }
}
