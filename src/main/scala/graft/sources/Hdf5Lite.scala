package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal HDF5 reader/writer for the classic on-disk format, built from
  * the public HDF5 File Format Specification (superblock version 0, v1
  * object headers, symbol-table root group, contiguous data layout,
  * little-endian fixed-point and IEEE-float datatypes, rank ≤ 2).
  *
  * This is the ingestion half the reference ships as its h5py payload
  * handler (`SS/wukong/protocol/h5py.py` + tests under
  * `SS/wukong/protocol/tests/`): scientific-array users land data as
  * HDF5 shards, and the array surface must read them. The subset here is
  * exactly what libhdf5 emits for a small contiguous dataset written
  * with default settings — one symbol-table group, v1 object headers
  * (unknown messages are skipped, continuation blocks followed), v3
  * contiguous layout — so a genuine h5py-written file of that shape
  * parses, not just our own writer's output. Chunked datasets (v3
  * class-2 layout, the v1 raw-data-chunk B-tree index) with the
  * deflate / shuffle / fletcher32 filter pipeline — what h5py emits for
  * any `compression="gzip"` dataset — decode too; only filters outside
  * that set fail, with an explicit error rather than a wrong answer.
  *
  * Scale stance: one file = one decode call on one executor (the mm01
  * binaryFile pattern). Files are the parallelism unit; the decoder
  * never touches the driver, and header parsing is O(KB) regardless of
  * payload size.
  */
object Hdf5Lite {

  /** One decoded dataset: `dims` as stored (rank 1 or 2, row-major),
    * values widened to Double (exact for the int domains the gate uses:
    * |v| < 2^53). */
  final case class H5Dataset(name: String, dims: Array[Long], data: Array[Double])

  private val Signature = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF: the spec's undefined address

  // ---------------------------------------------------------------- write

  /** Write `datasets` (name → (dims, row-major doubles), stored as
    * int64 when `asInt` else float64) into one classic-format HDF5
    * byte image. Layout is assembled back-to-front address-wise:
    * superblock, root object header, local heap, B-tree, SNOD, then per
    * dataset an object header and its contiguous data block. */
  def write(datasets: Seq[(String, Array[Long], Array[Double])],
            asInt: Boolean): Array[Byte] = {
    require(datasets.nonEmpty && datasets.forall(_._2.length <= 2))
    // the single SNOD below has capacity 8 (snodSz); a 9th entry would
    // overwrite the dataset object headers and corrupt the file silently
    require(datasets.size <= 8, "single-SNOD writer supports at most 8 datasets")
    val sorted = datasets.sortBy(_._1) // SNOD entries must sort by name
    // --- local heap data: offset 0 is the reserved empty name slot
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    val heapData = new java.io.ByteArrayOutputStream()
    heapData.write(new Array[Byte](8))
    sorted.foreach { case (name, _, _) =>
      nameOffsets(name) = heapData.size().toLong
      val b = name.getBytes("UTF-8")
      heapData.write(b); heapData.write(0)
      while (heapData.size() % 8 != 0) heapData.write(0)
    }
    val heapBytes = heapData.toByteArray

    // --- address plan
    val superSz = 96L
    val rootOhSz = 16L + 8 + 16 // prefix + symtab message (16B data)
    val heapHdrSz = 32L
    val btreeSz = 24L + 9 * 8 + 8 * 8 // fixed node: 2k=8 children, 9 keys
    val snodSz = 8L + 8 * 40 // capacity 2*k_leaf = 8 entries
    val dsOhSz = sorted.map { case (_, dims, _) =>
      val spaceMsg = 8 + pad8(8 + 8 * dims.length)
      val typeMsg = 8 + (if (asInt) 16 else 24)
      val layoutMsg = 8 + 24
      16L + spaceMsg + typeMsg + layoutMsg
    }
    val rootOhAddr = superSz
    val heapHdrAddr = rootOhAddr + rootOhSz
    val heapDataAddr = heapHdrAddr + heapHdrSz
    val btreeAddr = heapDataAddr + heapBytes.length
    val snodAddr = btreeAddr + btreeSz
    var cursor = snodAddr + snodSz
    val ohAddrs = dsOhSz.map { sz => val a = cursor; cursor += sz; a }
    val dataAddrs = sorted.map { case (_, _, data) =>
      val a = cursor; cursor += data.length * 8L; a
    }
    val eof = cursor

    val buf = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    // --- superblock v0
    buf.put(Signature)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // sb/freespace/root-group versions + reserved
    buf.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // shared-header version, offset size, length size, reserved
    buf.putShort(4).putShort(16) // group leaf k, group internal k
    buf.putInt(0) // file consistency flags
    buf.putLong(0L).putLong(Undef).putLong(eof).putLong(Undef)
    // root symbol table entry: cached (type 1) btree + heap addresses
    buf.putLong(0L).putLong(rootOhAddr).putInt(1).putInt(0)
    buf.putLong(btreeAddr).putLong(heapHdrAddr)
    // --- root object header: one Symbol Table message
    buf.position(rootOhAddr.toInt)
    putOhPrefix(buf, nMsgs = 1, dataSize = 8 + 16)
    putMsgHeader(buf, 0x0011, 16)
    buf.putLong(btreeAddr).putLong(heapHdrAddr)
    // --- local heap header + data
    buf.position(heapHdrAddr.toInt)
    buf.put("HEAP".getBytes).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putLong(heapBytes.length.toLong).putLong(1L /* no free list */).putLong(heapDataAddr)
    buf.position(heapDataAddr.toInt); buf.put(heapBytes)
    // --- B-tree v1: one leaf-level node with a single SNOD child
    buf.position(btreeAddr.toInt)
    buf.put("TREE".getBytes).put(0.toByte).put(0.toByte).putShort(1)
    buf.putLong(Undef).putLong(Undef)
    buf.putLong(0L) // key 0: the empty name (sorts before everything)
    buf.putLong(snodAddr)
    buf.putLong(nameOffsets(sorted.last._1)) // key 1: greatest name in child
    // --- SNOD
    buf.position(snodAddr.toInt)
    buf.put("SNOD".getBytes).put(1.toByte).put(0.toByte).putShort(sorted.size.toShort)
    sorted.zipWithIndex.foreach { case ((name, _, _), k) =>
      buf.putLong(nameOffsets(name)).putLong(ohAddrs(k)).putInt(0).putInt(0)
      buf.putLong(0L).putLong(0L)
    }
    // --- dataset object headers + data
    sorted.zipWithIndex.foreach { case ((_, dims, data), k) =>
      buf.position(ohAddrs(k).toInt)
      val spaceData = 8 + 8 * dims.length
      putOhPrefix(buf, nMsgs = 3,
        dataSize = (8 + pad8(spaceData)) + (8 + (if (asInt) 16 else 24)) + (8 + 24))
      // dataspace v1
      putMsgHeader(buf, 0x0001, pad8(spaceData))
      buf.put(1.toByte).put(dims.length.toByte).put(0.toByte).put(0.toByte).putInt(0)
      dims.foreach(buf.putLong)
      padTo8(buf, spaceData)
      // datatype v1: class 0 fixed-point signed LE, or class 1 IEEE f64 LE
      if (asInt) {
        putMsgHeader(buf, 0x0003, 16)
        buf.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(8)
        buf.putShort(0).putShort(64)
        padTo8(buf, 12)
      } else {
        putMsgHeader(buf, 0x0003, 24)
        buf.put(0x11.toByte).put(0x20.toByte).put(0x3F.toByte).put(0.toByte).putInt(8)
        buf.putShort(0).putShort(64)
        buf.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
        padTo8(buf, 20)
      }
      // data layout v3 class 1 (contiguous)
      putMsgHeader(buf, 0x0008, 24)
      buf.put(3.toByte).put(1.toByte)
      buf.putLong(dataAddrs(k)).putLong(data.length * 8L)
      padTo8(buf, 18)
      // payload
      buf.position(dataAddrs(k).toInt)
      if (asInt) data.foreach(v => buf.putLong(v.toLong))
      else data.foreach(buf.putDouble)
    }
    buf.array()
  }

  private def pad8(n: Int): Int = (n + 7) & ~7
  private def padTo8(buf: ByteBuffer, written: Int): Unit =
    (written until pad8(written)).foreach(_ => buf.put(0.toByte))
  private def putOhPrefix(buf: ByteBuffer, nMsgs: Int, dataSize: Int): Unit = {
    buf.put(1.toByte).put(0.toByte).putShort(nMsgs.toShort)
    buf.putInt(1).putInt(dataSize).putInt(0)
  }
  private def putMsgHeader(buf: ByteBuffer, tpe: Int, size: Int): Unit = {
    buf.putShort(tpe.toShort).putShort(size.toShort)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
  }

  // ----------------------------------------------------------------- read

  /** Parse every dataset reachable from the root group. */
  def read(bytes: Array[Byte]): Seq[H5Dataset] =
    entries(bytes).map { case (name, ohAddr) => readDatasetAt(bytes, name, ohAddr) }

  /** Enumerate (name, object-header address) pairs reachable from the
    * root group — headers only, no payload touched. This is what lets
    * callers decode ONE dataset (or just its dims) without paying for
    * the others: the fromStripes metadata pass reads three longs per
    * multi-GB shard through [[readDims]], never the data. */
  private def entries(bytes: Array[Byte]): Seq[(String, Long)] = {
    NpyLite.rejectTorchArtifact(bytes)   // zip-of-pickles: loud refusal, see there
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sig = new Array[Byte](8); buf.get(sig)
    require(sig.sameElements(Signature), "not an HDF5 file (bad signature)")
    require(buf.get() == 0, "only superblock version 0 is supported")
    buf.position(13)
    require(buf.get() == 8 && buf.get() == 8, "only 8-byte offsets/lengths supported")
    // root symbol table entry sits at superblock offset 56 for v0/8/8
    buf.position(56)
    val rootLinkOff = buf.getLong; val rootOhAddr = buf.getLong
    val cacheType = buf.getInt; buf.getInt
    val (btreeAddr, heapAddr) =
      if (cacheType == 1) (buf.getLong, buf.getLong)
      else { // uncached root: find the symbol-table message in the header
        val msgs = readMessages(bytes, rootOhAddr)
        val st = msgs.find(_._1 == 0x0011)
          .getOrElse(throw new IllegalArgumentException("root group has no symbol table"))
        val b = ByteBuffer.wrap(st._2).order(ByteOrder.LITTLE_ENDIAN)
        (b.getLong, b.getLong)
      }
    val _ = rootLinkOff
    // local-heap name lookup, per GROUP (every group owns a heap)
    def heapNamer(heapHdrAddr: Long): Long => String = {
      val hb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      hb.position(heapHdrAddr.toInt)
      val heapSig = new Array[Byte](4); hb.get(heapSig)
      require(new String(heapSig) == "HEAP", "bad local heap signature")
      hb.position(heapHdrAddr.toInt + 8 + 16)
      val heapDataAddr = hb.getLong
      (off: Long) => {
        var p = (heapDataAddr + off).toInt; val sb = new StringBuilder
        while (bytes(p) != 0) { sb.append(bytes(p).toChar); p += 1 }
        sb.toString
      }
    }
    // walk a group B-tree to its SNOD leaves
    def snodAddrs(addr: Long): Seq[Long] = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      b.position(addr.toInt)
      val s = new Array[Byte](4); b.get(s)
      require(new String(s) == "TREE", "bad B-tree signature")
      require(b.get() == 0, "not a group B-tree")
      val level = b.get(); val used = b.getShort
      b.getLong; b.getLong // siblings
      val children = (0 until used).map { _ =>
        b.getLong // key i
        b.getLong // child i
      }
      if (level == 0) children
      else children.flatMap(snodAddrs)
    }
    // recurse through nested groups (keras-style model files nest layer
    // groups two deep): an entry is a sub-GROUP if its SNOD cache says so
    // (type 1 caches the child's btree+heap — what libhdf5 writes) or,
    // uncached, if its object header carries a symbol-table message.
    // Dataset names come back PATH-QUALIFIED ("model_weights/dense/kernel").
    def walkGroup(btAddr: Long, heapHdrAddr: Long, prefix: String, depth: Int): Seq[(String, Long)] = {
      require(depth <= 16, "group nesting deeper than 16 (cycle?)")
      val heapName = heapNamer(heapHdrAddr)
      snodAddrs(btAddr).flatMap { sa =>
        val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        b.position(sa.toInt)
        val s = new Array[Byte](4); b.get(s)
        require(new String(s) == "SNOD", "bad SNOD signature")
        b.get(); b.get()
        val n = b.getShort
        (0 until n).map { _ =>
          val nameOff = b.getLong; val ohAddr = b.getLong
          val cacheType = b.getInt; b.getInt
          val scratch0 = b.getLong; val scratch1 = b.getLong
          (heapName(nameOff), ohAddr, cacheType, scratch0, scratch1)
        }
      }.flatMap { case (name, ohAddr, cacheType, scratch0, scratch1) =>
        if (cacheType == 1) walkGroup(scratch0, scratch1, prefix + name + "/", depth + 1)
        else readMessages(bytes, ohAddr).find(_._1 == 0x0011) match {
          case Some((_, st)) =>
            val sb = ByteBuffer.wrap(st).order(ByteOrder.LITTLE_ENDIAN)
            walkGroup(sb.getLong, sb.getLong, prefix + name + "/", depth + 1)
          case None => Seq((prefix + name, ohAddr))
        }
      }
    }
    walkGroup(btreeAddr, heapAddr, "", 0)
  }

  private def entryFor(bytes: Array[Byte], name: String): (String, Long) = {
    val all = entries(bytes)
    all.find(_._1 == name).getOrElse(throw new IllegalArgumentException(
      s"dataset '$name' not found; file has ${all.map(_._1).mkString(", ")}"))
  }

  /** Read one dataset by name; throws with the available names if absent. */
  def readDataset(bytes: Array[Byte], name: String): H5Dataset = {
    val (_, ohAddr) = entryFor(bytes, name)
    readDatasetAt(bytes, name, ohAddr)
  }

  /** Header-only probe: one dataset's dims without touching its payload
    * (O(KB) however large the data block is). */
  def readDims(bytes: Array[Byte], name: String): Array[Long] = {
    val (_, ohAddr) = entryFor(bytes, name)
    val sp = ByteBuffer.wrap(oneMsg(readMessages(bytes, ohAddr), 0x0001, name, "dataspace"))
      .order(ByteOrder.LITTLE_ENDIAN)
    parseDims(sp)
  }

  /** All v1-object-header messages at `addr` as (type, data) pairs,
    * following continuation messages (0x0010) and skipping unknowns. */
  private def readMessages(bytes: Array[Byte], addr: Long): Seq[(Int, Array[Byte])] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(addr.toInt)
    require(b.get() == 1, "only v1 object headers supported")
    b.get()
    val total = b.getShort & 0xFFFF
    b.getInt // ref count
    val firstBlock = b.getInt // header data size of the first block
    b.getInt // prefix padding
    val out = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    var blocks = List((addr + 16, firstBlock.toLong))
    while (out.size < total && blocks.nonEmpty) {
      val (start, len) = blocks.head; blocks = blocks.tail
      b.position(start.toInt)
      val end = start + len
      while (out.size < total && b.position() + 8 <= end) {
        val tpe = b.getShort & 0xFFFF
        val sz = b.getShort & 0xFFFF
        b.get(); b.get(); b.get(); b.get()
        val data = new Array[Byte](sz); b.get(data)
        if (tpe == 0x0010) { // continuation: (offset, length)
          val cb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          blocks = blocks :+ ((cb.getLong, cb.getLong))
        }
        out += ((tpe, data))
      }
    }
    out.toSeq
  }

  private def oneMsg(msgs: Seq[(Int, Array[Byte])], t: Int,
                     name: String, what: String): Array[Byte] =
    msgs.find(_._1 == t).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"dataset '$name': no $what message"))

  /** Dims from a dataspace message body (v1 or v2). */
  private def parseDims(sp: ByteBuffer): Array[Long] = {
    val spVer = sp.get(); val rank = sp.get().toInt
    sp.get() // flags (max-dims presence — we only need the dims themselves)
    if (spVer == 1) { sp.get(); sp.getInt } else sp.get() // v1: 5 reserved; v2: type byte
    Array.fill(rank)(sp.getLong)
  }

  /** Decode `n` little-endian values of (class, size, signedness) off
    * `db` into doubles — shared by the contiguous and chunked paths. */
  private def readValues(db: ByteBuffer, cls: Int, elemSize: Int, signed: Boolean,
                         n: Int, name: String): Array[Double] = {
    val out = new Array[Double](n)
    var i = 0
    (cls, elemSize) match {
      case (0, 8) => while (i < n) { out(i) = db.getLong.toDouble; i += 1 }
      case (0, 4) => while (i < n) {
        val v = db.getInt; out(i) = (if (signed) v.toDouble else (v & 0xFFFFFFFFL).toDouble); i += 1 }
      case (0, 2) => while (i < n) {
        val v = db.getShort; out(i) = (if (signed) v.toDouble else (v & 0xFFFF).toDouble); i += 1 }
      case (0, 1) => while (i < n) {
        val v = db.get(); out(i) = (if (signed) v.toDouble else (v & 0xFF).toDouble); i += 1 }
      case (1, 8) => while (i < n) { out(i) = db.getDouble; i += 1 }
      case (1, 4) => while (i < n) { out(i) = db.getFloat.toDouble; i += 1 }
      case _ => throw new IllegalArgumentException(
        s"dataset '$name': datatype class $cls size $elemSize unsupported")
    }
    out
  }

  /** One filter pipeline step: (id, client values). */
  private def parsePipeline(body: Array[Byte]): Seq[(Int, Array[Int])] = {
    val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
    val ver = b.get()
    require(ver == 1, s"filter pipeline version $ver unsupported")
    val nf = b.get().toInt
    b.position(b.position() + 6) // reserved
    (0 until nf).map { _ =>
      val id = b.getShort & 0xFFFF
      val nameLen = b.getShort & 0xFFFF
      b.getShort // flags
      val nClient = b.getShort & 0xFFFF
      b.position(b.position() + pad8(nameLen))
      val cd = Array.fill(nClient)(b.getInt)
      if (nClient % 2 == 1) b.getInt // pad to 8
      (id, cd)
    }
  }

  /** Undo one stored chunk's filter pipeline (applied in reverse
    * declaration order, skipping filters masked out for this chunk):
    * fletcher32 (3) drops its trailing checksum, deflate (1) inflates,
    * shuffle (2) de-interleaves the byte planes. Anything else fails
    * loudly — better than silently mis-decoding. */
  private def defilter(raw: Array[Byte], pipeline: Seq[(Int, Array[Int])],
                       filterMask: Int, elemSize: Int, name: String): Array[Byte] = {
    var cur = raw
    pipeline.zipWithIndex.reverse.foreach { case ((id, _), k) =>
      if ((filterMask & (1 << k)) == 0) id match {
        case 1 => // deflate
          val inf = new java.util.zip.Inflater()
          inf.setInput(cur)
          val outStream = new java.io.ByteArrayOutputStream(cur.length * 4)
          val tmp = new Array[Byte](1 << 16)
          while (!inf.finished()) {
            val n = inf.inflate(tmp)
            if (n == 0 && inf.needsInput())
              throw new IllegalArgumentException(s"dataset '$name': truncated deflate chunk")
            outStream.write(tmp, 0, n)
          }
          inf.end()
          cur = outStream.toByteArray
        case 2 => // shuffle: stored as elemSize byte-planes; restore interleave
          val n = cur.length / elemSize
          val out = new Array[Byte](cur.length)
          var p = 0
          while (p < elemSize) {
            var i = 0
            while (i < n) { out(i * elemSize + p) = cur(p * n + i); i += 1 }
            p += 1
          }
          cur = out
        case 3 => // fletcher32: payload + 4-byte checksum (trusted, not re-verified)
          cur = java.util.Arrays.copyOf(cur, cur.length - 4)
        case other =>
          throw new IllegalArgumentException(
            s"dataset '$name': filter id $other unsupported (deflate/shuffle/fletcher32 only)")
      }
    }
    cur
  }

  /** Walk a v1 raw-data-chunk B-tree (node type 1) to its level-0
    * entries: (stored size, filter mask, chunk offsets, data address). */
  private def chunkEntries(bytes: Array[Byte], addr: Long,
                           nOffsets: Int): Seq[(Int, Int, Array[Long], Long)] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.position(addr.toInt)
    val s = new Array[Byte](4); b.get(s)
    require(new String(s) == "TREE", "bad chunk B-tree signature")
    require(b.get() == 1, "not a raw-data-chunk B-tree")
    val level = b.get(); val used = b.getShort
    b.getLong; b.getLong // siblings
    val entries = (0 until used).map { _ =>
      val sz = b.getInt; val mask = b.getInt
      val offs = Array.fill(nOffsets)(b.getLong)
      val child = b.getLong
      (sz, mask, offs, child)
    }
    if (level == 0) entries
    else entries.flatMap { case (_, _, _, child) => chunkEntries(bytes, child, nOffsets) }
  }

  private def readDatasetAt(bytes: Array[Byte], name: String, ohAddr: Long): H5Dataset = {
    val msgs = readMessages(bytes, ohAddr)
    def one(t: Int, what: String): Array[Byte] = oneMsg(msgs, t, name, what)
    // dataspace (v1 or v2)
    val dims = parseDims(
      ByteBuffer.wrap(one(0x0001, "dataspace")).order(ByteOrder.LITTLE_ENDIAN))
    val rank = dims.length
    require(rank >= 1 && rank <= 2, s"dataset '$name': rank $rank unsupported")
    // datatype: class 0 fixed-point or class 1 float, little-endian
    val dt = ByteBuffer.wrap(one(0x0003, "datatype")).order(ByteOrder.LITTLE_ENDIAN)
    val classAndVersion = dt.get(); val cls = classAndVersion & 0x0F
    val bf0 = dt.get(); dt.get(); dt.get()
    val elemSize = dt.getInt
    require((bf0 & 1) == 0, s"dataset '$name': big-endian data unsupported")
    val signed = (bf0 & 0x08) != 0
    // data layout v3: class 1 (contiguous) or class 2 (chunked)
    val dl = ByteBuffer.wrap(one(0x0008, "data layout")).order(ByteOrder.LITTLE_ENDIAN)
    val dlVer = dl.get(); val dlClass = dl.get()
    require(dlVer == 3 && (dlClass == 1 || dlClass == 2),
      s"dataset '$name': only v3 contiguous/chunked layout supported (got version $dlVer class $dlClass)")
    val n = dims.product.toInt
    if (dlClass == 1) {
      val dataAddr = dl.getLong
      val db = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      db.position(dataAddr.toInt)
      H5Dataset(name, dims, readValues(db, cls, elemSize, signed, n, name))
    } else {
      // chunked: dimensionality = rank+1 (trailing element-size dim)
      val dimensionality = dl.get().toInt
      require(dimensionality == rank + 1,
        s"dataset '$name': chunk dimensionality $dimensionality vs rank $rank")
      val btAddr = dl.getLong
      val chunkDims = Array.fill(dimensionality)(dl.getInt.toLong)
      require(chunkDims.last == elemSize, s"dataset '$name': chunk element size mismatch")
      val pipeline = msgs.find(_._1 == 0x000B).map(m => parsePipeline(m._2)).getOrElse(Seq.empty)
      val out = new Array[Double](n)
      val rowsTotal = dims(0)
      val colsTotal = if (rank == 2) dims(1) else 1L
      val cRows = chunkDims(0)
      val cCols = if (rank == 2) chunkDims(1) else 1L
      chunkEntries(bytes, btAddr, dimensionality).foreach { case (storedSz, mask, offs, addr) =>
        val raw = java.util.Arrays.copyOfRange(bytes, addr.toInt, addr.toInt + storedSz)
        val plain = defilter(raw, pipeline, mask, elemSize, name)
        require(plain.length >= (cRows * cCols * elemSize).toInt,
          s"dataset '$name': chunk at ${offs.mkString(",")} too short after filters")
        val vals = readValues(ByteBuffer.wrap(plain).order(ByteOrder.LITTLE_ENDIAN),
          cls, elemSize, signed, (cRows * cCols).toInt, name)
        // edge chunks are stored full-size; clip to the dataspace
        val oi = offs(0); val oj = if (rank == 2) offs(1) else 0L
        var a = 0L
        while (a < cRows && oi + a < rowsTotal) {
          var b2 = 0L
          while (b2 < cCols && oj + b2 < colsTotal) {
            out(((oi + a) * colsTotal + (oj + b2)).toInt) = vals((a * cCols + b2).toInt)
            b2 += 1
          }
          a += 1
        }
      }
      H5Dataset(name, dims, out)
    }
  }

  // --------------------------------------------------- write (chunked)

  /** Write one classic-format image where every rank-2 dataset is
    * CHUNKED (`chunk` = rows×cols tile) behind a shuffle+deflate filter
    * pipeline — the byte shape h5py emits for
    * `create_dataset(..., chunks=..., shuffle=True, compression="gzip")`.
    * Rank-1 datasets (the `row0` stripe offsets) stay contiguous. Edge
    * chunks are stored full-size and zero-padded, as libhdf5 does.
    * The chunk index is a v1 B-tree: a single leaf for ≤128 chunks,
    * else one internal node over ≤256 sibling-chained leaves (up to
    * 32,768 chunks — enough to exercise the reader's level>0 recursion,
    * which real libhdf5 files hit routinely). */
  def writeChunked(datasets: Seq[(String, Array[Long], Array[Double])],
                   asInt: Boolean, chunk: (Long, Long)): Array[Byte] = {
    require(datasets.nonEmpty && datasets.forall(_._2.length <= 2))
    require(datasets.size <= 8, "single-SNOD writer supports at most 8 datasets")
    require(chunk._1 > 0 && chunk._2 > 0)
    val sorted = datasets.sortBy(_._1)
    val nameOffsets = scala.collection.mutable.Map[String, Long]()
    val heapData = new java.io.ByteArrayOutputStream()
    heapData.write(new Array[Byte](8))
    sorted.foreach { case (name, _, _) =>
      nameOffsets(name) = heapData.size().toLong
      val b = name.getBytes("UTF-8")
      heapData.write(b); heapData.write(0)
      while (heapData.size() % 8 != 0) heapData.write(0)
    }
    val heapBytes = heapData.toByteArray

    // deflate every chunk of every rank-2 dataset up front (shuffle then
    // deflate — pipeline declaration order), so addresses can be planned
    final case class Ck(oi: Long, oj: Long, stored: Array[Byte])
    val chunked: Seq[Option[Seq[Ck]]] = sorted.map {
      case (_, dims, data) if dims.length == 2 =>
        val (cr, cc) = chunk
        val rows = dims(0); val cols = dims(1)
        val cks = for {
          oi <- 0L until rows by cr
          oj <- 0L until cols by cc
        } yield {
          val plain = new Array[Byte]((cr * cc * 8).toInt)
          val bb = ByteBuffer.wrap(plain).order(ByteOrder.LITTLE_ENDIAN)
          var a = 0L
          while (a < cr) {
            var b2 = 0L
            while (b2 < cc) {
              val v = if (oi + a < rows && oj + b2 < cols) data(((oi + a) * cols + oj + b2).toInt) else 0.0
              if (asInt) bb.putLong(v.toLong) else bb.putDouble(v)
              b2 += 1
            }
            a += 1
          }
          // shuffle filter: split into 8 byte-planes
          val n = plain.length / 8
          val shuf = new Array[Byte](plain.length)
          var p = 0
          while (p < 8) {
            var i = 0
            while (i < n) { shuf(p * n + i) = plain(i * 8 + p); i += 1 }
            p += 1
          }
          val defl = new java.util.zip.Deflater()
          defl.setInput(shuf); defl.finish()
          val outStream = new java.io.ByteArrayOutputStream(shuf.length / 2 + 64)
          val tmp = new Array[Byte](1 << 16)
          while (!defl.finished()) outStream.write(tmp, 0, defl.deflate(tmp))
          defl.end()
          Ck(oi, oj, outStream.toByteArray)
        }
        require(cks.size <= 128 * 256,
          s"two-level chunk B-tree supports ≤32768 chunks, got ${cks.size}")
        Some(cks)
      case _ => None
    }
    val LeafCap = 128

    // --- address plan (same skeleton as write, plus pipeline msg,
    // chunked layout msg, B-tree node and chunk payloads per dataset)
    // msg header 8 + (version/nfilters/reserved 8 + shuffle 16 + deflate 16)
    val pipelineMsgSz = 8 + 8 + 16 + 16
    val chunkKeySz = 8 + 8 * 3      // size+mask + (rank+1) offsets, rank 2
    val superSz = 96L
    val rootOhSz = 16L + 8 + 16
    val heapHdrSz = 32L
    val btreeSz = 24L + 9 * 8 + 8 * 8
    val snodSz = 8L + 8 * 40
    val dsOhSz = sorted.zip(chunked).map { case ((_, dims, _), ck) =>
      val spaceMsg = 8 + pad8(8 + 8 * dims.length)
      val typeMsg = 8 + (if (asInt) 16 else 24)
      val layoutMsg = if (ck.isDefined) 8 + pad8(2 + 1 + 8 + 4 * 3) else 8 + 24
      val pipeMsg = if (ck.isDefined) pipelineMsgSz else 0
      16L + spaceMsg + typeMsg + layoutMsg + pipeMsg
    }
    val rootOhAddr = superSz
    val heapHdrAddr = rootOhAddr + rootOhSz
    val heapDataAddr = heapHdrAddr + heapHdrSz
    val btreeAddr = heapDataAddr + heapBytes.length
    val snodAddr = btreeAddr + btreeSz
    var cursor = snodAddr + snodSz
    val ohAddrs = dsOhSz.map { sz => val a = cursor; cursor += sz; a }
    // per chunked dataset: the B-tree root (leaf, or internal over
    // ≤LeafCap-entry leaves) then its chunks; per contiguous dataset:
    // the raw data block
    val chunkBtAddrs = new Array[Long](sorted.size)
    val chunkLeafGroups = new Array[Seq[Seq[Ck]]](sorted.size)
    val chunkLeafAddrs = new Array[Seq[Long]](sorted.size)
    val chunkDataAddrs = new Array[Seq[Long]](sorted.size)
    val contigAddrs = new Array[Long](sorted.size)
    def nodeSz(entries: Int): Long = 24L + entries * (chunkKeySz + 8) + chunkKeySz
    sorted.indices.foreach { k =>
      chunked(k) match {
        case Some(cks) =>
          val leaves = cks.grouped(LeafCap).toSeq
          chunkLeafGroups(k) = leaves
          if (leaves.size == 1) {
            chunkBtAddrs(k) = cursor
            cursor += nodeSz(cks.size)
            chunkLeafAddrs(k) = Seq(chunkBtAddrs(k))
          } else {
            chunkBtAddrs(k) = cursor // internal (level 1) node
            cursor += nodeSz(leaves.size)
            chunkLeafAddrs(k) = leaves.map { lv =>
              val a = cursor; cursor += nodeSz(lv.size); a
            }
          }
          chunkDataAddrs(k) = cks.map { c => val a = cursor; cursor += c.stored.length; a }
        case None =>
          contigAddrs(k) = cursor
          cursor += sorted(k)._3.length * 8L
      }
    }
    val eof = cursor

    val buf = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Signature)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    buf.putShort(4).putShort(16)
    buf.putInt(0)
    buf.putLong(0L).putLong(Undef).putLong(eof).putLong(Undef)
    buf.putLong(0L).putLong(rootOhAddr).putInt(1).putInt(0)
    buf.putLong(btreeAddr).putLong(heapHdrAddr)
    buf.position(rootOhAddr.toInt)
    putOhPrefix(buf, nMsgs = 1, dataSize = 8 + 16)
    putMsgHeader(buf, 0x0011, 16)
    buf.putLong(btreeAddr).putLong(heapHdrAddr)
    buf.position(heapHdrAddr.toInt)
    buf.put("HEAP".getBytes).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.putLong(heapBytes.length.toLong).putLong(1L).putLong(heapDataAddr)
    buf.position(heapDataAddr.toInt); buf.put(heapBytes)
    buf.position(btreeAddr.toInt)
    buf.put("TREE".getBytes).put(0.toByte).put(0.toByte).putShort(1)
    buf.putLong(Undef).putLong(Undef)
    buf.putLong(0L)
    buf.putLong(snodAddr)
    buf.putLong(nameOffsets(sorted.last._1))
    buf.position(snodAddr.toInt)
    buf.put("SNOD".getBytes).put(1.toByte).put(0.toByte).putShort(sorted.size.toShort)
    sorted.zipWithIndex.foreach { case ((name, _, _), k) =>
      buf.putLong(nameOffsets(name)).putLong(ohAddrs(k)).putInt(0).putInt(0)
      buf.putLong(0L).putLong(0L)
    }
    sorted.zipWithIndex.foreach { case ((_, dims, data), k) =>
      buf.position(ohAddrs(k).toInt)
      val spaceData = 8 + 8 * dims.length
      val isChunked = chunked(k).isDefined
      val layoutBody = if (isChunked) pad8(2 + 1 + 8 + 4 * 3) else 24
      val nMsgs = if (isChunked) 4 else 3
      val pipeSz = if (isChunked) pipelineMsgSz else 0
      putOhPrefix(buf, nMsgs = nMsgs,
        dataSize = (8 + pad8(spaceData)) + (8 + (if (asInt) 16 else 24)) + (8 + layoutBody) + pipeSz)
      putMsgHeader(buf, 0x0001, pad8(spaceData))
      buf.put(1.toByte).put(dims.length.toByte).put(0.toByte).put(0.toByte).putInt(0)
      dims.foreach(buf.putLong)
      padTo8(buf, spaceData)
      if (asInt) {
        putMsgHeader(buf, 0x0003, 16)
        buf.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(8)
        buf.putShort(0).putShort(64)
        padTo8(buf, 12)
      } else {
        putMsgHeader(buf, 0x0003, 24)
        buf.put(0x11.toByte).put(0x20.toByte).put(0x3F.toByte).put(0.toByte).putInt(8)
        buf.putShort(0).putShort(64)
        buf.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
        padTo8(buf, 20)
      }
      if (!isChunked) {
        putMsgHeader(buf, 0x0008, 24)
        buf.put(3.toByte).put(1.toByte)
        buf.putLong(contigAddrs(k)).putLong(data.length * 8L)
        padTo8(buf, 18)
      } else {
        // filter pipeline v1: shuffle(2) then deflate(1), 1 client value each
        putMsgHeader(buf, 0x000B, 8 + 16 + 16)
        buf.put(1.toByte).put(2.toByte)
        buf.put(new Array[Byte](6))
        buf.putShort(2).putShort(0).putShort(0).putShort(1); buf.putInt(8); buf.putInt(0)
        buf.putShort(1).putShort(0).putShort(0).putShort(1); buf.putInt(6); buf.putInt(0)
        // layout v3 class 2
        putMsgHeader(buf, 0x0008, pad8(2 + 1 + 8 + 4 * 3))
        buf.put(3.toByte).put(2.toByte).put(3.toByte)
        buf.putLong(chunkBtAddrs(k))
        buf.putInt(chunk._1.toInt).putInt(chunk._2.toInt).putInt(8)
        padTo8(buf, 2 + 1 + 8 + 12)
        // chunk B-tree: leaf(s), plus an internal node when >LeafCap
        val cks = chunked(k).get
        val leaves = chunkLeafGroups(k)
        def putKey(c: Ck): Unit = {
          buf.putInt(c.stored.length).putInt(0)
          buf.putLong(c.oi).putLong(c.oj).putLong(0L)
        }
        def putEndKey(): Unit = {
          buf.putInt(0).putInt(0) // one past the last chunk
          buf.putLong(dims(0)).putLong(if (dims.length == 2) dims(1) else 0L).putLong(8L)
        }
        if (leaves.size > 1) {
          buf.position(chunkBtAddrs(k).toInt)
          buf.put("TREE".getBytes).put(1.toByte).put(1.toByte).putShort(leaves.size.toShort)
          buf.putLong(Undef).putLong(Undef)
          leaves.zipWithIndex.foreach { case (lv, i) =>
            putKey(lv.head); buf.putLong(chunkLeafAddrs(k)(i))
          }
          putEndKey()
        }
        var ci = 0
        leaves.zipWithIndex.foreach { case (lv, li) =>
          buf.position(chunkLeafAddrs(k)(li).toInt)
          buf.put("TREE".getBytes).put(1.toByte).put(0.toByte).putShort(lv.size.toShort)
          buf.putLong(if (li == 0) Undef else chunkLeafAddrs(k)(li - 1))
          buf.putLong(if (li == leaves.size - 1) Undef else chunkLeafAddrs(k)(li + 1))
          lv.foreach { c => putKey(c); buf.putLong(chunkDataAddrs(k)(ci)); ci += 1 }
          // final key: the next leaf's first chunk (spec), or past-the-end
          if (li == leaves.size - 1) putEndKey() else putKey(leaves(li + 1).head)
        }
        cks.zipWithIndex.foreach { case (c, i) =>
          buf.position(chunkDataAddrs(k)(i).toInt)
          buf.put(c.stored)
        }
      }
      if (!isChunked) {
        buf.position(contigAddrs(k).toInt)
        if (asInt) data.foreach(v => buf.putLong(v.toLong))
        else data.foreach(buf.putDouble)
      }
    }
    buf.array()
  }

  // ---------------------------------------------------- write (grouped)

  /** A node of a grouped file: dataset leaf or nested group. */
  sealed trait H5Node { def name: String }
  final case class H5Ds(name: String, dims: Array[Long], data: Array[Double]) extends H5Node
  final case class H5Group(name: String, children: Seq[H5Node]) extends H5Node

  /** Write a NESTED-GROUP classic-format image — the shape keras emits
    * for model/weight files (`model_weights/<layer>/<layer>/kernel:0`,
    * nested symbol-table groups two deep). Every group gets its own
    * local heap + group B-tree + SNOD; sub-group SNOD entries carry the
    * cache-type-1 scratch (child btree + heap addresses) exactly as
    * libhdf5 writes them. Datasets are contiguous, int64 or float64 —
    * the [[write]] shapes. ≤8 children per group (single SNOD). */
  def writeTree(rootChildren: Seq[H5Node], asInt: Boolean): Array[Byte] = {
    val grpOhSz = 16L + 8 + 16
    val heapHdrSz = 32L
    val btreeSz = 24L + 9 * 8 + 8 * 8
    val snodSz = 8L + 8 * 40
    final case class GInfo(key: String, children: Seq[H5Node],
                           heapBytes: Array[Byte], nameOff: Map[String, Long])
    val gInfos = scala.collection.mutable.LinkedHashMap[String, GInfo]()
    val dsList = scala.collection.mutable.ArrayBuffer[(String, H5Ds)]()
    def visit(path: String, cs: Seq[H5Node]): Unit = {
      require(cs.size <= 8, "single-SNOD writer supports at most 8 children per group")
      require(cs.map(_.name).distinct.size == cs.size, s"duplicate names in group '$path'")
      val sorted = cs.sortBy(_.name) // SNOD entries must sort by name
      val heapData = new java.io.ByteArrayOutputStream()
      heapData.write(new Array[Byte](8))
      val offs = Map.newBuilder[String, Long]
      sorted.foreach { c =>
        offs += c.name -> heapData.size().toLong
        heapData.write(c.name.getBytes("UTF-8")); heapData.write(0)
        while (heapData.size() % 8 != 0) heapData.write(0)
      }
      gInfos(path) = GInfo(path, sorted, heapData.toByteArray, offs.result())
      sorted.foreach {
        case g: H5Group => visit(s"$path/${g.name}", g.children)
        case d: H5Ds =>
          require(d.dims.nonEmpty && d.dims.length <= 2, s"dataset '${d.name}': rank ≤ 2 only")
          dsList += ((s"$path/${d.name}", d))
      }
    }
    visit("", rootChildren)

    // --- address plan: groups in pre-order, then dataset headers, then data
    var cursor = 96L
    val gAddr = scala.collection.mutable.Map[String, (Long, Long, Long, Long, Long)]()
    gInfos.values.foreach { g =>
      val oh = cursor; cursor += grpOhSz
      val hh = cursor; cursor += heapHdrSz
      val hd = cursor; cursor += g.heapBytes.length
      val bt = cursor; cursor += btreeSz
      val sn = cursor; cursor += snodSz
      gAddr(g.key) = (oh, hh, hd, bt, sn)
    }
    def dsOhSize(d: H5Ds): Long = {
      val spaceMsg = 8 + pad8(8 + 8 * d.dims.length)
      val typeMsg = 8 + (if (asInt) 16 else 24)
      16L + spaceMsg + typeMsg + (8 + 24)
    }
    val dsOh = scala.collection.mutable.Map[String, Long]()
    val dsData = scala.collection.mutable.Map[String, Long]()
    dsList.foreach { case (p, d) => dsOh(p) = cursor; cursor += dsOhSize(d) }
    dsList.foreach { case (p, d) => dsData(p) = cursor; cursor += d.data.length * 8L }
    val eof = cursor

    val buf = ByteBuffer.allocate(eof.toInt).order(ByteOrder.LITTLE_ENDIAN)
    // superblock v0 with the root group's btree/heap cached
    val (rootOh, rootHh, _, rootBt, _) = gAddr("")
    buf.put(Signature)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    buf.putShort(4).putShort(16)
    buf.putInt(0)
    buf.putLong(0L).putLong(Undef).putLong(eof).putLong(Undef)
    buf.putLong(0L).putLong(rootOh).putInt(1).putInt(0)
    buf.putLong(rootBt).putLong(rootHh)
    // groups
    gInfos.values.foreach { g =>
      val (oh, hh, hd, bt, sn) = gAddr(g.key)
      buf.position(oh.toInt)
      putOhPrefix(buf, nMsgs = 1, dataSize = 8 + 16)
      putMsgHeader(buf, 0x0011, 16)
      buf.putLong(bt).putLong(hh)
      buf.position(hh.toInt)
      buf.put("HEAP".getBytes).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      buf.putLong(g.heapBytes.length.toLong).putLong(1L).putLong(hd)
      buf.position(hd.toInt); buf.put(g.heapBytes)
      buf.position(bt.toInt)
      buf.put("TREE".getBytes).put(0.toByte).put(0.toByte)
        .putShort(if (g.children.isEmpty) 0 else 1)
      buf.putLong(Undef).putLong(Undef)
      if (g.children.nonEmpty) {
        buf.putLong(0L)
        buf.putLong(sn)
        buf.putLong(g.nameOff(g.children.last.name))
      }
      buf.position(sn.toInt)
      buf.put("SNOD".getBytes).put(1.toByte).put(0.toByte).putShort(g.children.size.toShort)
      g.children.foreach { c =>
        buf.putLong(g.nameOff(c.name))
        c match {
          case sub: H5Group =>
            val (subOh, subHh, _, subBt, _) = gAddr(s"${g.key}/${sub.name}")
            buf.putLong(subOh).putInt(1).putInt(0)
            buf.putLong(subBt).putLong(subHh) // cache-type-1 scratch
          case d: H5Ds =>
            buf.putLong(dsOh(s"${g.key}/${d.name}")).putInt(0).putInt(0)
            buf.putLong(0L).putLong(0L)
        }
      }
    }
    // dataset headers + payloads (the write() message shapes)
    dsList.foreach { case (p, d) =>
      buf.position(dsOh(p).toInt)
      val spaceData = 8 + 8 * d.dims.length
      putOhPrefix(buf, nMsgs = 3,
        dataSize = (8 + pad8(spaceData)) + (8 + (if (asInt) 16 else 24)) + (8 + 24))
      putMsgHeader(buf, 0x0001, pad8(spaceData))
      buf.put(1.toByte).put(d.dims.length.toByte).put(0.toByte).put(0.toByte).putInt(0)
      d.dims.foreach(buf.putLong)
      padTo8(buf, spaceData)
      if (asInt) {
        putMsgHeader(buf, 0x0003, 16)
        buf.put(0x10.toByte).put(0x08.toByte).put(0.toByte).put(0.toByte).putInt(8)
        buf.putShort(0).putShort(64)
        padTo8(buf, 12)
      } else {
        putMsgHeader(buf, 0x0003, 24)
        buf.put(0x11.toByte).put(0x20.toByte).put(0x3F.toByte).put(0.toByte).putInt(8)
        buf.putShort(0).putShort(64)
        buf.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte).putInt(1023)
        padTo8(buf, 20)
      }
      putMsgHeader(buf, 0x0008, 24)
      buf.put(3.toByte).put(1.toByte)
      buf.putLong(dsData(p)).putLong(d.data.length * 8L)
      padTo8(buf, 18)
      buf.position(dsData(p).toInt)
      if (asInt) d.data.foreach(v => buf.putLong(v.toLong))
      else d.data.foreach(buf.putDouble)
    }
    buf.array()
  }
}
