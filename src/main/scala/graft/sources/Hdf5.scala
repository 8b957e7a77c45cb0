package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal clean-room HDF5 reader for the subset the reference's
  * `out.hdf5` stores use (S-5, `bin/concatenate.py:239-264`): pandas
  * `HDFStore` fixed-format files written by PyTables — superblock
  * version 0, old-style (symbol-table) groups, version-1 object headers,
  * and CONTIGUOUS little-endian datasets of float64 / int64 /
  * fixed-length strings. Implemented from the public HDF5 file-format
  * specification; no external HDF5 library exists in this runtime.
  *
  * Also reads CHUNKED datasets (layout v3 class 2) indexed by a v1
  * chunk B-tree, with an optional DEFLATE filter pipeline
  * (`java.util.zip.Inflater` — zero new dependencies): the layout
  * pandas writes for `complevel>0` stores and h5py writes for
  * `compression='gzip'`. Chunks are whole by definition (edge chunks
  * padded), each compressed independently; the reader walks the
  * B-tree, inflates each chunk, and scatters it into the dense array
  * by its offset key.
  *
  * Out of scope (raises with a clear message): non-deflate filters
  * (shuffle/fletcher32/szip), new-style groups, non-LE types.
  *
  * The whole file is held as one byte array: `out.hdf5` is per-dataset
  * (one imaging run), so it is bounded by a single dataset's
  * cells × channels matrix — the distributed axis is ACROSS files
  * (see `Hdf5Ingest`), never within one.
  */
final class Hdf5Reader(bytes: Array[Byte]) {

  private val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
  private def u16(p: Int): Int = buf.getShort(p) & 0xffff
  private def u32(p: Int): Long = buf.getInt(p) & 0xffffffffL
  private def u64(p: Int): Long = buf.getLong(p)
  private val Undef = -1L // 0xFFFFFFFFFFFFFFFF

  require(bytes.length > 96 &&
    (0 until 8).forall(i => bytes(i) == Hdf5Reader.Signature(i)),
    "not an HDF5 file (signature mismatch)")
  require(bytes(8) == 0, s"unsupported superblock version ${bytes(8)}")
  require(bytes(13) == 8 && bytes(14) == 8,
    "unsupported offset/length size (only 8 supported)")

  /** Root group's object header address (from the superblock's root
    * symbol table entry at offset 24+32 = byte 56: link name offset then
    * object header address). */
  private val rootHeaderAddr: Long = u64(56 + 8)

  // ---- object header (version 1) ----

  private case class Msg(msgType: Int, dataPos: Int, dataSize: Int)

  private def readMessages(headerAddr: Long): Seq[Msg] = {
    val p0 = headerAddr.toInt
    require(bytes(p0) == 1, s"unsupported object header version ${bytes(p0)}")
    val nMsgs = u16(p0 + 2)
    val out = scala.collection.mutable.ArrayBuffer.empty[Msg]
    // (blockPos, blockEnd) work list; the v1 prefix is 12 bytes + 4 pad
    var blocks = List((p0 + 16, p0 + 16 + u32(p0 + 8).toInt))
    while (blocks.nonEmpty && out.size < nMsgs) {
      var (p, end) = blocks.head
      blocks = blocks.tail
      while (p + 8 <= end && out.size < nMsgs) {
        val t = u16(p); val sz = u16(p + 2)
        if (t == 0x0010) { // continuation: offset(8) + length(8)
          blocks = (u64(p + 8).toInt, (u64(p + 8) + u64(p + 16)).toInt) ::
            blocks
        }
        out += Msg(t, p + 8, sz)
        p += 8 + sz
      }
    }
    out.toSeq
  }

  // ---- old-style (symbol table) groups ----

  /** Child name → object header address, or None if `headerAddr` is not
    * a group. */
  def groupChildren(headerAddr: Long): Option[Map[String, Long]] = {
    val stMsg = readMessages(headerAddr).find(_.msgType == 0x0011)
    stMsg.map { m =>
      val btreeAddr = u64(m.dataPos)
      val heapAddr = u64(m.dataPos + 8)
      val heapData = localHeapData(heapAddr)
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      walkBtree(btreeAddr, heapData, out)
      out.toMap
    }
  }

  private def localHeapData(heapAddr: Long): Long = {
    val p = heapAddr.toInt
    require(bytes(p) == 'H' && bytes(p + 1) == 'E' && bytes(p + 2) == 'A' &&
      bytes(p + 3) == 'P', "bad local heap signature")
    u64(p + 24) // data segment address
  }

  private def walkBtree(addr: Long, heapData: Long,
                        out: scala.collection.mutable.Map[String, Long])
      : Unit = {
    val p = addr.toInt
    require(bytes(p) == 'T' && bytes(p + 1) == 'R' && bytes(p + 2) == 'E' &&
      bytes(p + 3) == 'E', "bad b-tree signature")
    val level = bytes(p + 5) & 0xff
    val entries = u16(p + 6)
    // after signature(4) type(1) level(1) entries(2) left(8) right(8):
    // key0(8) child0(8) key1(8) child1(8) ...
    var cp = p + 24 + 8
    (0 until entries).foreach { _ =>
      val child = u64(cp)
      if (level > 0) walkBtree(child, heapData, out)
      else readSnod(child, heapData, out)
      cp += 16
    }
  }

  private def readSnod(addr: Long, heapData: Long,
                       out: scala.collection.mutable.Map[String, Long])
      : Unit = {
    val p = addr.toInt
    require(bytes(p) == 'S' && bytes(p + 1) == 'N' && bytes(p + 2) == 'O' &&
      bytes(p + 3) == 'D', "bad symbol node signature")
    val n = u16(p + 6)
    (0 until n).foreach { i =>
      val ep = p + 8 + i * 40 // symbol table entries are 40 bytes
      val nameOff = u64(ep)
      val headerAddr = u64(ep + 8)
      out(cString((heapData + nameOff).toInt)) = headerAddr
    }
  }

  private def cString(p: Int): String = {
    var e = p
    while (bytes(e) != 0) e += 1
    new String(bytes, p, e - p, "UTF-8")
  }

  /** Resolve a /-separated store key ("total/channel/.../reg1") to an
    * object header address, None if any component is missing. */
  def resolve(path: String): Option[Long] = {
    val parts = path.split("/").filter(_.nonEmpty)
    parts.foldLeft(Option(rootHeaderAddr)) { (acc, name) =>
      acc.flatMap(a => groupChildren(a).flatMap(_.get(name)))
    }
  }

  def exists(path: String): Boolean = resolve(path).isDefined

  // ---- attributes (v1 attribute messages, type 0x000C) ----

  /** Attributes on an object header: scalar strings → String, 1-D
    * fixed-length string arrays → Seq[String]. Other attribute shapes
    * (none are written by this engine) are skipped. */
  def readAttributes(headerAddr: Long): Map[String, Any] = {
    readMessages(headerAddr).filter(_.msgType == 0x000C).flatMap { m =>
      val p = m.dataPos
      if (bytes(p) != 1) None // only v1 attribute messages
      else {
        def pad8(n: Int): Int = (n + 7) / 8 * 8
        val nameSize = u16(p + 2)
        val dtSize = u16(p + 4)
        val dsSize = u16(p + 6)
        val namePos = p + 8
        val dtPos = namePos + pad8(nameSize)
        val dsPos = dtPos + pad8(dtSize)
        val dataPos = dsPos + pad8(dsSize)
        val name = cString(namePos)
        val dtClass = bytes(dtPos) & 0x0f
        val elemSize = u32(dtPos + 4).toInt
        val rank = bytes(dsPos + 1) & 0xff
        def str(at: Int): String = {
          var e = at
          while (e < at + elemSize && bytes(e) != 0) e += 1
          new String(bytes, at, e - at, "UTF-8")
        }
        if (dtClass != 3) None
        else if (rank == 0) Some(name -> str(dataPos))
        else if (rank == 1) {
          val n = u64(dsPos + 8).toInt
          Some(name -> (0 until n).map(i => str(dataPos + i * elemSize)))
        } else None
      }
    }.toMap
  }

  // ---- datasets ----

  private sealed trait Layout
  private case class Contiguous(dataOffset: Long) extends Layout
  private case class Chunked(btreeAddr: Long, chunkDims: Seq[Int],
                             deflate: Boolean) extends Layout

  /** (dims, dtypeClass, elemSize, layout) of a dataset — contiguous or
    * chunked (v3 layout message, classes 1 and 2). */
  private def datasetInfo(headerAddr: Long): (Seq[Long], Int, Int, Layout) = {
    val msgs = readMessages(headerAddr)
    val space = msgs.find(_.msgType == 0x0001)
      .getOrElse(sys.error("dataset has no dataspace message"))
    val rank = bytes(space.dataPos + 1) & 0xff
    // dataspace v1: version(1) rank(1) flags(1) reserved(5) then dims
    val dims = (0 until rank).map(i => u64(space.dataPos + 8 + 8 * i))
    val dt = msgs.find(_.msgType == 0x0003)
      .getOrElse(sys.error("dataset has no datatype message"))
    val dtClass = bytes(dt.dataPos) & 0x0f
    val elemSize = u32(dt.dataPos + 4).toInt
    val layout = msgs.find(_.msgType == 0x0008)
      .getOrElse(sys.error("dataset has no layout message"))
    require(bytes(layout.dataPos) == 3,
      s"unsupported layout version ${bytes(layout.dataPos)}")
    val layoutClass = bytes(layout.dataPos + 1) & 0xff
    val lay = layoutClass match {
      case 1 => Contiguous(u64(layout.dataPos + 2))
      case 2 =>
        // v3 chunked: dimensionality(1) = rank+1, btree address(8),
        // then dimensionality × u32 chunk dims — the LAST is the
        // dataset element size in bytes (the HDF5 convention)
        val ndims = bytes(layout.dataPos + 2) & 0xff
        require(ndims == rank + 1,
          s"chunk dimensionality $ndims != rank+1 ${rank + 1}")
        val btreeAddr = u64(layout.dataPos + 3)
        val cdims = (0 until ndims)
          .map(i => u32(layout.dataPos + 11 + 4 * i).toInt)
        require(cdims.last == elemSize,
          s"chunk element size ${cdims.last} != datatype size $elemSize")
        Chunked(btreeAddr, cdims.init, deflate = deflateFilter(msgs))
      case other => sys.error(
        "only CONTIGUOUS and CHUNKED dataset layouts are supported; " +
          s"got class $other")
    }
    (dims, dtClass, elemSize, lay)
  }

  /** True if the filter pipeline (message 0x000B, v1) is exactly one
    * DEFLATE filter; false if absent; raises on any other filter. */
  private def deflateFilter(msgs: Seq[Msg]): Boolean =
    msgs.find(_.msgType == 0x000B) match {
      case None => false
      case Some(m) =>
        require(bytes(m.dataPos) == 1,
          s"unsupported filter pipeline version ${bytes(m.dataPos)}")
        val nf = bytes(m.dataPos + 1) & 0xff
        // v1 per-filter: id(2) nameLen(2) flags(2) nvals(2)
        // name(pad8) vals(4×n, +4 pad if n odd)
        var p = m.dataPos + 8
        (0 until nf).foreach { _ =>
          val id = u16(p)
          require(id == 1,
            s"unsupported filter id $id (only DEFLATE=1 is supported)")
          val nameLen = u16(p + 2); val nvals = u16(p + 6)
          p += 8 + (nameLen + 7) / 8 * 8 + 4 * nvals +
            (if (nvals % 2 == 1) 4 else 0)
        }
        nf > 0
    }

  /** Dense row-major raw bytes of a dataset, whatever the layout:
    * contiguous data is sliced; chunked data is assembled by walking
    * the chunk B-tree, inflating each chunk (when the DEFLATE filter
    * is present), and scattering it by its offset key — edge chunks
    * are whole per the format, the scatter clips them to the dataset
    * bounds. */
  private def rawData(dims: Seq[Long], elemSize: Int, lay: Layout)
      : (Array[Byte], Int) = {
    val n = dims.product * elemSize
    require(n <= Int.MaxValue,
      s"dataset too large for one in-core file: $dims × $elemSize")
    lay match {
      case Contiguous(off) => (bytes, off.toInt)
      case Chunked(btreeAddr, chunkDims, deflate) =>
        val out = new Array[Byte](n.toInt)
        walkChunkBtree(btreeAddr, dims.map(_.toInt), chunkDims,
          elemSize, deflate, out)
        (out, 0)
    }
  }

  private def walkChunkBtree(addr: Long, dims: Seq[Int],
                             chunkDims: Seq[Int], elemSize: Int,
                             deflate: Boolean, out: Array[Byte]): Unit = {
    val p = addr.toInt
    require(bytes(p) == 'T' && bytes(p + 1) == 'R' && bytes(p + 2) == 'E' &&
      bytes(p + 3) == 'E', "bad chunk b-tree signature")
    require((bytes(p + 4) & 0xff) == 1,
      s"expected raw-data chunk b-tree (type 1), got ${bytes(p + 4)}")
    val level = bytes(p + 5) & 0xff
    val entries = u16(p + 6)
    // key: size(4) filterMask(4) offsets(8 × (rank+1)); interleaved
    // key0 child0 key1 child1 … (the trailing key is not consumed)
    val keySize = 8 + 8 * (dims.length + 1)
    var cp = p + 24
    (0 until entries).foreach { _ =>
      val chunkBytes = u32(cp).toInt
      val offs = (0 until dims.length).map(i => u64(cp + 8 + 8 * i).toInt)
      val child = u64(cp + keySize)
      if (level > 0)
        walkChunkBtree(child, dims, chunkDims, elemSize, deflate, out)
      else
        scatterChunk(child.toInt, chunkBytes, offs, dims, chunkDims,
          elemSize, deflate, out)
      cp += keySize + 8
    }
  }

  private def scatterChunk(at: Int, stored: Int, offs: Seq[Int],
                           dims: Seq[Int], chunkDims: Seq[Int],
                           elemSize: Int, deflate: Boolean,
                           out: Array[Byte]): Unit = {
    val full = chunkDims.product * elemSize
    val chunk =
      if (!deflate) {
        require(stored == full,
          s"unfiltered chunk stored $stored bytes, expected $full")
        java.util.Arrays.copyOfRange(bytes, at, at + stored)
      } else {
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes, at, stored)
        val buf = new Array[Byte](full)
        var got = 0
        while (got < full && !inf.finished()) {
          val n = inf.inflate(buf, got, full - got)
          // a truncated stored stream makes inflate() return 0 with
          // needsInput() set — raise instead of spinning forever
          require(n > 0 || !(inf.needsInput() || inf.needsDictionary()),
            s"chunk deflate stream truncated or malformed " +
              s"($got of $full bytes inflated from $stored stored)")
          got += n
        }
        inf.end()
        require(got == full,
          s"chunk inflated to $got bytes, expected $full")
        buf
      }
    // scatter row-major, clipping edge chunks to the dataset bounds
    dims.length match {
      case 1 =>
        val copy = math.min(chunkDims(0), dims(0) - offs(0)) * elemSize
        if (copy > 0)
          System.arraycopy(chunk, 0, out, offs(0) * elemSize, copy)
      case 2 =>
        val rows = math.min(chunkDims(0), dims(0) - offs(0))
        val cols = math.min(chunkDims(1), dims(1) - offs(1))
        (0 until rows).foreach { i =>
          System.arraycopy(chunk, i * chunkDims(1) * elemSize, out,
            ((offs(0) + i) * dims(1) + offs(1)) * elemSize,
            cols * elemSize)
        }
      case r => sys.error(s"unsupported chunked rank $r")
    }
  }

  /** 2-D float64 dataset → row-major Array of rows. */
  def readDoubleMatrix(headerAddr: Long): Array[Array[Double]] = {
    val (dims, cls, sz, lay) = datasetInfo(headerAddr)
    require(dims.length == 2 && cls == 1 && sz == 8,
      s"expected 2-D float64, got dims=$dims class=$cls size=$sz")
    val (arr, base) = rawData(dims, sz, lay)
    val bb = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
    val (r, c) = (dims(0).toInt, dims(1).toInt)
    Array.tabulate(r, c)((i, j) =>
      bb.getDouble(base + (i * c + j) * 8))
  }

  /** 1-D float64 dataset (h5mu COO weights, layer vectors). */
  def readDoubleVector(headerAddr: Long): Array[Double] = {
    val (dims, cls, sz, lay) = datasetInfo(headerAddr)
    require(dims.length == 1 && cls == 1 && sz == 8,
      s"expected 1-D float64, got dims=$dims class=$cls size=$sz")
    val (arr, base) = rawData(dims, sz, lay)
    val bb = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(dims(0).toInt)(i => bb.getDouble(base + i * 8))
  }

  /** 1-D int64 dataset (h5mu COO indices, integer uns scalars). */
  def readLongVector(headerAddr: Long): Array[Long] = {
    val (dims, cls, sz, lay) = datasetInfo(headerAddr)
    require(dims.length == 1 && cls == 0 && sz == 8,
      s"expected 1-D int64, got dims=$dims class=$cls size=$sz")
    val (arr, base) = rawData(dims, sz, lay)
    val bb = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
    Array.tabulate(dims(0).toInt)(i => bb.getLong(base + i * 8))
  }

  /** 1-D dataset of fixed-length strings (null-padded) or int64 — both
    * returned as strings, matching how the reference treats the pandas
    * index (`adata.obs.index` values become original_obs_id strings). */
  def readStringVector(headerAddr: Long): Seq[String] = {
    val (dims, cls, sz, lay) = datasetInfo(headerAddr)
    require(dims.length == 1, s"expected 1-D vector, got dims=$dims")
    val n = dims(0).toInt
    val (arr, base) = rawData(dims, sz, lay)
    cls match {
      case 3 => // fixed-length string
        (0 until n).map { i =>
          val p = base + i * sz
          var e = p
          while (e < p + sz && arr(e) != 0) e += 1
          new String(arr, p, e - p, "UTF-8")
        }
      case 0 => // fixed-point (int64 index)
        require(sz == 8, s"expected int64 index, got size $sz")
        val bb = ByteBuffer.wrap(arr).order(ByteOrder.LITTLE_ENDIAN)
        (0 until n).map(i => bb.getLong(base + i * 8).toString)
      case other => sys.error(s"unsupported vector datatype class $other")
    }
  }
}

object Hdf5Reader {
  val Signature: Array[Byte] =
    Array(0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
}
