package graft.sources

/** Minimal HDF5 WRITER producing the same structural subset the
  * reference's pandas `out.hdf5` stores use and `Hdf5Reader` consumes:
  * superblock v0, old-style symbol-table groups (v1 b-tree + local heap
  * + SNOD), v1 object headers, contiguous little-endian float64 /
  * int64 / fixed-length-string datasets, and v1 ATTRIBUTE messages
  * (scalar strings and 1-D string arrays — the anndata/mudata
  * `encoding-type`/`encoding-version`/`column-order` convention).
  * Written from the public HDF5 file-format specification — no HDF5
  * library exists in this runtime.
  *
  * Dataset payloads can be supplied eagerly (arrays) or as ITERATORS
  * (`*Stream` nodes): a stream node writes elements straight into the
  * output buffer as they are pulled, so the writer never holds a second
  * copy of a large matrix — the driver-memory bound of a sink like
  * `CodexProduct.writeH5mu` is the produced file itself, not
  * file + arrays + Rows.
  *
  * Serves two roles: test fixtures for the S-5 ingest path, and the
  * K-1 `.h5mu` last-mile sink (`CodexProduct.writeH5mu`,
  * `bin/concatenate.py:346,456`).
  */
object Hdf5Writer {

  sealed trait Node
  final case class Group(children: Seq[(String, Node)]) extends Node
  final case class DoubleMatrix(rows: Int, cols: Int,
                                values: Array[Double]) extends Node
  final case class StringVector(values: Seq[String]) extends Node
  final case class LongVector(values: Seq[Long]) extends Node
  final case class DoubleVector(values: Array[Double]) extends Node
  /** CHUNKED float64 matrix with a DEFLATE filter (layout v3 class 2 +
    * v1 chunk B-tree + filter pipeline message) — the layout pandas
    * `complevel>0` / h5py `compression='gzip'` stores use. Chunks are
    * row blocks of `chunkRows` full rows; the edge chunk is padded to
    * whole size per the format and each chunk deflates independently
    * (`java.util.zip.Deflater`, zero new dependencies). `level` 0 still
    * writes a valid deflate stream (stored blocks) — useful to test the
    * filter plumbing apart from compression. */
  final case class ChunkedDoubleMatrix(rows: Int, cols: Int,
      chunkRows: Int, values: Array[Double], level: Int = 6) extends Node
  /** Iterator-fed variants: `values()` must yield exactly rows×cols (or
    * n) elements; bytes are appended to the file buffer as pulled. */
  final case class DoubleMatrixStream(rows: Int, cols: Int,
      values: () => Iterator[Double]) extends Node
  final case class DoubleVectorStream(n: Int,
      values: () => Iterator[Double]) extends Node
  final case class LongVectorStream(n: Int,
      values: () => Iterator[Long]) extends Node

  /** HDF5 attributes on any node (v1 attribute messages in the object
    * header). Strings are fixed-length null-terminated — the same
    * structural subset the datasets use. */
  sealed trait Attr
  final case class StrAttr(v: String) extends Attr
  final case class StrArrayAttr(v: Seq[String]) extends Attr
  final case class Attributed(node: Node, attrs: Seq[(String, Attr)])
      extends Node

  /** Nested group chain ending in `leaf`: nest(Seq("a","b"), x) = /a/b=x */
  def nest(path: Seq[String], leaf: Node): Node =
    path.foldRight(leaf)((n, acc) => Group(Seq(n -> acc)))

  /** The pandas fixed-format leaf group for a single-block DataFrame. */
  def pandasLeaf(channels: Seq[String], obsIds: Seq[Long],
                 rowMajor: Array[Double]): Group =
    Group(Seq(
      "axis0" -> StringVector(channels),
      "axis1" -> LongVector(obsIds),
      "block0_items" -> StringVector(channels),
      "block0_values" -> DoubleMatrix(obsIds.size, channels.size,
        rowMajor)))

  private val Undef = -1L

  private final class Buf {
    private var arr = new Array[Byte](1 << 16)
    private var pos = 0
    def alloc(n: Int): Int = {
      while (pos + n > arr.length)
        arr = java.util.Arrays.copyOf(arr, arr.length * 2)
      val p = pos; pos += n; p
    }
    def put8(p: Int, v: Int): Unit = arr(p) = v.toByte
    def putU16(p: Int, v: Int): Unit = {
      arr(p) = v.toByte; arr(p + 1) = (v >> 8).toByte
    }
    def putU32(p: Int, v: Long): Unit =
      (0 until 4).foreach(i => arr(p + i) = (v >> (8 * i)).toByte)
    def putU64(p: Int, v: Long): Unit =
      (0 until 8).foreach(i => arr(p + i) = (v >> (8 * i)).toByte)
    def putBytes(p: Int, bs: Array[Byte]): Unit =
      System.arraycopy(bs, 0, arr, p, bs.length)
    def size: Int = pos
    def result: Array[Byte] = java.util.Arrays.copyOf(arr, pos)
  }

  def write(root: Group): Array[Byte] = writeAttributed(root, Nil)

  /** Root group with attributes (the mudata root carries
    * encoding-type/encoding-version). */
  def writeAttributed(root: Group,
                      rootAttrs: Seq[(String, Attr)]): Array[Byte] = {
    val buf = new Buf
    buf.alloc(96) // superblock + root symbol table entry, filled last
    val rootAddr = writeNode(buf,
      if (rootAttrs.isEmpty) root else Attributed(root, rootAttrs))
    // superblock v0
    buf.putBytes(0, Hdf5Reader.Signature)
    // versions all 0; offset/length sizes 8; leaf/internal k; flags 0
    buf.put8(13, 8); buf.put8(14, 8)
    buf.putU16(16, 4); buf.putU16(18, 16)
    buf.putU64(24, 0L)          // base address
    buf.putU64(32, Undef)       // free-space address
    buf.putU64(40, buf.size.toLong) // end of file
    buf.putU64(48, Undef)       // driver info
    buf.putU64(56, 0L)          // root entry: link name offset
    buf.putU64(64, rootAddr)    // root entry: object header address
    buf.result
  }

  // IEEE-754 LE double (class 1) and signed LE int64 (class 0) datatype
  // message bodies, shared by datasets and attributes
  private val dtDouble = Array[Byte](0x11, 0x20, 0x3f, 0x00, 8, 0, 0, 0,
    0, 0, 64, 0, 52, 11, 0, 52, -1, 3, 0, 0)
  private val dtLong = Array[Byte](0x10, 0x08, 0x00, 0x00, 8, 0, 0, 0,
    0, 0, 64, 0)
  // datatype class 3 (string), v1, null-terminated ASCII, `elem` bytes
  private def dtString(elem: Int): Array[Byte] =
    Array[Byte](0x13, 0x00, 0x00, 0x00) ++ {
      val sz = new Array[Byte](4)
      (0 until 4).foreach(i => sz(i) = (elem >> (8 * i)).toByte)
      sz
    }

  private def writeNode(buf: Buf, node: Node): Long = {
    val (inner, attrs) = node match {
      case Attributed(n, as) => (n, as)
      case n => (n, Nil)
    }
    val msgs = inner match {
      case g: Group => groupMessages(buf, g)
      case DoubleMatrix(r, c, v) =>
        require(v.length == r * c, "row-major values length mismatch")
        doubleDataset(buf, Seq(r.toLong, c.toLong), v.iterator)
      case DoubleMatrixStream(r, c, it) =>
        doubleDataset(buf, Seq(r.toLong, c.toLong), it())
      case ChunkedDoubleMatrix(r, c, cr, v, level) =>
        chunkedDoubleDataset(buf, r, c, cr, v, level)
      case DoubleVector(v) =>
        doubleDataset(buf, Seq(v.length.toLong), v.iterator)
      case DoubleVectorStream(n, it) =>
        doubleDataset(buf, Seq(n.toLong), it())
      case LongVector(v) =>
        longDataset(buf, v.length, v.iterator)
      case LongVectorStream(n, it) =>
        longDataset(buf, n, it())
      case StringVector(v) =>
        val elem =
          (if (v.isEmpty) 0 else v.map(_.getBytes("UTF-8").length).max) + 1
        val data = buf.alloc(elem * v.length)
        v.zipWithIndex.foreach { case (s, i) =>
          buf.putBytes(data + elem * i, s.getBytes("UTF-8"))
        }
        Seq(
          0x0001 -> dataspace(Seq(v.length.toLong)),
          0x0003 -> dtString(elem),
          0x0008 -> layoutContiguous(data.toLong, elem.toLong * v.length))
      case a: Attributed =>
        sys.error(s"nested Attributed is not supported: $a")
    }
    writeHeader(buf, msgs ++ attrs.map { case (n, a) =>
      0x000C -> attrMessage(n, a) })
  }

  /** Contiguous float64 dataset appended element-by-element from the
    * iterator — the chunked-append path: no caller-side array. */
  private def doubleDataset(buf: Buf, dims: Seq[Long],
                            it: Iterator[Double])
      : Seq[(Int, Array[Byte])] = {
    val n = dims.product
    require(n <= Int.MaxValue / 8, s"dataset too large for one file: $dims")
    val data = buf.alloc(8 * n.toInt)
    var i = 0
    while (it.hasNext) {
      buf.putU64(data + 8 * i,
        java.lang.Double.doubleToLongBits(it.next())); i += 1
    }
    require(i == n, s"iterator yielded $i values for dims $dims")
    Seq(0x0001 -> dataspace(dims), 0x0003 -> dtDouble,
      0x0008 -> layoutContiguous(data.toLong, 8L * n))
  }

  /** Chunked float64 dataset: row-block chunks deflated independently,
    * indexed by a single-leaf v1 chunk B-tree (type 1). Message set:
    * dataspace + datatype + DEFLATE filter pipeline + v3 class-2
    * layout. */
  private def chunkedDoubleDataset(buf: Buf, rows: Int, cols: Int,
                                   chunkRows: Int, v: Array[Double],
                                   level: Int): Seq[(Int, Array[Byte])] = {
    require(v.length == rows * cols, "row-major values length mismatch")
    require(chunkRows > 0 && chunkRows <= rows,
      s"chunkRows $chunkRows out of (0, $rows]")
    require(level >= 0 && level <= 9, s"deflate level $level out of [0,9]")
    val nChunks = (rows + chunkRows - 1) / chunkRows
    // the single-leaf B-tree stores its entry count in a u16 — more
    // chunks than that must fail loudly, never wrap mod 65536 into a
    // file whose tail chunks silently read back as zeros
    require(nChunks <= 0xFFFF,
      s"$nChunks chunks exceed the v1 B-tree u16 entry count — " +
        "raise chunkRows")
    val full = chunkRows * cols * 8
    // compress + append each chunk; record (offsetRow, addr, storedSize)
    val chunks = (0 until nChunks).map { ci =>
      val r0 = ci * chunkRows
      val raw = new Array[Byte](full) // edge chunk zero-padded to whole
      (0 until math.min(chunkRows, rows - r0)).foreach { i =>
        (0 until cols).foreach { j =>
          val bits = java.lang.Double.doubleToLongBits(v((r0 + i) * cols + j))
          (0 until 8).foreach { b =>
            raw((i * cols + j) * 8 + b) = (bits >> (8 * b)).toByte
          }
        }
      }
      val d = new java.util.zip.Deflater(level)
      d.setInput(raw); d.finish()
      // drain through a growable sink: a fixed full+margin buffer
      // under-sizes zlib's worst case (~full + 5 bytes per 64 KB
      // block) and the deflate loop would spin forever at capacity
      val sink = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(tmp)
        sink.write(tmp, 0, n)
      }
      d.end()
      val out = sink.toByteArray
      val at = buf.alloc(out.length)
      buf.putBytes(at, out)
      (r0, at.toLong, out.length)
    }
    // single-leaf chunk B-tree: key = size(4) filterMask(4)
    // offsets(8 × rank+1), interleaved key0 child0 … childN keyN+1
    val keySize = 8 + 8 * 3
    val btree = buf.alloc(24 + keySize * (nChunks + 1) + 8 * nChunks)
    buf.putBytes(btree, "TREE".getBytes("US-ASCII"))
    buf.put8(btree + 4, 1) // node type: raw data chunks
    buf.put8(btree + 5, 0) // level
    buf.putU16(btree + 6, nChunks)
    buf.putU64(btree + 8, Undef)
    buf.putU64(btree + 16, Undef)
    var kp = btree + 24
    chunks.foreach { case (r0, addr, sz) =>
      buf.putU32(kp, sz.toLong); buf.putU32(kp + 4, 0L) // filter mask
      buf.putU64(kp + 8, r0.toLong); buf.putU64(kp + 16, 0L)
      buf.putU64(kp + 24, 0L)
      buf.putU64(kp + keySize, addr)
      kp += keySize + 8
    }
    // trailing key: the one-past-the-end chunk offset
    buf.putU32(kp, 0L); buf.putU32(kp + 4, 0L)
    buf.putU64(kp + 8, (nChunks.toLong * chunkRows))
    buf.putU64(kp + 16, 0L); buf.putU64(kp + 24, 8L)
    // filter pipeline v1: one DEFLATE filter, 1 client value (level);
    // odd value count pads 4 bytes
    val filt = new Array[Byte](8 + 8 + 4 + 4)
    filt(0) = 1; filt(1) = 1
    filt(8) = 1 // filter id 1 = deflate (u16 LE)
    filt(14) = 1 // number of client data values (u16 LE)
    filt(16) = level.toByte
    // layout v3 class 2: dimensionality(rank+1), btree addr, chunk
    // dims (u32 × 3, last = element size)
    val lay = new Array[Byte](3 + 8 + 4 * 3)
    lay(0) = 3; lay(1) = 2; lay(2) = 3
    (0 until 8).foreach(i => lay(3 + i) = (btree.toLong >> (8 * i)).toByte)
    (0 until 4).foreach { i =>
      lay(11 + i) = (chunkRows >> (8 * i)).toByte
      lay(15 + i) = (cols >> (8 * i)).toByte
      lay(19 + i) = (8 >> (8 * i)).toByte
    }
    Seq(0x0001 -> dataspace(Seq(rows.toLong, cols.toLong)),
      0x0003 -> dtDouble, 0x000B -> filt, 0x0008 -> lay)
  }

  private def longDataset(buf: Buf, n: Int, it: Iterator[Long])
      : Seq[(Int, Array[Byte])] = {
    val data = buf.alloc(8 * n)
    var i = 0
    while (it.hasNext) { buf.putU64(data + 8 * i, it.next()); i += 1 }
    require(i == n, s"iterator yielded $i values for length $n")
    Seq(0x0001 -> dataspace(Seq(n.toLong)), 0x0003 -> dtLong,
      0x0008 -> layoutContiguous(data.toLong, 8L * n))
  }

  private def groupMessages(buf: Buf, g: Group): Seq[(Int, Array[Byte])] = {
    val children = g.children.map { case (n, c) => (n, writeNode(buf, c)) }
      .sortBy(_._1)
    // local heap: names null-terminated, first at data offset 8
    val nameBytes = children.map(_._1.getBytes("UTF-8"))
    val heapDataSize = 8 + nameBytes.map(_.length + 1).sum
    val heapData = buf.alloc((heapDataSize + 7) / 8 * 8)
    var off = 8
    val nameOffsets = nameBytes.map { nb =>
      buf.putBytes(heapData + off, nb); val o = off; off += nb.length + 1; o
    }
    val heap = buf.alloc(32)
    buf.putBytes(heap, "HEAP".getBytes("US-ASCII"))
    buf.putU64(heap + 8, heapDataSize.toLong)
    buf.putU64(heap + 16, Undef) // free list
    buf.putU64(heap + 24, heapData.toLong)
    // SNOD with every child entry (40 bytes each), name-sorted
    val snod = buf.alloc(8 + 40 * children.size)
    buf.putBytes(snod, "SNOD".getBytes("US-ASCII"))
    buf.put8(snod + 4, 1)
    buf.putU16(snod + 6, children.size)
    children.zipWithIndex.foreach { case ((_, addr), i) =>
      val ep = snod + 8 + 40 * i
      buf.putU64(ep, nameOffsets(i).toLong)
      buf.putU64(ep + 8, addr)
    }
    // b-tree v1: single leaf node pointing at the SNOD
    val btree = buf.alloc(24 + 8 * 3)
    buf.putBytes(btree, "TREE".getBytes("US-ASCII"))
    buf.put8(btree + 4, 0) // node type: group
    buf.put8(btree + 5, 0) // level
    buf.putU16(btree + 6, 1)
    buf.putU64(btree + 8, Undef)  // left sibling
    buf.putU64(btree + 16, Undef) // right sibling
    buf.putU64(btree + 24, 0L)           // key0
    buf.putU64(btree + 32, snod.toLong)  // child0
    buf.putU64(btree + 40, 0L)           // key1
    val stMsg = new Array[Byte](16)
    (0 until 8).foreach { i =>
      stMsg(i) = (btree.toLong >> (8 * i)).toByte
      stMsg(8 + i) = (heap.toLong >> (8 * i)).toByte
    }
    Seq(0x0011 -> stMsg)
  }

  private def pad8(a: Array[Byte]): Array[Byte] =
    a ++ new Array[Byte]((8 - a.length % 8) % 8)

  /** v1 attribute message: name + datatype + dataspace (each padded to
    * 8) + raw data. Scalar string → rank-0 dataspace; string array →
    * rank-1 over fixed-length elements. */
  private def attrMessage(name: String, a: Attr): Array[Byte] = {
    val nameB = name.getBytes("UTF-8") :+ 0.toByte
    val (dt, ds, data) = a match {
      case StrAttr(v) =>
        val vb = v.getBytes("UTF-8") :+ 0.toByte
        (dtString(vb.length), dataspace(Seq.empty), vb)
      case StrArrayAttr(vs) =>
        val elem =
          (if (vs.isEmpty) 0 else vs.map(_.getBytes("UTF-8").length).max) + 1
        val arr = new Array[Byte](elem * vs.size)
        vs.zipWithIndex.foreach { case (s, i) =>
          val b = s.getBytes("UTF-8")
          System.arraycopy(b, 0, arr, elem * i, b.length)
        }
        (dtString(elem), dataspace(Seq(vs.size.toLong)), arr)
    }
    val head = new Array[Byte](8)
    head(0) = 1 // version 1
    head(2) = (nameB.length & 0xff).toByte
    head(3) = ((nameB.length >> 8) & 0xff).toByte
    head(4) = (dt.length & 0xff).toByte
    head(5) = ((dt.length >> 8) & 0xff).toByte
    head(6) = (ds.length & 0xff).toByte
    head(7) = ((ds.length >> 8) & 0xff).toByte
    head ++ pad8(nameB) ++ pad8(dt) ++ pad8(ds) ++ data
  }

  private def dataspace(dims: Seq[Long]): Array[Byte] = {
    val out = new Array[Byte](8 + 8 * dims.size)
    out(0) = 1; out(1) = dims.size.toByte
    dims.zipWithIndex.foreach { case (d, i) =>
      (0 until 8).foreach(b => out(8 + 8 * i + b) = (d >> (8 * b)).toByte)
    }
    out
  }

  private def layoutContiguous(addr: Long, size: Long): Array[Byte] = {
    val out = new Array[Byte](2 + 16)
    out(0) = 3; out(1) = 1
    (0 until 8).foreach { i =>
      out(2 + i) = (addr >> (8 * i)).toByte
      out(10 + i) = (size >> (8 * i)).toByte
    }
    out
  }

  private def writeHeader(buf: Buf, msgs: Seq[(Int, Array[Byte])]): Long = {
    val padded = msgs.map { case (t, d) => (t, pad8(d)) }
    // v1 header message sizes are u16 — an oversized message (e.g. a
    // >64 KB attribute payload, which unlike dataset data lives INSIDE
    // the header) must fail loudly, never truncate mod 65536 into a
    // silently corrupt file
    padded.foreach { case (t, d) =>
      require(d.length <= 0xFFFF,
        f"header message type 0x$t%04x is ${d.length} bytes — exceeds " +
          "the v1 u16 size field (attributes this large are not " +
          "representable; move the payload to a dataset)")
    }
    val bodySize = padded.map(8 + _._2.length).sum
    val p = buf.alloc(16 + bodySize)
    buf.put8(p, 1) // object header version 1
    buf.putU16(p + 2, padded.size)
    buf.putU32(p + 4, 1L) // reference count
    buf.putU32(p + 8, bodySize.toLong)
    var q = p + 16
    padded.foreach { case (t, d) =>
      buf.putU16(q, t)
      buf.putU16(q + 2, d.length)
      buf.putBytes(q + 8, d)
      q += 8 + d.length
    }
    p.toLong
  }
}
