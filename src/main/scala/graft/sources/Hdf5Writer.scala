package graft.sources

/** Minimal HDF5 WRITER producing the same structural subset the
  * reference's pandas `out.hdf5` stores use and `Hdf5Reader` consumes:
  * superblock v0, old-style symbol-table groups (v1 b-tree + local heap
  * + SNOD), v1 object headers, contiguous little-endian float64 /
  * int64 / fixed-length-string datasets. Written from the public HDF5
  * file-format specification — no HDF5 library exists in this runtime.
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

  def write(root: Group): Array[Byte] = {
    val buf = new Buf
    buf.alloc(96) // superblock + root symbol table entry, filled last
    val rootAddr = writeNode(buf, root)
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

  private def writeNode(buf: Buf, node: Node): Long = node match {
    case g: Group => writeGroup(buf, g)
    case DoubleMatrix(r, c, v) =>
      require(v.length == r * c, "row-major values length mismatch")
      val data = buf.alloc(8 * v.length)
      v.zipWithIndex.foreach { case (d, i) =>
        buf.putU64(data + 8 * i, java.lang.Double.doubleToLongBits(d))
      }
      // datatype class 1 (float), v1; IEEE-754 LE double property block
      val dt = Array[Byte](0x11, 0x20, 0x3f, 0x00, 8, 0, 0, 0,
        0, 0, 64, 0, 52, 11, 0, 52, -1, 3, 0, 0)
      writeHeader(buf, Seq(
        0x0001 -> dataspace(Seq(r.toLong, c.toLong)),
        0x0003 -> dt,
        0x0008 -> layoutContiguous(data.toLong, 8L * v.length)))
    case DoubleVector(v) =>
      val data = buf.alloc(8 * v.length)
      v.zipWithIndex.foreach { case (d, i) =>
        buf.putU64(data + 8 * i, java.lang.Double.doubleToLongBits(d))
      }
      val dt = Array[Byte](0x11, 0x20, 0x3f, 0x00, 8, 0, 0, 0,
        0, 0, 64, 0, 52, 11, 0, 52, -1, 3, 0, 0)
      writeHeader(buf, Seq(
        0x0001 -> dataspace(Seq(v.length.toLong)),
        0x0003 -> dt,
        0x0008 -> layoutContiguous(data.toLong, 8L * v.length)))
    case LongVector(v) =>
      val data = buf.alloc(8 * v.length)
      v.zipWithIndex.foreach { case (l, i) => buf.putU64(data + 8 * i, l) }
      // datatype class 0 (fixed-point), v1, signed LE, 64-bit
      val dt = Array[Byte](0x10, 0x08, 0x00, 0x00, 8, 0, 0, 0,
        0, 0, 64, 0)
      writeHeader(buf, Seq(
        0x0001 -> dataspace(Seq(v.length.toLong)),
        0x0003 -> dt,
        0x0008 -> layoutContiguous(data.toLong, 8L * v.length)))
    case StringVector(v) =>
      val elem =
        (if (v.isEmpty) 0 else v.map(_.getBytes("UTF-8").length).max) + 1
      val data = buf.alloc(elem * v.length)
      v.zipWithIndex.foreach { case (s, i) =>
        buf.putBytes(data + elem * i, s.getBytes("UTF-8"))
      }
      // datatype class 3 (string), v1, null-terminated ASCII
      val dt = Array[Byte](0x13, 0x00, 0x00, 0x00) ++ {
        val sz = new Array[Byte](4)
        (0 until 4).foreach(i => sz(i) = (elem >> (8 * i)).toByte)
        sz
      }
      writeHeader(buf, Seq(
        0x0001 -> dataspace(Seq(v.length.toLong)),
        0x0003 -> dt,
        0x0008 -> layoutContiguous(data.toLong, elem.toLong * v.length)))
  }

  private def writeGroup(buf: Buf, g: Group): Long = {
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
    writeHeader(buf, Seq(0x0011 -> stMsg))
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
    val padded = msgs.map { case (t, d) =>
      (t, d ++ new Array[Byte]((8 - d.length % 8) % 8))
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
