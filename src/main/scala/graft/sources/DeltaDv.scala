package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.roaringbitmap.buffer.ImmutableRoaringBitmap

/** Deletion-vector support for [[DeltaRead]], implemented against the
  * PUBLIC Delta protocol spec (PROTOCOL.md § Deletion Vectors) with no
  * Delta jars: z85 path encoding, the versioned `.bin` sidecar layout
  * (`[version:1][size:int32 BE][data][crc32:int32 BE]` per vector), and
  * the portable 64-bit RoaringBitmapArray serialization
  * (`[magic:int32 LE][count:int64 LE][32-bit roaring bitmaps...]`), read
  * through the RoaringBitmap library Spark already ships.
  *
  * Why this matters: DBR 14+ writes deletion vectors BY DEFAULT on DML, so
  * any recently-updated table in the reference's own environment
  * (adls_bikeshare_project_IsmaelDawuda.ipynb:264) carries them — a reader
  * that refuses DVs hard-errors on the first table a real user points it
  * at. Scan shape: the bitmap bytes ride into the plan as expression
  * literals (DVs are small by design — compressed roaring, bounded by the
  * log's sizeInBytes) and rows are dropped by a scan-side filter on the
  * parquet row index (`_metadata.row_index`), so there is NO join and no
  * shuffle — the same per-file row-position semantics Delta's own reader
  * implements inside its scan.
  */
object DeltaDv {

  /** Descriptor carried by add/remove actions (protocol field names). */
  final case class Descriptor(
      storageType: String,
      pathOrInlineDv: String,
      offset: Option[Int],
      sizeInBytes: Int,
      cardinality: Long)

  // ---- z85 (ZeroMQ base85) — the protocol's DV path/inline encoding ----

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val z85Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length must be a multiple of 5: ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Inv(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte; out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte; out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, s"z85 input must be a multiple of 4 bytes: ${b.length}")
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val grp = new Array[Char](5)
      var j = 4
      while (j >= 0) { grp(j) = Z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.appendAll(grp)
      i += 4
    }
    sb.toString
  }

  /** z85 with zero padding to a 4-byte multiple (inline DV encoding —
    * the descriptor's sizeInBytes recovers the true length on decode).
    */
  def z85EncodePadded(b: Array[Byte]): String =
    z85Encode(if (b.length % 4 == 0) b
              else b ++ new Array[Byte](4 - b.length % 4))

  // ---- descriptor → bitmap bytes ----

  /** The `.bin` sidecar path for a `u`-typed descriptor: the LAST 20 z85
    * chars encode the 16-byte UUID, anything before them is the writer's
    * random prefix directory.
    */
  def dvPath(table: Path, d: Descriptor): Path = d.storageType match {
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"malformed u-type DV path: $enc")
      val prefix = enc.dropRight(20)
      val bytes = z85Decode(enc.takeRight(20))
      val bb = ByteBuffer.wrap(bytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new Path(table, name)
      else new Path(new Path(table, prefix), name)
    case "p" => new Path(d.pathOrInlineDv)
    case other => throw new IllegalArgumentException(
      s"DV storageType '$other' has no file path")
  }

  /** Load the serialized RoaringBitmapArray for a descriptor: inline data
    * is z85-decoded directly; file-backed data is read at `offset`
    * (default 1, right after the format-version byte) as
    * `[size:int32 BE][data][crc32:int32 BE]`, with size and checksum
    * verified — a truncated or corrupt sidecar must fail loudly, not drop
    * the wrong rows.
    */
  def loadBitmapBytes(fs: FileSystem, table: Path, d: Descriptor): Array[Byte] =
    d.storageType match {
      case "i" =>
        // inline data is zero-padded to a 4-byte multiple for z85; the
        // true length is the descriptor's sizeInBytes
        val data = z85Decode(d.pathOrInlineDv)
        require(data.length >= d.sizeInBytes &&
          data.length - d.sizeInBytes < 4,
          s"inline DV size ${data.length} inconsistent with " +
            s"descriptor sizeInBytes ${d.sizeInBytes}")
        data.take(d.sizeInBytes)
      case "u" | "p" =>
        val p = dvPath(table, d)
        val in = fs.open(p)
        try {
          val version = in.readByte()
          require(version == 1, s"unsupported DV file format version $version in $p")
          in.seek(d.offset.getOrElse(1).toLong)
          val size = in.readInt()
          require(size == d.sizeInBytes,
            s"DV at $p offset ${d.offset} has size $size, " +
              s"descriptor says ${d.sizeInBytes}")
          val data = new Array[Byte](size)
          in.readFully(data)
          val expectCrc = in.readInt()
          val crc = new CRC32
          crc.update(data)
          require(crc.getValue.toInt == expectCrc,
            s"DV checksum mismatch in $p at offset ${d.offset}")
          data
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType '$other'")
    }

  // ---- portable RoaringBitmapArray ----

  private val Magic = 1681511377

  /** Parse the portable RoaringBitmapArray: one 32-bit roaring bitmap per
    * high word; value v lives in bitmap (v >>> 32) at key (v & 0xFFFFFFFF).
    */
  def parseBitmapArray(data: Array[Byte]): Array[ImmutableRoaringBitmap] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"bad bitmap count $n")
    Array.fill(n.toInt) {
      val slice = bb.slice().order(ByteOrder.LITTLE_ENDIAN)
      val m = new ImmutableRoaringBitmap(slice)
      bb.position(bb.position() + m.serializedSizeInBytes())
      m
    }
  }

  def contains(maps: Array[ImmutableRoaringBitmap], rowIndex: Long): Boolean = {
    val high = (rowIndex >>> 32).toInt
    high < maps.length && maps(high).contains((rowIndex & 0xffffffffL).toInt)
  }

  /** Serialize row indices as a portable RoaringBitmapArray (the write
    * side of [[parseBitmapArray]] — used by tests and any future DV-writing
    * DML).
    */
  def serializeBitmapArray(rowIndices: Seq[Long]): Array[Byte] = {
    import org.roaringbitmap.RoaringBitmap
    require(rowIndices.forall(_ >= 0), "negative row index")
    val byHigh = rowIndices.groupBy(i => (i >>> 32).toInt)
    val nMaps = if (byHigh.isEmpty) 0 else byHigh.keys.max + 1
    val maps = (0 until nMaps).map { h =>
      val rb = new RoaringBitmap()
      byHigh.getOrElse(h, Nil).foreach(i => rb.add((i & 0xffffffffL).toInt))
      rb.runOptimize()
      rb
    }
    val size = 12 + maps.map(_.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(nMaps.toLong)
    maps.foreach(_.serialize(bb))
    bb.array()
  }

  /** Write a DV `.bin` sidecar holding one bitmap array; returns the
    * descriptor fields (offset is always 1 — single-DV file).
    */
  def writeDvFile(fs: FileSystem, table: Path, rowIndices: Seq[Long]): Descriptor = {
    val data = serializeBitmapArray(rowIndices)
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val out = fs.create(new Path(table, s"deletion_vector_$uuid.bin"), false)
    try {
      out.writeByte(1)
      out.writeInt(data.length)
      out.write(data)
      val crc = new CRC32
      crc.update(data)
      out.writeInt(crc.getValue.toInt)
    } finally out.close()
    Descriptor("u", z85Encode(bb.array()), Some(1), data.length,
      rowIndices.distinct.size.toLong)
  }

  // ---- the scan-side filter ----

  /** True iff (file, rowIndex) is marked deleted. `dvs` is keyed by the
    * URI path component of the data file's absolute path (scheme-form
    * differences between the log-derived path and `_metadata.file_path`
    * normalize away); bitmap bytes deserialize lazily once per executor
    * and file-path lookups memoize on the previous row's path, since rows
    * arrive file-clustered.
    */
  private[sources] final case class DvDeleted(
      left: Expression, right: Expression,
      dvs: Map[String, Array[Byte]])
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    override def prettyName: String = "dv_deleted"

    @transient private lazy val parsed =
      new java.util.concurrent.ConcurrentHashMap[String, Array[ImmutableRoaringBitmap]]()
    @transient private var lastPath: String = null
    @transient private var lastMaps: Array[ImmutableRoaringBitmap] = null

    private def mapsFor(path: String): Array[ImmutableRoaringBitmap] = {
      if (path eq lastPath) return lastMaps
      val key = try new java.net.URI(path).getPath catch {
        case _: java.net.URISyntaxException => path
      }
      val m = Option(key).flatMap(dvs.get) match {
        case Some(bytes) =>
          parsed.computeIfAbsent(key, _ => parseBitmapArray(bytes))
        case None => Array.empty[ImmutableRoaringBitmap]
      }
      lastPath = path
      lastMaps = m
      m
    }

    override def eval(input: InternalRow): Any = {
      val p = left.eval(input)
      if (p == null) false
      else {
        val maps = mapsFor(p.asInstanceOf[UTF8String].toString)
        if (maps.isEmpty) false
        else {
          val idx = right.eval(input)
          idx != null && contains(maps, idx.asInstanceOf[Long])
        }
      }
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): DvDeleted = copy(left = l, right = r)
  }

  /** Column wrapper: `deleted(file_path, row_index)` for the scan filter. */
  def deletedCol(filePath: Column, rowIndex: Column,
                 dvs: Map[String, Array[Byte]]): Column =
    ColumnShim.column(DvDeleted(
      ColumnShim.expression(filePath), ColumnShim.expression(rowIndex), dvs))
}
