package graft.lake

import org.apache.hadoop.fs.{Path => HPath}

/** Delta Lake deletion-vector support built from the PUBLIC formats
  * alone — no Delta or RoaringBitmap jar:
  *
  *  - [[Roaring64]]: the portable "RoaringBitmapArray" serialization
  *    Delta stores DVs in — a 4-byte LE magic (1681511377) + 8-byte LE
  *    bitmap count, then per 32-bit bitmap a 4-byte LE high key and
  *    the official roaring portable stream (little-endian cookie /
  *    descriptive headers / offset headers / array-bitmap-run
  *    containers, per the published RoaringFormatSpec). The decoder
  *    accepts all three container kinds; the encoder emits the
  *    no-run-container form (cookie 12346, array or bitmap per
  *    container) — always spec-valid, simplest to verify.
  *  - [[DeltaDv]]: the on-disk DV file layout (1-byte version, then
  *    per DV a 4-byte BIG-endian length, the bitmap bytes, a 4-byte
  *    big-endian CRC-32 of them) and the `pathOrInlineDv` forms —
  *    `i` inline z85, `u` z85-uuid-derived file name, `p` absolute
  *    path. z85 is ZeroMQ's Base85 alphabet, 4 bytes → 5 chars.
  */
object Roaring64 {
  val Magic: Int = 1681511377
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347
  private val NoOffsetThreshold = 4

  /** Decode a portable RoaringBitmapArray into sorted row indexes. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    for (_ <- 0L until nBitmaps) {
      val high = buf.getInt.toLong & 0xffffffffL
      decode32(buf, v => out += (high << 32) | (v.toLong & 0xffffffffL))
    }
    out.result()
  }

  /** Decode one 32-bit roaring portable stream starting at `buf`'s
    * position (advances it), emitting each set value.
    */
  private def decode32(buf: java.nio.ByteBuffer, emit: Int => Unit): Unit = {
    val start = buf.position()
    val cookie = buf.getInt
    val hasRun = (cookie & 0xffff) == SerialCookie
    val n =
      if (hasRun) (cookie >>> 16) + 1
      else {
        require(cookie == SerialCookieNoRun, s"bad roaring cookie $cookie")
        buf.getInt
      }
    val runFlags: Array[Boolean] =
      if (!hasRun) Array.fill(n)(false)
      else {
        val bits = new Array[Byte]((n + 7) / 8)
        buf.get(bits)
        Array.tabulate(n)(i => (bits(i / 8) & (1 << (i % 8))) != 0)
      }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    for (i <- 0 until n) {
      keys(i) = buf.getShort.toInt & 0xffff
      cards(i) = (buf.getShort.toInt & 0xffff) + 1
    }
    val hasOffsets = !hasRun || n >= NoOffsetThreshold
    val offsets: Array[Int] =
      if (hasOffsets) Array.fill(n)(buf.getInt) else null
    var pos = buf.position()
    for (i <- 0 until n) {
      if (offsets != null) pos = start + offsets(i)
      buf.position(pos)
      val base = keys(i) << 16
      if (runFlags(i)) {
        val nRuns = buf.getShort.toInt & 0xffff
        for (_ <- 0 until nRuns) {
          val v0 = buf.getShort.toInt & 0xffff
          val len = buf.getShort.toInt & 0xffff
          for (v <- v0 to v0 + len) emit(base | v)
        }
      } else if (cards(i) <= 4096) {
        for (_ <- 0 until cards(i)) emit(base | (buf.getShort.toInt & 0xffff))
      } else {
        for (w <- 0 until 1024) {
          val word = buf.getLong
          if (word != 0L) {
            var b = 0
            while (b < 64) {
              if ((word & (1L << b)) != 0L) emit(base | (w * 64 + b))
              b += 1
            }
          }
        }
      }
      pos = buf.position()
    }
    buf.position(pos)
  }

  /** Encode sorted-or-not row indexes as a portable RoaringBitmapArray
    * (no-run form: array containers ≤4096 values, bitmap above).
    */
  def encode(values: Array[Long]): Array[Byte] = {
    val sorted = values.distinct.sorted
    val byHigh = scala.collection.mutable.LinkedHashMap[Long, Array[Int]]()
    sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1).foreach { case (h, vs) =>
      byHigh(h) = vs.map(v => (v & 0xffffffffL).toInt)
    }
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    def le64(v: Long): Unit = { le32((v & 0xffffffffL).toInt); le32((v >>> 32).toInt) }
    le32(Magic)
    le64(byHigh.size.toLong)
    byHigh.foreach { case (high, lows) =>
      le32(high.toInt)
      // group by 16-bit container key
      val containers = lows.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
      val n = containers.size
      le32(SerialCookieNoRun)
      le32(n)
      containers.foreach { case (key, vs) =>
        le16(key); le16(vs.length - 1)
      }
      // offsets header (mandatory for the no-run cookie): byte offsets
      // from the start of THIS 32-bit stream to each container
      val headerLen = 4 + 4 + 4 * n + 4 * n
      var off = headerLen
      containers.foreach { case (_, vs) =>
        le32(off)
        off += (if (vs.length <= 4096) 2 * vs.length else 8192)
      }
      containers.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.sorted.foreach(v => le16(v & 0xffff))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xffff
            words(low >>> 6) |= (1L << (low & 63))
          }
          words.foreach(le64)
        }
      }
    }
    out.toByteArray
  }
}

object DeltaDv {
  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Rev: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** z85: 4 bytes → 5 chars, big-endian base-85 (length must be ×4). */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 encodes 4-byte groups")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      for (j <- 0 until 4) v = (v << 8) | (bytes(i + j) & 0xffL)
      val digits = new Array[Char](5)
      for (j <- 4 to 0 by -1) { digits(j) = Z85((v % 85).toInt); v /= 85 }
      sb.appendAll(digits)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, "z85 decodes 5-char groups")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      for (j <- 0 until 5) {
        val d = if (s(i + j) < 128) Z85Rev(s(i + j).toInt) else -1
        require(d >= 0, s"invalid z85 char '${s(i + j)}'")
        v = v * 85 + d
      }
      for (j <- 3 to 0 by -1) { out(o + j) = (v & 0xff).toByte; v >>>= 8 }
      i += 5
      o += 4
    }
    out
  }

  /** Descriptor as parsed from `add.deletionVector`. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
                              offset: Option[Long], sizeInBytes: Int,
                              cardinality: Long)

  /** Absolute DV file path for `u`/`p` descriptors (the `u` form hides
    * a z85 UUID behind an optional random prefix; the file is
    * `deletion_vector_<uuid>.bin` under the table root).
    */
  def dvPath(tableRoot: HPath, d: Descriptor): HPath = d.storageType match {
    case "p" => new HPath(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"bad uuid DV path '$enc'")
      val prefix = enc.dropRight(20)
      val bytes = z85Decode(enc.takeRight(20))
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) new HPath(tableRoot, name)
      else new HPath(new HPath(tableRoot, prefix), name)
    case other => throw new IllegalArgumentException(s"no file path for storageType '$other'")
  }

  /** Read one DV's bitmap bytes per the on-disk layout: seek to
    * `offset` (defaults to 1, just past the version byte), 4-byte
    * big-endian length, data, 4-byte big-endian CRC-32 — verified.
    * Inline (`i`) descriptors decode straight from z85.
    */
  def readBitmap(io: LakeIo, tableRoot: HPath, d: Descriptor): Array[Byte] = {
    if (d.storageType == "i") return z85Decode(d.pathOrInlineDv)
    val p = dvPath(tableRoot, d)
    val in = io.fs.open(p)
    try {
      val all = in.readAllBytes()
      require(all.nonEmpty && all(0) == 1, s"unsupported DV file version at $p")
      val off = d.offset.getOrElse(1L).toInt
      val bb = java.nio.ByteBuffer.wrap(all, off, all.length - off)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val size = bb.getInt
      require(size == d.sizeInBytes,
        s"DV size mismatch at $p: stored $size, descriptor ${d.sizeInBytes}")
      val data = new Array[Byte](size)
      bb.get(data)
      val crc = bb.getInt
      val c = new java.util.zip.CRC32()
      c.update(data)
      require(crc == c.getValue.toInt, s"DV checksum mismatch at $p")
      data
    } finally in.close()
  }

  /** Write DVs (one per entry) into a single `deletion_vector_*.bin`
    * under `tableRoot`, returning the `u`-form descriptor per entry.
    */
  def writeDvFile(io: LakeIo, tableRoot: HPath,
                  bitmaps: Seq[(Array[Byte], Long)]): Seq[Descriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(bb.array())
    val p = new HPath(tableRoot, s"deletion_vector_$uuid.bin")
    val out = io.fs.create(p, false)
    val descs = Seq.newBuilder[Descriptor]
    try {
      out.write(1) // format version
      var off = 1L
      bitmaps.foreach { case (data, cardinality) =>
        val head = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.BIG_ENDIAN)
        head.putInt(data.length)
        out.write(head.array())
        out.write(data)
        val c = new java.util.zip.CRC32()
        c.update(data)
        val tail = java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.BIG_ENDIAN)
        tail.putInt(c.getValue.toInt)
        out.write(tail.array())
        descs += Descriptor("u", enc, Some(off), data.length, cardinality)
        off += 4L + data.length + 4L
      }
    } finally out.close()
    descs.result()
  }
}
