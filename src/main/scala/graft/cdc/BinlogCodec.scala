package graft.cdc

import org.apache.spark.unsafe.types.UTF8String

/** Raw MySQL binlog scalar codecs — the byte formats ROW-mode binlog events
  * use for DECIMAL and temporal columns, decoded straight from `BinaryType`
  * columns (the path a Debezium-less deployment hits when pointing the
  * engine at a topic of raw binlog bytes).
  *
  * Formats follow the MySQL on-disk/in-binlog spec, the same one the
  * reference implements (`/root/reference/src/binlog.rs:17-106` packed
  * DECIMAL, `:249-297` DATE/TIME/DATETIME, fractional seconds
  * `/root/reference/src/mysql.rs:379-400`). Fractional seconds are stored
  * padded to an even digit count (2·ceil(fsp/2) digits in ceil(fsp/2)
  * bytes), so odd fsp divides the stored value by 10 — the reference gets
  * this right and it is preserved here. One deliberate deviation from the
  * reference, which has a decode bug we must not inherit: negative TIME
  * values are proper two's-complement over the full (packed+fraction)
  * big-endian value (the reference reinterprets the bytes little-endian
  * before negating, garbling every negative time).
  *
  * Static methods take/return Catalyst-internal types (`UTF8String`) so the
  * wrapping [[BinlogDecode]] expressions can call them from generated code
  * — one virtual-free static call per row, inside whole-stage codegen.
  */
object BinlogCodec {

  /** Bytes needed for d (< 9) leading/trailing decimal digits. */
  private val CompressedBytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)
  private val DigPerDec = 9

  /** Wire size of a DECIMAL(precision, scale): full base-10^9 groups cost
    * 4 bytes, the partial leading/trailing groups their compressed size.
    */
  def decimalBinarySize(precision: Int, scale: Int): Int = {
    val intg = precision - scale
    4 * (intg / DigPerDec) + 4 * (scale / DigPerDec) +
      CompressedBytes(intg % DigPerDec) + CompressedBytes(scale % DigPerDec)
  }

  /** Decode a packed DECIMAL: sign bit in the MSB of byte 0 (set =
    * non-negative), negative values stored one's-complemented, digit
    * groups big-endian base-10^9. Renders the canonical plain string
    * ("-0.0500", "0", "123.40") — integral part without leading zeros,
    * fractional part exactly `scale` digits.
    */
  /** Fail loudly on truncated wire bytes (matches VectorKernels.cosine's
    * policy) — zero-padding a short buffer would decode to a plausible
    * wrong value instead of surfacing the corruption.
    */
  private def checkLen(input: Array[Byte], need: Int, what: String): Unit =
    if (input.length < need)
      throw new IllegalArgumentException(
        s"truncated $what: need $need bytes, got ${input.length}")

  def decodeDecimal(input: Array[Byte], precision: Int, scale: Int): UTF8String = {
    val n = decimalBinarySize(precision, scale)
    checkLen(input, n, s"DECIMAL($precision,$scale)")
    val bs = java.util.Arrays.copyOf(input, n)
    val negative = (bs(0) & 0x80) == 0
    bs(0) = (bs(0) ^ 0x80).toByte
    if (negative) {
      var i = 0
      while (i < n) { bs(i) = (~bs(i)).toByte; i += 1 }
    }
    var pos = 0
    def readBE(len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 8) | (bs(pos + i) & 0xffL); i += 1 }
      pos += len
      v
    }
    def appendPadded(sb: java.lang.StringBuilder, v: Long, width: Int): Unit = {
      val s = java.lang.Long.toString(v)
      var i = s.length
      while (i < width) { sb.append('0'); i += 1 }
      sb.append(s)
    }
    val intg = precision - scale
    val sb = new java.lang.StringBuilder
    if (negative) sb.append('-')
    var intgEmpty = true
    if (CompressedBytes(intg % DigPerDec) > 0) {
      val v = readBE(CompressedBytes(intg % DigPerDec))
      if (v > 0) { sb.append(v); intgEmpty = false }
    }
    var g = 0
    while (g < intg / DigPerDec) {
      val v = readBE(4)
      if (intgEmpty) { if (v > 0) { sb.append(v); intgEmpty = false } }
      else appendPadded(sb, v, DigPerDec)
      g += 1
    }
    if (intgEmpty) sb.append('0')
    if (scale > 0) {
      sb.append('.')
      g = 0
      while (g < scale / DigPerDec) { appendPadded(sb, readBE(4), DigPerDec); g += 1 }
      if (CompressedBytes(scale % DigPerDec) > 0)
        appendPadded(sb, readBE(CompressedBytes(scale % DigPerDec)), scale % DigPerDec)
    }
    UTF8String.fromString(sb.toString)
  }

  /** Encode an unscaled decimal value (test/fixture synthesis; `Long`
    * bounds precision to 18 — the decoder itself is unbounded).
    */
  def encodeDecimalUnscaled(unscaled: Long, precision: Int, scale: Int): Array[Byte] = {
    require(precision >= 1 && precision <= 18 && scale >= 0 && scale <= precision)
    val negative = unscaled < 0
    val digits = math.abs(unscaled).toString
    require(digits.length <= precision, s"$unscaled overflows DECIMAL($precision,$scale)")
    val padded = ("0" * (precision - digits.length)) + digits
    val intg = precision - scale
    val out = new java.io.ByteArrayOutputStream(decimalBinarySize(precision, scale))
    def writeBE(v: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    val compIntg = intg % DigPerDec
    if (compIntg > 0) writeBE(padded.substring(0, compIntg).toLong, CompressedBytes(compIntg))
    var p = compIntg
    while (p + DigPerDec <= intg) { writeBE(padded.substring(p, p + DigPerDec).toLong, 4); p += DigPerDec }
    while (p + DigPerDec <= intg + (scale / DigPerDec) * DigPerDec) {
      writeBE(padded.substring(p, p + DigPerDec).toLong, 4); p += DigPerDec
    }
    val compFrac = scale % DigPerDec
    if (compFrac > 0) writeBE(padded.substring(p).toLong, CompressedBytes(compFrac))
    val bs = out.toByteArray
    bs(0) = (bs(0) ^ 0x80).toByte
    if (negative) {
      var i = 0
      while (i < bs.length) { bs(i) = (~bs(i)).toByte; i += 1 }
    }
    bs
  }

  /** DATE: 3 bytes little-endian, day in bits 0-4, month 5-8, year 9-23.
    * The all-zero value is MySQL's "zero date" → SQL NULL.
    */
  def decodeDate(input: Array[Byte]): UTF8String = {
    checkLen(input, 3, "DATE")
    val v = (input(0) & 0xff) | ((input(1) & 0xff) << 8) | ((input(2) & 0xff) << 16)
    if (v == 0) null
    else UTF8String.fromString(
      f"${v >> 9}%04d-${(v >> 5) & 0xf}%02d-${v & 0x1f}%02d")
  }

  def encodeDate(year: Int, month: Int, day: Int): Array[Byte] = {
    val v = (year << 9) | (month << 5) | day
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)
  }

  private def fracBytes(fsp: Int): Int = (fsp + 1) / 2

  private def readBEAt(input: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (input(off + i) & 0xffL); i += 1 }
    v
  }

  /** Stored fraction (2·ceil(fsp/2) digits on the wire) → fsp digits. */
  private def storedToFsp(stored: Long, fsp: Int): Long =
    if (fsp % 2 == 1) stored / 10 else stored

  /** fsp-digit fraction → the even-digit-padded value the wire stores. */
  private def fspToStored(frac: Long, fsp: Int): Long =
    if (fsp % 2 == 1) frac * 10 else frac

  private def appendFrac(sb: java.lang.StringBuilder, frac: Long, fsp: Int): Unit =
    if (fsp > 0) {
      sb.append('.')
      val s = java.lang.Long.toString(frac)
      var i = s.length
      while (i < fsp) { sb.append('0'); i += 1 }
      sb.append(s)
    }

  /** TIME2: sign-offset 0x800000 over 3 big-endian bytes, hours in bits
    * 12-21, minutes 6-11, seconds 0-5; `fsp` extra digits in ceil(fsp/2)
    * trailing bytes. Negative times are two's-complement over the FULL
    * (packed ++ fraction) big-endian value — decoded correctly here (the
    * reference's little-endian reinterpretation at binlog.rs:264-270 is a
    * bug not inherited).
    */
  def decodeTime(input: Array[Byte], fsp: Int): UTF8String = {
    val fb = fracBytes(fsp)
    checkLen(input, 3 + fb, s"TIME2(fsp=$fsp)")
    val total = readBEAt(input, 0, 3 + fb) - (0x800000L << (8 * fb))
    val negative = total < 0
    val abs = math.abs(total)
    val frac = if (fb > 0) storedToFsp(abs & ((1L << (8 * fb)) - 1), fsp) else 0L
    val packed = abs >> (8 * fb)
    val sb = new java.lang.StringBuilder
    if (negative) sb.append('-')
    sb.append(f"${(packed >> 12) & 0x3ff}%02d:${(packed >> 6) & 0x3f}%02d:${packed & 0x3f}%02d")
    appendFrac(sb, frac, fsp)
    UTF8String.fromString(sb.toString)
  }

  def encodeTime(negative: Boolean, hours: Int, minutes: Int, seconds: Int,
      frac: Long, fsp: Int): Array[Byte] = {
    val fb = fracBytes(fsp)
    val packedAll = ((((hours.toLong << 6) | minutes) << 6) | seconds) << (8 * fb) |
      fspToStored(frac, fsp)
    val offset = 0x800000L << (8 * fb)
    val store = if (negative) offset - packedAll else offset + packedAll
    val out = new Array[Byte](3 + fb)
    var i = 0
    while (i < out.length) {
      out(i) = ((store >> (8 * (out.length - 1 - i))) & 0xff).toByte
      i += 1
    }
    out
  }

  /** DATETIME2: 5 big-endian bytes offset by 0x8000000000; bits 17-39 are
    * yearMonth*32+day (yearMonth = year*13+month), bits 0-16 the time
    * (hour<<12 | minute<<6 | second); `fsp` digits follow. The all-zero
    * value is MySQL's "zero datetime" → SQL NULL (same policy as DATE —
    * rendering "0000-00-00 00:00:00" would crash any ANSI timestamp cast).
    */
  def decodeDatetime(input: Array[Byte], fsp: Int): UTF8String = {
    checkLen(input, 5 + fracBytes(fsp), s"DATETIME2(fsp=$fsp)")
    val v = readBEAt(input, 0, 5) - 0x8000000000L
    val dVal = v >> 17
    val tVal = v & 0x1ffff
    val ym = dVal >> 5
    val frac = if (fracBytes(fsp) > 0)
      storedToFsp(readBEAt(input, 5, fracBytes(fsp)), fsp) else 0L
    if (v == 0 && frac == 0) return null
    val sb = new java.lang.StringBuilder
    sb.append(f"${ym / 13}%04d-${ym % 13}%02d-${dVal & 0x1f}%02d ")
    sb.append(f"${(tVal >> 12) & 0x1f}%02d:${(tVal >> 6) & 0x3f}%02d:${tVal & 0x3f}%02d")
    appendFrac(sb, frac, fsp)
    UTF8String.fromString(sb.toString)
  }

  def encodeDatetime(year: Int, month: Int, day: Int, hour: Int, minute: Int,
      second: Int, frac: Long, fsp: Int): Array[Byte] = {
    val dVal = ((year * 13L + month) << 5) | day
    val tVal = (hour.toLong << 12) | (minute << 6) | second
    val store = ((dVal << 17) | tVal) + 0x8000000000L
    val fb = fracBytes(fsp)
    val stored = fspToStored(frac, fsp)
    val out = new Array[Byte](5 + fb)
    var i = 0
    while (i < 5) { out(i) = ((store >> (8 * (4 - i))) & 0xff).toByte; i += 1 }
    while (i < out.length) {
      out(i) = ((stored >> (8 * (out.length - 1 - i))) & 0xff).toByte
      i += 1
    }
    out
  }

  /** TIMESTAMP2: 4 big-endian bytes of epoch seconds, then `fsp` digits.
    * Zero is MySQL's "zero timestamp" (the valid range starts at epoch 1)
    * → SQL NULL, not 1970-01-01.
    */
  def decodeTimestamp(input: Array[Byte], fsp: Int): UTF8String = {
    checkLen(input, 4 + fracBytes(fsp), s"TIMESTAMP2(fsp=$fsp)")
    val secs = readBEAt(input, 0, 4)
    val frac = if (fracBytes(fsp) > 0)
      storedToFsp(readBEAt(input, 4, fracBytes(fsp)), fsp) else 0L
    if (secs == 0 && frac == 0) return null
    val sb = new java.lang.StringBuilder
    sb.append(secs)
    appendFrac(sb, frac, fsp)
    UTF8String.fromString(sb.toString)
  }

  def encodeTimestamp(epochSeconds: Long, frac: Long, fsp: Int): Array[Byte] = {
    val fb = fracBytes(fsp)
    val stored = fspToStored(frac, fsp)
    val out = new Array[Byte](4 + fb)
    var i = 0
    while (i < 4) { out(i) = ((epochSeconds >> (8 * (3 - i))) & 0xff).toByte; i += 1 }
    while (i < out.length) {
      out(i) = ((stored >> (8 * (out.length - 1 - i))) & 0xff).toByte
      i += 1
    }
    out
  }
}
