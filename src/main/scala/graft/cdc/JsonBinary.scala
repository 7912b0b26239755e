package graft.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** MySQL binary JSON ("JSONB") codec — the on-disk/wire format MySQL uses
  * for JSON columns in row-based binlog events.
  *
  * The reference explicitly errors on JSON columns
  * (`/root/reference/src/binlog.rs:330` — "unsupported column type"), so
  * this is beyond-reference coverage: a CDC stream from any table with a
  * JSON column needs it. The format is public (MySQL source
  * `sql/json_binary.h` documents the layout in its header comment):
  *
  *   doc      ::= type-byte payload
  *   object   ::= count size key-entry* value-entry* key* value*
  *   array    ::= count size value-entry* value*
  *   count/size/offsets: u16 LE in the SMALL variants, u32 LE in LARGE
  *   key-entry   ::= key-offset key-length(u16)
  *   value-entry ::= type-byte (offset | inlined-value)   — 2 or 4 bytes
  *   string   ::= varlen utf8-bytes    (varlen: 7 bits/byte, high bit = more)
  *
  * Literals (null/true/false) and int16/uint16 are always inlined in the
  * value entry; int32/uint32 additionally inline in LARGE containers (the
  * entry's offset field is wide enough). Offsets are relative to the start
  * of the container's payload (its count field). Object keys are stored
  * sorted by (length, bytes) — MySQL's canonical key order.
  *
  * Decode renders compact JSON text via Jackson (deterministic; object key
  * order is storage order). Encode (fixture/test use, like the other
  * [[BinlogRowCodec]] encoders) parses JSON text with Jackson and writes
  * the canonical small-format-first bytes. Both directions are strict:
  * truncated buffers, bad offsets, and unknown type bytes throw.
  */
object JsonBinary {

  final val SmallObject = 0x00
  final val LargeObject = 0x01
  final val SmallArray = 0x02
  final val LargeArray = 0x03
  final val Literal = 0x04
  final val Int16 = 0x05
  final val UInt16 = 0x06
  final val Int32 = 0x07
  final val UInt32 = 0x08
  final val Int64 = 0x09
  final val UInt64 = 0x0a
  final val DoubleT = 0x0b
  final val Str = 0x0c

  final val LitNull = 0x00
  final val LitTrue = 0x01
  final val LitFalse = 0x02

  private val mapper = new ObjectMapper()
  private val nodes = JsonNodeFactory.instance

  // ---------------------------------------------------------------- decode

  /** MySQL's own JSON nesting cap; also the guard that makes decode total
    * on adversarial bytes — a container value entry whose offset points
    * back into an enclosing container would otherwise recurse forever.
    */
  final val MaxDepth = 100

  /** Parse JSON text to a Jackson tree (shared mapper; [[JsonDiff]] use). */
  def readTree(json: String): JsonNode = mapper.readTree(json)

  /** Render a tree to compact JSON text (shared mapper; [[JsonDiff]] use). */
  def render(node: JsonNode): String = mapper.writeValueAsString(node)

  /** Decode a whole JSONB document (type byte + payload) to JSON text. */
  def decodeToString(doc: Array[Byte]): String = {
    require(doc.length >= 1, "empty JSONB document")
    mapper.writeValueAsString(parseValue(doc(0) & 0xff, doc, 1, 0))
  }

  private def u16(bs: Array[Byte], p: Int): Int = {
    need(bs, p, 2)
    (bs(p) & 0xff) | ((bs(p + 1) & 0xff) << 8)
  }

  private def u32(bs: Array[Byte], p: Int): Long = {
    need(bs, p, 4)
    (bs(p) & 0xffL) | ((bs(p + 1) & 0xffL) << 8) |
      ((bs(p + 2) & 0xffL) << 16) | ((bs(p + 3) & 0xffL) << 24)
  }

  private def u64(bs: Array[Byte], p: Int): Long = {
    need(bs, p, 8)
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (bs(p + i) & 0xffL); i -= 1 }
    v
  }

  private def need(bs: Array[Byte], p: Int, n: Int): Unit =
    if (p < 0 || p + n > bs.length)
      throw new IllegalArgumentException(
        s"truncated JSONB: need $n bytes at offset $p, have ${bs.length}")

  /** Variable-length u32: 7 bits per byte, little-endian, high bit = more.
    * Returns (value, bytesConsumed).
    */
  private def varlen(bs: Array[Byte], p: Int): (Int, Int) = {
    var v = 0L
    var i = 0
    var more = true
    while (more) {
      need(bs, p + i, 1)
      val b = bs(p + i) & 0xff
      v |= (b & 0x7fL) << (7 * i)
      more = (b & 0x80) != 0
      i += 1
      if (i > 5) throw new IllegalArgumentException("JSONB varlen overruns 5 bytes")
    }
    if (v > Int.MaxValue) throw new IllegalArgumentException(s"JSONB varlen $v too large")
    (v.toInt, i)
  }

  /** Parse the value whose payload starts at `p` (the type byte is given
    * separately — for container members it lives in the value entry).
    */
  private def parseValue(tpe: Int, bs: Array[Byte], p: Int, depth: Int): JsonNode = tpe match {
    case Literal =>
      need(bs, p, 1)
      literalNode(bs(p) & 0xff)
    case Int16 => nodes.numberNode(u16(bs, p).toShort.toInt)
    case UInt16 => nodes.numberNode(u16(bs, p))
    case Int32 => nodes.numberNode(u32(bs, p).toInt)
    case UInt32 => nodes.numberNode(u32(bs, p))
    case Int64 => nodes.numberNode(u64(bs, p))
    case UInt64 =>
      val v = u64(bs, p)
      if (v >= 0) nodes.numberNode(v)
      else nodes.numberNode(new java.math.BigInteger(java.lang.Long.toUnsignedString(v)))
    case DoubleT => nodes.numberNode(java.lang.Double.longBitsToDouble(u64(bs, p)))
    case Str =>
      val (len, lenBytes) = varlen(bs, p)
      need(bs, p + lenBytes, len)
      nodes.textNode(new String(bs, p + lenBytes, len, "UTF-8"))
    case SmallObject => parseContainer(bs, p, isObject = true, large = false, depth)
    case LargeObject => parseContainer(bs, p, isObject = true, large = true, depth)
    case SmallArray => parseContainer(bs, p, isObject = false, large = false, depth)
    case LargeArray => parseContainer(bs, p, isObject = false, large = true, depth)
    case other =>
      throw new IllegalArgumentException(f"unknown JSONB type byte 0x$other%02x")
  }

  private def literalNode(lit: Int): JsonNode = lit match {
    case LitNull => nodes.nullNode()
    case LitTrue => nodes.booleanNode(true)
    case LitFalse => nodes.booleanNode(false)
    case other => throw new IllegalArgumentException(s"unknown JSONB literal $other")
  }

  /** True when a value of `tpe` is inlined in the value entry itself. */
  private def inlined(tpe: Int, large: Boolean): Boolean = tpe match {
    case Literal | Int16 | UInt16 => true
    case Int32 | UInt32 => large // 4-byte offset field fits the value
    case _ => false
  }

  private def parseContainer(bs: Array[Byte], base: Int,
      isObject: Boolean, large: Boolean, depth: Int): JsonNode = {
    if (depth >= MaxDepth)
      throw new IllegalArgumentException(s"JSONB nesting exceeds $MaxDepth")
    val w = if (large) 4 else 2 // count/size/offset width
    def off(p: Int): Int = {
      val v = if (large) u32(bs, p) else u16(bs, p).toLong
      if (v > Int.MaxValue) throw new IllegalArgumentException(s"JSONB offset $v too large")
      v.toInt
    }
    val count = off(base)
    val size = off(base + w)
    need(bs, base, size)
    // The entry headers must FIT in the declared size before anything is
    // preallocated: an adversarial count (e.g. 0x7fffffff in a 13-byte
    // doc) would otherwise OOM on arrayNode(count) — a crash, not the
    // promised IllegalArgumentException — and count*(w+2) would overflow
    // Int, silently miscomputing every valueEntries offset. Long math.
    val perEntry = (if (isObject) (w + 2) + (1 + w) else 1 + w).toLong
    if (2L * w + perEntry * count > size)
      throw new IllegalArgumentException(
        s"JSONB container claims $count entries; size $size cannot hold them")
    val keyEntries = base + 2 * w
    val valueEntries = keyEntries + (if (isObject) count * (w + 2) else 0)
    def member(i: Int): JsonNode = {
      val ep = valueEntries + i * (1 + w)
      need(bs, ep, 1 + w)
      val tpe = bs(ep) & 0xff
      if (inlined(tpe, large)) parseValue(tpe, bs, ep + 1, depth + 1)
      else {
        val o = off(ep + 1)
        if (o >= size) throw new IllegalArgumentException(
          s"JSONB value offset $o outside container of size $size")
        parseValue(tpe, bs, base + o, depth + 1)
      }
    }
    if (isObject) {
      val obj = nodes.objectNode()
      var i = 0
      while (i < count) {
        val kp = keyEntries + i * (w + 2)
        val ko = off(kp)
        val kl = u16(bs, kp + w)
        // keys get the same container-bound rejection as value offsets —
        // a key entry pointing past the declared size would otherwise read
        // its text from unrelated sibling bytes, silently. End-exclusive
        // on purpose: an EMPTY key (kl=0) may legitimately sit exactly at
        // the container end ({"":1} with no spilled values → ko == size).
        if (ko.toLong + kl > size)
          throw new IllegalArgumentException(
            s"JSONB key at offset $ko+$kl outside container of size $size")
        need(bs, base + ko, kl)
        obj.set[JsonNode](new String(bs, base + ko, kl, "UTF-8"), member(i))
        i += 1
      }
      obj
    } else {
      val arr = nodes.arrayNode(count)
      var i = 0
      while (i < count) { arr.add(member(i)); i += 1 }
      arr
    }
  }

  // --------------------------------------------------- encode (fixtures)

  /** Encode JSON text to a whole JSONB document (type byte + payload). */
  def encode(json: String): Array[Byte] = {
    val (tpe, payload) = encodeValue(mapper.readTree(json))
    val out = new Array[Byte](1 + payload.length)
    out(0) = tpe.toByte
    System.arraycopy(payload, 0, out, 1, payload.length)
    out
  }

  private def varlenBytes(v0: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(2)
    var v = v0
    while ({
      val b = v & 0x7f
      v >>>= 7
      out.write(if (v != 0) b | 0x80 else b)
      v != 0
    }) ()
    out.toByteArray
  }

  private def leBytes(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  /** Encode one node to (typeByte, payload). Containers try the SMALL
    * format and fall back to LARGE when any offset or the total size
    * overflows u16.
    */
  private def encodeValue(node: JsonNode): (Int, Array[Byte]) = {
    if (node.isNull) (Literal, Array(LitNull.toByte))
    else if (node.isBoolean)
      (Literal, Array((if (node.booleanValue) LitTrue else LitFalse).toByte))
    else if (node.isTextual) {
      val bs = node.textValue.getBytes("UTF-8")
      val len = varlenBytes(bs.length)
      (Str, len ++ bs)
    } else if (node.isIntegralNumber) {
      if (node.canConvertToLong) {
        val v = node.longValue
        if (v >= Short.MinValue && v <= Short.MaxValue) (Int16, leBytes(v, 2))
        else if (v >= Int.MinValue && v <= Int.MaxValue) (Int32, leBytes(v, 4))
        else (Int64, leBytes(v, 8))
      } else {
        val big = node.bigIntegerValue
        require(big.signum > 0 && big.bitLength <= 64, s"integer out of range: $big")
        (UInt64, leBytes(big.longValue, 8))
      }
    } else if (node.isNumber)
      (DoubleT, leBytes(java.lang.Double.doubleToLongBits(node.doubleValue), 8))
    else if (node.isObject || node.isArray) encodeContainer(node)
    else throw new IllegalArgumentException(s"unsupported JSON node: ${node.getNodeType}")
  }

  private def encodeContainer(node: JsonNode): (Int, Array[Byte]) = {
    val isObject = node.isObject
    // MySQL stores object keys sorted by (length, bytes).
    val keys: Seq[Array[Byte]] =
      if (!isObject) Nil
      else {
        val it = node.fieldNames()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result().map(_.getBytes("UTF-8"))
          .sortWith { (a, c) =>
            if (a.length != c.length) a.length < c.length
            else java.util.Arrays.compareUnsigned(a, c) < 0
          }
      }
    val members: Seq[JsonNode] =
      if (isObject) keys.map(k => node.get(new String(k, "UTF-8")))
      else (0 until node.size).map(node.get)
    val encoded = members.map(encodeValue)

    def assemble(large: Boolean): Option[Array[Byte]] = {
      val w = if (large) 4 else 2
      val n = members.length
      val headerLen = 2 * w + (if (isObject) n * (w + 2) else 0) + n * (1 + w)
      val out = new java.io.ByteArrayOutputStream(headerLen + 64)
      def writeOff(v: Long): Unit = out.write(leBytes(v, w), 0, w)
      // lay out the variable sections: keys first, then spilled values
      var cursor = headerLen.toLong
      val keyOffsets = keys.map { k => val o = cursor; cursor += k.length; o }
      val valueOffsets = encoded.map { case (tpe, payload) =>
        if (inlined(tpe, large)) -1L
        else { val o = cursor; cursor += payload.length; o }
      }
      val size = cursor
      val limit = if (large) Int.MaxValue.toLong else 0xffffL
      if (size > limit) return None
      writeOff(n.toLong)
      writeOff(size)
      keys.zip(keyOffsets).foreach { case (k, o) =>
        writeOff(o)
        out.write(leBytes(k.length.toLong, 2), 0, 2)
      }
      encoded.zip(valueOffsets).foreach { case ((tpe, payload), o) =>
        out.write(tpe)
        if (o < 0) { // inlined: payload sits in the offset field, zero-padded
          out.write(payload, 0, payload.length)
          var i = payload.length
          while (i < w) { out.write(0); i += 1 }
        } else writeOff(o)
      }
      keys.foreach(out.write)
      encoded.zip(valueOffsets).foreach { case ((_, payload), o) =>
        if (o >= 0) out.write(payload)
      }
      Some(out.toByteArray)
    }

    assemble(large = false) match {
      case Some(bytes) => (if (isObject) SmallObject else SmallArray, bytes)
      case None =>
        val bytes = assemble(large = true).getOrElse(
          throw new IllegalArgumentException("JSONB document exceeds large-format bounds"))
        (if (isObject) LargeObject else LargeArray, bytes)
    }
  }
}
