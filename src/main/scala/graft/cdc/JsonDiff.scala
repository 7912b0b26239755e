package graft.cdc

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL JSON diff codec — the partial-update format row events carry for
  * JSON columns under `binlog_row_value_options=PARTIAL_JSON`
  * (MySQL 8.0.3+). Instead of re-logging a multi-megabyte document for a
  * one-field `JSON_SET`, the after image stores a sequence of diffs:
  *
  *   diffs ::= diff*
  *   diff  ::= operation(u1) path-length(lenenc) path-utf8
  *             [ value-length(lenenc) jsonb-doc ]     — absent for REMOVE
  *
  * operation: 0 = REPLACE, 1 = INSERT, 2 = REMOVE (MySQL
  * `enum_json_diff_operation` order, sql/json_diff.h). The path is a
  * concrete MySQL JSON path — `$`, `.member`, `."quoted member"`, `[N]` —
  * never a wildcard (the server only logs concrete paths). The value is a
  * complete JSONB document ([[JsonBinary]] layout, type byte + payload).
  *
  * Beyond-reference: the reference errors on JSON columns entirely
  * (`/root/reference/src/binlog.rs:330`); most CDC consumers (including
  * Canal) drop or garble partial updates. Applying the diff needs the
  * before image, which an UPDATE row event conveniently carries — the row
  * decoder materializes the after image by applying diffs to the before
  * value, so downstream sees a plain UPDATE with whole documents.
  *
  * Apply is strict (MySQL server semantics, json_diff.cc): REPLACE and
  * REMOVE require the path to exist, INSERT requires an object member to
  * be absent (an array INSERT at an index ≥ size appends, as the server
  * does); any violation throws rather than silently corrupting the
  * stream.
  */
object JsonDiff {

  final val Replace = 0
  final val Insert = 1
  final val Remove = 2

  // ---------------------------------------------------------------- paths

  sealed trait Leg
  final case class Member(name: String) extends Leg
  final case class Elem(i: Int) extends Leg

  /** Parse a concrete MySQL JSON path: `$` then `.member`, `."quoted"`,
    * or `[N]` legs. Wildcards/ranges (`*`, `**`, `[last]`) are rejected —
    * diffs never carry them.
    */
  def parsePath(path: String): Seq[Leg] = {
    val s = path.trim
    require(s.nonEmpty && s.head == '$', s"JSON path must start with $$: $path")
    val out = Seq.newBuilder[Leg]
    var i = 1
    while (i < s.length) {
      s(i) match {
        case '.' =>
          i += 1
          require(i < s.length, s"dangling '.' in JSON path: $path")
          if (s(i) == '"') {
            val sb = new StringBuilder
            i += 1
            while (i < s.length && s(i) != '"') {
              if (s(i) == '\\' && i + 1 < s.length) { sb += s(i + 1); i += 2 }
              else { sb += s(i); i += 1 }
            }
            require(i < s.length, s"unterminated quoted member in JSON path: $path")
            i += 1 // closing quote
            out += Member(sb.toString)
          } else {
            val start = i
            while (i < s.length && s(i) != '.' && s(i) != '[') i += 1
            val name = s.substring(start, i)
            require(name.nonEmpty && name != "*", s"bad member leg in JSON path: $path")
            out += Member(name)
          }
        case '[' =>
          val end = s.indexOf(']', i)
          require(end > i, s"unterminated index leg in JSON path: $path")
          val idx = s.substring(i + 1, end).trim
          require(idx.nonEmpty && idx.forall(_.isDigit),
            s"non-numeric index leg in JSON path: $path")
          out += Elem(idx.toInt)
          i = end + 1
        case c =>
          throw new IllegalArgumentException(s"unexpected '$c' in JSON path: $path")
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------- codec

  private def lenenc(bs: Array[Byte], p0: Int): (Long, Int) = {
    require(p0 < bs.length, "truncated lenenc in JSON diff")
    (bs(p0) & 0xff) match {
      case v if v < 0xfb => (v.toLong, p0 + 1)
      case 0xfc =>
        require(p0 + 3 <= bs.length, "truncated lenenc-2 in JSON diff")
        (((bs(p0 + 2) & 0xffL) << 8) | (bs(p0 + 1) & 0xffL), p0 + 3)
      case 0xfd =>
        require(p0 + 4 <= bs.length, "truncated lenenc-3 in JSON diff")
        (((bs(p0 + 3) & 0xffL) << 16) | ((bs(p0 + 2) & 0xffL) << 8) |
          (bs(p0 + 1) & 0xffL), p0 + 4)
      case other =>
        throw new IllegalArgumentException(f"bad lenenc prefix 0x$other%02x in JSON diff")
    }
  }

  /** Decode a diff sequence to (op, path, value-as-JSON-text) triples. */
  def decode(bytes: Array[Byte]): Seq[(Int, String, Option[String])] = {
    val out = Seq.newBuilder[(Int, String, Option[String])]
    var p = 0
    while (p < bytes.length) {
      val op = bytes(p) & 0xff
      require(op <= Remove, s"unknown JSON diff operation $op")
      p += 1
      val (plen, p1) = lenenc(bytes, p)
      require(p1 + plen <= bytes.length, "truncated JSON diff path")
      val path = new String(bytes, p1, plen.toInt, "UTF-8")
      p = p1 + plen.toInt
      val value = if (op == Remove) None else {
        val (vlen, p2) = lenenc(bytes, p)
        require(p2 + vlen <= bytes.length, "truncated JSON diff value")
        val doc = java.util.Arrays.copyOfRange(bytes, p2, p2 + vlen.toInt)
        p = p2 + vlen.toInt
        Some(JsonBinary.decodeToString(doc))
      }
      out += ((op, path, value))
    }
    out.result()
  }

  /** Fixture/test encoder (inverse of [[decode]]; values are JSON text). */
  def encode(diffs: Seq[(Int, String, Option[String])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def writeLenenc(v: Int): Unit =
      if (v < 0xfb) out.write(v)
      else if (v <= 0xffff) { out.write(0xfc); out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write(0xfd); out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff) }
    diffs.foreach { case (op, path, value) =>
      require(op <= Remove, s"unknown JSON diff operation $op")
      require((op == Remove) == value.isEmpty,
        "REMOVE takes no value; REPLACE/INSERT require one")
      out.write(op)
      val pb = path.getBytes("UTF-8")
      writeLenenc(pb.length)
      out.write(pb)
      value.foreach { v =>
        val doc = JsonBinary.encode(v)
        writeLenenc(doc.length)
        out.write(doc)
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- apply

  private def navigate(root: JsonNode, legs: Seq[Leg], path: String): JsonNode =
    legs.foldLeft(root) { (node, leg) =>
      val next = leg match {
        case Member(n) => node match {
          case o: ObjectNode => o.get(n)
          case _ => null
        }
        case Elem(i) => node match {
          case a: ArrayNode => a.get(i)
          case _ => null
        }
      }
      require(next != null, s"JSON diff path does not exist: $path")
      next
    }

  /** Apply one decoded diff list to a document tree (mutates and returns
    * the possibly-new root — a REPLACE at `$` swaps the root wholesale).
    */
  def applyDiffs(root0: JsonNode, diffs: Seq[(Int, String, Option[String])]): JsonNode =
    diffs.foldLeft(root0) { case (root, (op, path, value)) =>
      val legs = parsePath(path)
      val valueNode = value.map(JsonBinary.readTree)
      if (legs.isEmpty) {
        // whole-document path: REPLACE swaps the root; INSERT/REMOVE at $
        // are not producible by the server and fail loudly
        require(op == Replace, s"JSON diff op $op at root path $$")
        valueNode.get
      } else {
        val parent = navigate(root, legs.init, path)
        (op, legs.last) match {
          case (Replace, Member(n)) =>
            val o = asObject(parent, path)
            require(o.has(n), s"REPLACE path does not exist: $path")
            o.set(n, valueNode.get)
          case (Replace, Elem(i)) =>
            val a = asArray(parent, path)
            require(i < a.size, s"REPLACE index out of range: $path")
            a.set(i, valueNode.get)
          case (Insert, Member(n)) =>
            val o = asObject(parent, path)
            require(!o.has(n), s"INSERT over existing member: $path")
            o.set(n, valueNode.get)
          case (Insert, Elem(i)) =>
            val a = asArray(parent, path)
            if (i >= a.size) a.add(valueNode.get) else a.insert(i, valueNode.get)
          case (Remove, Member(n)) =>
            val o = asObject(parent, path)
            require(o.has(n), s"REMOVE path does not exist: $path")
            o.remove(n)
          case (Remove, Elem(i)) =>
            val a = asArray(parent, path)
            require(i < a.size, s"REMOVE index out of range: $path")
            a.remove(i)
          case (other, _) =>
            throw new IllegalArgumentException(s"unknown JSON diff operation $other")
        }
        root
      }
    }

  private def asObject(n: JsonNode, path: String): ObjectNode = n match {
    case o: ObjectNode => o
    case _ => throw new IllegalArgumentException(
      s"JSON diff member leg on non-object parent: $path")
  }

  private def asArray(n: JsonNode, path: String): ArrayNode = n match {
    case a: ArrayNode => a
    case _ => throw new IllegalArgumentException(
      s"JSON diff index leg on non-array parent: $path")
  }

  /** The row-decoder entry point: before-image JSON text + raw diff bytes
    * → after-image JSON text.
    */
  def applyToText(before: String, diffBytes: Array[Byte]): UTF8String =
    UTF8String.fromString(JsonBinary.render(
      applyDiffs(JsonBinary.readTree(before), decode(diffBytes))))
}
