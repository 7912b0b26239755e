package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative text kernels callable from generated code — same rationale
  * as [[VectorKernels]]: HOF lambdas (`transform` + `concat_ws` + `slice`)
  * are interpreted per element; measured at sf0.1 the shingle HOF alone
  * cost ~4 s (half of q41), while one static call doing UTF8String byte
  * concatenation in a JIT'd loop is ~10x cheaper.
  */
object TextKernels {
  private val Space = UTF8String.fromString(" ")

  /** NFC-compose, strip C0/DEL control chars, collapse whitespace runs to
    * one space, trim — see [[NormalizeText]] for the portable contract.
    */
  def normalizeText(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var pendingSpace = false
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      // ASCII semantics on purpose (portable to RE2's \s): C0 controls
      // and DEL — including \t\n\r — are STRIPPED, space runs collapse;
      // exotic Unicode whitespace is ordinary text on both engines
      if (c < 0x20 || c == 0x7f) ()
      else if (c == ' ') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** 64-bit SimHash over a token array: per bit j, sum the ±1 contribution
    * of each token hash's bit j; sign(sum) becomes bit j. 64-bit token
    * hash = two seeded murmur32 halves. One JIT'd pass, no shuffle.
    */
  def simhash64(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i).toString
      val h1 = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b.toInt)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sim |= 1L << j; j += 1 }
    sim
  }

  /** Highest single-token occurrence count in one JIT'd hash-count pass —
    * the Gopher-style "top word fraction" numerator. The HOF equivalent
    * (`array_max(transform(array_distinct(toks), t -> size(filter(...))))`)
    * is O(n·distinct) AND interpreted per element.
    */
  def topTokenCount(toks: ArrayData): Int = {
    val n = toks.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(toks.getUTF8String(i), 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  /** ALL word k-gram spans in position order (NOT distinct — position
    * multiplicity matters for span-level dedup coverage). Same JIT'd
    * byte-concat loop as [[shingles]] minus the dedup set.
    */
  def spansAll(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i + k <= n) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint (Schleimer, Wilkerson & Aiken 2003, the
    * MOSS scheme): hash every word k-gram, slide a window of `w` hashes,
    * and record the window minimum — rightmost position on ties — once per
    * distinct position. `robust = true` switches the tie rule to the
    * paper's ROBUST variant: when several hashes tie for the window
    * minimum, prefer re-selecting the previous window's selection if it is
    * still in the window and still minimal (Fig. 6 of the paper) — on
    * repetitive text (the only source of ties under a cryptographic gram
    * hash) this re-selects one position across a run of tied windows
    * instead of recording a new rightmost minimum each time, lowering
    * fingerprint density without weakening the guarantee below.
    * Either way the kernel guarantees a selection in every w-window (so
    * any shared substring of length ≥ k+w-1 tokens yields a shared
    * fingerprint) while keeping the fingerprint density ~2/(w+1).
    *
    * The gram hash is the first 16 hex chars of md5(gram) so the DuckDB
    * oracle reproduces it verbatim (`substr(md5(g), 1, 16)`); hex strings
    * of fixed length compare like the numbers they encode. Documents with
    * fewer than w grams have no full window and fingerprint to empty — the
    * documented contract (winnowing is defined over full windows).
    *
    * One JIT'd O(n·w) pass per row (w is a small constant), no shuffle.
    */
  def winnow(toks: ArrayData, k: Int, w: Int): ArrayData =
    winnow(toks, k, w, robust = false)

  def winnow(toks: ArrayData, k: Int, w: Int, robust: Boolean): ArrayData = {
    val n = toks.numElements()
    val ng = n - k + 1
    if (ng < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val parts = new Array[UTF8String](k)
    val hashes = new Array[String](ng)
    var i = 0
    while (i < ng) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(Space, parts: _*)
      md.reset()
      val dig = md.digest(gram.getBytes)
      val sb = new java.lang.StringBuilder(16)
      var b = 0
      while (b < 8) { // 16 hex chars = first 8 digest bytes
        sb.append(Character.forDigit((dig(b) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(dig(b) & 0xf, 16))
        b += 1
      }
      hashes(i) = sb.toString
      i += 1
    }
    // Right-to-left scan per window keeps the RIGHTMOST tied minimum —
    // plain winnowing with rightmost tie-breaking when `robust` is off
    // (q171/q181's oracle replays this rule in SQL). With `robust` on,
    // a tied minimum re-selects the previous window's selection while it
    // stays in-window and minimal (the paper's robust rule) — equal hashes
    // arise only from equal grams, so this only differs on repetitive
    // text. A position is recorded at most once either way.
    val out = new java.util.LinkedHashMap[Integer, String]()
    var prevPos = -1
    var end = w - 1
    while (end < ng) {
      var minPos = end
      var q = end - 1
      while (q > end - w) {
        if (hashes(q).compareTo(hashes(minPos)) < 0) minPos = q
        q -= 1
      }
      if (robust && prevPos > end - w && prevPos < end &&
          hashes(prevPos) == hashes(minPos)) {
        // previous selection still in-window and still minimal: keep it
      } else {
        out.putIfAbsent(minPos, hashes(minPos))
        prevPos = minPos
      }
      end += 1
    }
    val rows = new Array[Any](out.size)
    val it = out.entrySet().iterator()
    var r = 0
    while (it.hasNext) {
      val e = it.next()
      rows(r) = org.apache.spark.sql.catalyst.InternalRow(
        e.getKey.intValue(), UTF8String.fromString(e.getValue))
      r += 1
    }
    new GenericArrayData(rows)
  }

  /** zlib compression ratio (deflated bytes / raw bytes) — the
    * RedPajama-v2 quality signal (Together 2023, after Rae et al.'s
    * repetition measures): heavily repetitive/boilerplate text
    * compresses far below natural prose, binary-ish noise compresses
    * above it. Deterministic for a fixed input (java.util.zip.Deflater
    * level 6, raw deflate); empty text maps to 1.0.
    */
  def deflateRatio(text: UTF8String): Double = {
    val bytes = text.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total.toDouble / bytes.length
  }

  /** Distinct word k-shingles in first-occurrence order — identical output
    * to `array_distinct(transform(...))` over the same tokens.
    */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i + k <= n) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** Codegen'd distinct word k-shingles over an `array<string>` column. */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"shingle width must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WordShingles expects ARRAY<STRING> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.shingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), k))
}

/** Codegen'd 64-bit SimHash over an `array<string>` token column.
  * (Historically a Scala UDF with the same kernel — measured necessary
  * because a 64-sum HashAggregate falls out of codegen and HOF lambdas are
  * interpreted; as an expression the kernel additionally avoids UDF boxing
  * and stays inside whole-stage codegen.)
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SimHash64 expects ARRAY<STRING> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}

/** Serializable Aho–Corasick automaton (Aho & Corasick 1975) over a
  * fixed phrase list with word-boundary semantics: patterns are matched
  * space-padded (` p `) against the space-padded text, so a phrase hits
  * whole-word sequences only. ONE pass over the text regardless of list
  * size — the multi-pattern scale path the per-phrase `contains` loop
  * (O(len·|list|)) can't reach at real blocklist sizes (the public C4
  * list alone is ~400 entries). Built once per executor (the expression
  * ships the phrase list; the automaton rebuilds lazily on first use).
  */
final class AhoCorasick(val phrases: Array[String]) extends Serializable {
  @transient private lazy val automaton: (Array[java.util.HashMap[Character, Integer]], Array[Int], Array[Array[Int]]) = {
    val padded = phrases.map(p => " " + p + " ")
    val next = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(Array.empty[Int])
    padded.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        val t = next(s).get(c)
        s = if (t != null) t.intValue()
        else {
          next += new java.util.HashMap[Character, Integer]()
          outB += Array.empty[Int]
          next(s).put(c, next.size - 1)
          next.size - 1
        }
      }
      outB(s) = outB(s) :+ pi
    }
    val fail = new Array[Int](next.size)
    val queue = new java.util.ArrayDeque[Integer]()
    next(0).forEach((_, v) => { fail(v) = 0; queue.add(v) })
    val out = outB.toArray
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      next(u).forEach { (c, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && next(f).get(c) == null) f = fail(f)
        val t = next(f).get(c)
        fail(v) = if (t != null && t != v) t.intValue() else 0
        if (out(fail(v)).nonEmpty) out(v) = out(v) ++ out(fail(v))
      }
    }
    (next.toArray, fail, out)
  }

  /** Matched ORIGINAL phrases in phrase-list order (each at most once) —
    * exactly the output of `phrases.filter(p => (" "+text+" ").contains(" "+p+" "))`.
    */
  def hits(text: UTF8String): ArrayData = {
    val (next, fail, out) = automaton
    val t = " " + text.toString + " "
    val seen = new java.util.BitSet(phrases.length)
    var s = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      var f = s
      while (f != 0 && next(f).get(c) == null) f = fail(f)
      val nx = next(f).get(c)
      s = if (nx != null) nx.intValue() else 0
      val o = out(s)
      var j = 0
      while (j < o.length) { seen.set(o(j)); j += 1 }
      i += 1
    }
    val res = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var p = seen.nextSetBit(0)
    while (p >= 0) {
      res += UTF8String.fromString(phrases(p))
      p = seen.nextSetBit(p + 1)
    }
    new GenericArrayData(res.toArray)
  }
}

/** Codegen'd word-boundary multi-phrase screen over a string column:
  * one Aho–Corasick pass per row, matched phrases in list order.
  */
case class WordPhraseHits(child: Expression, phrases: Array[String])
    extends UnaryExpression with Serializable {
  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.sorted.sameElements(phrases.distinct.sorted),
    "phrase list must be duplicate-free (list order defines output order)")
  private val ac = new AhoCorasick(phrases)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WordPhraseHits expects STRING input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    ac.hits(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
      s"${ev.value} = $ref.hits($c);"
    })
  override protected def withNewChildInternal(newChild: Expression): WordPhraseHits =
    copy(child = newChild)
}

object WordPhraseHits {
  def apply(text: Column, phrases: Seq[String]): Column =
    ColumnBridge.column(WordPhraseHits(ColumnBridge.expression(text), phrases.toArray))
}

/** Codegen'd zlib compression ratio over a string column — see
  * [[TextKernels.deflateRatio]].
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"DeflateRatio expects STRING input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateRatio {
  def apply(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))
}

/** Codegen'd winnowing fingerprint (Schleimer et al. 2003) over an
  * `array<string>` token column: `array<struct<pos:int, hash:string>>` of
  * selected (k-gram position, 16-hex-char md5 prefix) pairs. Tie rule:
  * rightmost minimum by default, the paper's robust re-selection rule
  * with `robust = true` — see [[TextKernels.winnow]].
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int,
    robust: Boolean = false)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"gram width must be >= 1, got $k")
  require(w >= 1, s"window width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("hash", StringType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WinnowFingerprint expects ARRAY<STRING> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.winnow(input.asInstanceOf[ArrayData], k, w, robust)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.winnow($c, $k, $w, $robust)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def apply(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprint(ColumnBridge.expression(tokens), k, w))
  def apply(tokens: Column, k: Int, w: Int, robust: Boolean): Column =
    ColumnBridge.column(
      WinnowFingerprint(ColumnBridge.expression(tokens), k, w, robust))
}

/** Codegen'd ALL-k-gram spans (position order, non-distinct) over an
  * `array<string>` column.
  */
case class WordSpans(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"span width must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WordSpans expects ARRAY<STRING> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.spansAll(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.spansAll($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): WordSpans =
    copy(child = newChild)
}

object WordSpans {
  def apply(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordSpans(ColumnBridge.expression(tokens), k))
}

/** Codegen'd text normalization — the standard first pass of a corpus
  * pipeline: Unicode NFC composition (é as one code point, not e+◌́),
  * control characters stripped, whitespace runs collapsed to single
  * spaces, ends trimmed. Semantics chosen to be engine-portable: the
  * DuckDB oracle reproduces it exactly with
  * `trim(regexp_replace(regexp_replace(nfc_normalize(t),
  * '[\x00-\x1f\x7f]', '', 'g'), '\s+', ' ', 'g'))`.
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"NormalizeText expects STRING input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  def apply(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))
}

/** Codegen'd max single-token frequency over an `array<string>` column. */
case class TokenTopCount(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TokenTopCount expects ARRAY<STRING> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.topTokenCount(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.TextKernels.topTokenCount($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenTopCount =
    copy(child = newChild)
}

object TokenTopCount {
  def apply(tokens: Column): Column =
    ColumnBridge.column(TokenTopCount(ColumnBridge.expression(tokens)))
}
