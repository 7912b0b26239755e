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
