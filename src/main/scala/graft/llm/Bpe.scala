package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels: initial word segmentation, one-pair merge,
  * and full ranked-merge encode. All pure, all driven from codegen'd
  * expressions below.
  */
object BpeCodec {

  /** End-of-word marker (the classic Sennrich et al. convention — public
    * algorithm, "Neural Machine Translation of Rare Words with Subword
    * Units", 2016): distinguishes "est</w>" (suffix) from "est" (prefix).
    */
  final val EndOfWord = "</w>"

  /** word → its initial symbol sequence: one symbol per code point, plus
    * the end-of-word marker.
    */
  def initWord(word: UTF8String): GenericArrayData = {
    val s = word.toString
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      out += UTF8String.fromString(s.substring(i, i + n))
      i += n
    }
    out += UTF8String.fromString(EndOfWord)
    new GenericArrayData(out.result())
  }

  /** Merge every non-overlapping adjacent (a, b) occurrence, scanning left
    * to right — the standard BPE merge step.
    */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms.getUTF8String(i) == a && syms.getUTF8String(i + 1) == b) {
        out += UTF8String.concat(a, b)
        i += 2
      } else {
        out += syms.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.result())
  }

  /** Encode one word with a ranked merge table: repeatedly apply the
    * best-ranked (lowest index) merge whose pair is adjacent somewhere in
    * the sequence, until none applies — byte-for-byte the trainer's fold,
    * so `encode(word)` equals the trained symbols of that word.
    */
  def encode(word: UTF8String, merges: Array[Array[String]]): GenericArrayData = {
    var syms = {
      val init = initWord(word)
      (0 until init.numElements()).map(init.getUTF8String).toVector
    }
    val rank = merges.iterator.zipWithIndex
      .map { case (m, i) => (m(0), m(1)) -> i }.toMap
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i).toString, syms(i + 1).toString)).foreach { r =>
          if (r < best) { best = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val a = UTF8String.fromString(merges(best)(0))
        val b = UTF8String.fromString(merges(best)(1))
        val merged = mergePair(new GenericArrayData(syms.toArray[Any]), a, b)
        syms = (0 until merged.numElements()).map(merged.getUTF8String).toVector
      }
    }
    new GenericArrayData(syms.toArray[Any])
  }
}

/** Codegen'd initial segmentation: STRING → ARRAY<STRING> symbols. */
case class BpeInitWord(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BpeInitWord expects STRING input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    BpeCodec.initWord(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.BpeCodec.initWord($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeInitWord =
    copy(child = newChild)
}

/** Codegen'd single-merge step: symbols → symbols with (a, b) merged. */
case class BpeMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"BpeMergePair expects ARRAY<STRING> input, got ${other.sql}")
  }
  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  override protected def nullSafeEval(input: Any): Any =
    BpeCodec.mergePair(input.asInstanceOf[ArrayData], ua, ub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("a", ua, "org.apache.spark.unsafe.types.UTF8String")
    val rb = ctx.addReferenceObj("b", ub, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.llm.BpeCodec.mergePair($c, $ra, $rb)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

/** Codegen'd ranked-merge encode: STRING word → ARRAY<STRING> tokens. */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BpeEncodeWord expects STRING input, got ${child.dataType.sql}")
  @transient private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray
  override protected def nullSafeEval(input: Any): Any =
    BpeCodec.encode(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.llm.BpeCodec.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

/** BPE tokenizer training, Spark-first (public algorithm: Sennrich et al.
  * 2016; the word-histogram-first formulation is how every production
  * trainer scales).
  *
  * Scale design: the corpus is touched EXACTLY ONCE — one explode+groupBy
  * shuffle builds the (word, count) histogram, which is vocab-scale
  * (≤ a few million rows at any corpus size; Heaps' law, not corpus
  * rows). Every training round then runs on that table: one pair-count
  * aggregation (pairs per word ≈ symbols−1, shrinking each round) and a
  * single-row argmax collect — the same bounded driver-side metadata as
  * the IVF trainer's sample. `localCheckpoint` cuts the per-round lineage
  * exactly like the connected-components loop.
  */
object Bpe {

  def initWordCol(word: Column): Column =
    ColumnBridge.column(BpeInitWord(ColumnBridge.expression(word)))

  def mergePairCol(syms: Column, a: String, b: String): Column =
    ColumnBridge.column(BpeMergePair(ColumnBridge.expression(syms), a, b))

  def encodeCol(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(word), merges))

  /** Lowercased whitespace word histogram — the one corpus-scale pass. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Train `nMerges` merges; returns (rank, left, right, pairCount).
    * Deterministic: ties break on (count desc, left asc, right asc).
    * Stops early when no adjacent pair occurs at least `minCount` times.
    *
    * `batch` > 1 is the large-vocabulary scale path: each round takes a
    * PREFIX of the ranked pair list whose pairs are pairwise
    * symbol-disjoint (selection stops at the first pair sharing a symbol
    * with an already-taken one) and applies them all before recounting —
    * one pair-count job + one checkpoint amortize over up to `batch`
    * merges, cutting the dominant per-merge driver-loop overhead ~batch×.
    * Disjointness means an applied merge cannot change a later-taken
    * pair's count, so within a round the counts recorded are the true
    * sequential ones; the (rare, documented) deviation from strict
    * sequential training is that a pair NEWLY CREATED by an earlier merge
    * in the same round (e.g. ("x", "ab") after ("a","b")) cannot win until
    * the next round. encode≡train and concatenation-restores-word hold for
    * ANY batch (the encoder replays ranks in order, exactly how the
    * trainer applied them); the default batch=1 is byte-exact classic BPE.
    */
  /** Corpus-wide encode statistics via the DISTINCT-WORD table (r14
    * verdict item 6): the ranked-merge kernel is the expensive per-row
    * work and a Zipf corpus repeats its words constantly, so encoding
    * every OCCURRENCE re-pays the kernel ~word-frequency times. Encode
    * each distinct word ONCE, then join the (word → token count) map
    * back through the doc word list and re-aggregate — the production
    * shape: the kernel cost is vocab-scale (Heaps' law), the per-
    * occurrence work collapses to a join + sum, and AQE broadcasts the
    * vocab side when it is small. Output identical to the
    * per-occurrence `transform` form because the kernel is a pure
    * function of the word (BpeSpec gates the equivalence):
    * (idCol, n_words, n_bpe_tokens, tokens_per_word,
    * first_word_symbols).
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    EncodeStats.over(docs, idCol, split(col(textCol), " "),
        w => encodeCol(w, merges), unkToken = None)
      .select(col(idCol), col("n_words"),
        col("n_tokens").as("n_bpe_tokens"), col("tokens_per_word"),
        array_join(col("first_toks"), " ").as("first_word_symbols"))

  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, batch: Int = 1,
      ckptEvery: Int = 5): Seq[(Int, String, String, Long)] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    require(ckptEvery >= 1, s"ckptEvery must be >= 1, got $ckptEvery")
    // Checkpoint CADENCE (r15 verdict item 3): an eager localCheckpoint
    // every round doubled the per-round job count, and the checkpoint is
    // pure lineage hygiene — the stacked mergePairCol projections compose
    // lazily and apply in the recorded order, so materializing every
    // ckptEvery-th round is output-identical (BpeSpec goldens gate it).
    // The last materialized frame stays alive until the NEXT checkpoint
    // lands: a localCheckpoint is unreliable (truncated lineage), so its
    // blocks must outlive every lazy plan built on top of them.
    var base = wordHistogram(docs, textCol)
      .select(initWordCol(col("w")).as("syms"), col("n"))
      .localCheckpoint()
    var words = base
    var sinceCkpt = 0
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val want = math.min(batch, nMerges - rank)
      // over-fetch: the disjoint prefix can be shorter than `want`
      val top = words
        .select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy("p.a", "p.b").agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= minCount)
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(math.max(want * 4, 8)).collect()
      // prefix-disjoint selection: stop at the first symbol collision so
      // every taken pair's count is untouched by the round's earlier merges
      val sel = Seq.newBuilder[(String, String, Long)]
      val used = scala.collection.mutable.Set.empty[String]
      var i = 0
      var nSel = 0
      var stopped = false
      while (!stopped && i < top.length && nSel < want) {
        val (a, b, cnt) = (top(i).getString(0), top(i).getString(1), top(i).getLong(2))
        if (used(a) || used(b)) stopped = true
        else { sel += ((a, b, cnt)); used += a; used += b; nSel += 1; i += 1 }
      }
      val taken = sel.result()
      if (taken.isEmpty) exhausted = true
      else {
        taken.foreach { case (a, b, cnt) => out += ((rank, a, b, cnt)); rank += 1 }
        val merged = taken.foldLeft(col("syms")) { case (c, (a, b, _)) =>
          mergePairCol(c, a, b)
        }
        val next = words.select(merged.as("syms"), col("n"))
        sinceCkpt += 1
        if (sinceCkpt >= ckptEvery) {
          words = next.localCheckpoint()
          base.unpersist()
          base = words
          sinceCkpt = 0
        } else words = next
      }
    }
    base.unpersist()
    out.result()
  }
}
