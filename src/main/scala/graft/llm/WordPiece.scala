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

/** WordPiece kernels (Schuster & Nakajima 2012 — the BERT tokenizer; the
  * public algorithm as documented in the BERT paper and the HuggingFace
  * tokenizers reference): '##'-continuation initial segmentation,
  * likelihood-scored merging, and the PRODUCTION greedy
  * longest-match-first encode. The family's third member beside BPE
  * ([[BpeCodec]], raw-count argmax, '</w>' markers) and the unigram LM
  * ([[Unigram]], EM + Viterbi): WordPiece ranks a merge by
  * score = count(pair) / (count(left)·count(right)) — pairs win by how
  * much MORE often they co-occur than their parts predict, not by raw
  * frequency — and its encoder never replays merge ranks: inference is a
  * one-pass longest-prefix match against the final vocabulary.
  */
object WordPieceCodec {

  /** The BERT continuation prefix on every non-initial piece. */
  final val Cont = "##"

  /** BERT's whole-word fallback: any word with an unmatchable remainder
    * encodes as this single token.
    */
  final val Unk = "[UNK]"

  /** word → one symbol per code point, continuations '##'-prefixed
    * ("word" → [w, ##o, ##r, ##d]).
    */
  def initWord(word: UTF8String): GenericArrayData = {
    val s = word.toString
    val out = Array.newBuilder[Any]
    var i = 0
    var first = true
    while (i < s.length) {
      val n = Character.charCount(s.codePointAt(i))
      val piece = s.substring(i, i + n)
      out += UTF8String.fromString(if (first) piece else Cont + piece)
      first = false
      i += n
    }
    new GenericArrayData(out.result())
  }

  /** The merged token's text: right loses its continuation marker
    * (merging [play, ##ing] yields "playing"; [##i, ##ng] yields "##ing").
    */
  def mergedSymbol(a: String, b: String): String =
    a + (if (b.startsWith(Cont)) b.substring(Cont.length) else b)

  /** Merge every non-overlapping adjacent (a, b) into [[mergedSymbol]],
    * scanning left to right — the WordPiece counterpart of
    * [[BpeCodec.mergePair]] (which concatenates verbatim).
    */
  def mergePair(syms: ArrayData, a: UTF8String, b: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val out = Array.newBuilder[Any]
    var i = 0
    while (i < n) {
      if (i + 1 < n && syms.getUTF8String(i) == a && syms.getUTF8String(i + 1) == b) {
        out += UTF8String.fromString(
          mergedSymbol(syms.getUTF8String(i).toString, syms.getUTF8String(i + 1).toString))
        i += 2
      } else {
        out += syms.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.result())
  }

  /** PRODUCTION encode — greedy longest-match-first against the final
    * vocabulary (BERT's WordpieceTokenizer): repeatedly take the longest
    * prefix of the remainder that is in the vocab ('##'-prefixed after
    * the first piece); an unmatchable remainder makes the WHOLE word
    * [UNK]. One pass per word, no merge-rank replay — this is why
    * WordPiece inference is a hash-set lookup loop, not a priority
    * queue.
    */
  def encode(word: UTF8String, vocab: java.util.HashSet[String]): GenericArrayData = {
    val s = word.toString
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = Array.newBuilder[Any]
    var start = 0
    while (start < s.length) {
      var end = s.length
      var found: String = null
      while (found == null && end > start) {
        val cand = (if (start > 0) Cont else "") + s.substring(start, end)
        if (vocab.contains(cand)) found = cand else end -= 1
      }
      if (found == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
      out += UTF8String.fromString(found)
      start = end
    }
    new GenericArrayData(out.result())
  }
}

/** Codegen'd '##'-continuation segmentation: STRING → ARRAY<STRING>. */
case class WordPieceInit(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"WordPieceInit expects STRING input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    WordPieceCodec.initWord(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.WordPieceCodec.initWord($c)")
  override protected def withNewChildInternal(newChild: Expression): WordPieceInit =
    copy(child = newChild)
}

/** Codegen'd single-merge step with the '##'-stripping concat. */
case class WordPieceMergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"WordPieceMergePair expects ARRAY<STRING> input, got ${other.sql}")
  }
  @transient private lazy val ua = UTF8String.fromString(a)
  @transient private lazy val ub = UTF8String.fromString(b)
  override protected def nullSafeEval(input: Any): Any =
    WordPieceCodec.mergePair(input.asInstanceOf[ArrayData], ua, ub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ra = ctx.addReferenceObj("a", ua, "org.apache.spark.unsafe.types.UTF8String")
    val rb = ctx.addReferenceObj("b", ub, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.llm.WordPieceCodec.mergePair($c, $ra, $rb)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordPieceMergePair =
    copy(child = newChild)
}

/** Codegen'd greedy longest-match encode: STRING word → ARRAY<STRING>
  * pieces against a fixed vocabulary (rides the closure as one shared
  * HashSet — vocab-scale, the q138 bounded-metadata contract).
  */
case class WordPieceEncodeWord(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"WordPieceEncodeWord expects STRING input, got ${child.dataType.sql}")
  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  override protected def nullSafeEval(input: Any): Any =
    WordPieceCodec.encode(input.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.llm.WordPieceCodec.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeWord =
    copy(child = newChild)
}

/** WordPiece training, Spark-first, on the [[Bpe]] scale frame: the
  * corpus is touched exactly once (the same lowercased word histogram),
  * then each merge round runs ONE pair-count aggregation and ONE
  * symbol-count aggregation over the vocab-scale symbol table, joins
  * them, and collects the single argmax row — bounded driver metadata.
  *
  * The ranking is the WordPiece likelihood score
  * `count(pair) / (count(left)·count(right))`, computed as an exact
  * DECIMAL division (fixed scale) so ordering is bit-deterministic under
  * any partitioning; ties break (count desc, left asc, right asc).
  * Unlike the BPE trainer there is no batched-merge mode: applying a
  * merge changes its symbols' counts and therefore every OTHER pair's
  * score, so disjointness does not make batched scores sequential-exact
  * — rounds are strictly one merge each.
  */
object WordPiece {

  def initWordCol(word: Column): Column =
    ColumnBridge.column(WordPieceInit(ColumnBridge.expression(word)))

  def mergePairCol(syms: Column, a: String, b: String): Column =
    ColumnBridge.column(WordPieceMergePair(ColumnBridge.expression(syms), a, b))

  def encodeCol(word: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceEncodeWord(ColumnBridge.expression(word), vocab))

  /** Train `nMerges` merges; returns (rank, left, right, merged, cnt).
    * Stops early when no pair reaches `minCount`.
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L,
      ckptEvery: Int = 5): Seq[(Int, String, String, String, Long)] = {
    require(ckptEvery >= 1, s"ckptEvery must be >= 1, got $ckptEvery")
    // Checkpoint CADENCE (r15 verdict item 3, same as Bpe.trainMerges):
    // materialize the vocab-scale symbol table every ckptEvery-th round
    // only; in between, the mergePairCol projections compose lazily in
    // the recorded order — output-identical (WordPieceSpec goldens gate
    // it). The last checkpoint stays alive until the next one lands
    // (localCheckpoint lineage is truncated, blocks must outlive every
    // lazy plan built on them).
    var base = Bpe.wordHistogram(docs, textCol)
      .select(initWordCol(col("w")).as("syms"), col("n"))
      .localCheckpoint()
    var words = base
    var sinceCkpt = 0
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 0
    var exhausted = false
    // try/finally so a mid-round job failure still releases the current
    // localCheckpoint blocks (the Unigram.train discipline)
    try while (rank < nMerges && !exhausted) {
      val pairs = words
        .select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy("p.a", "p.b").agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= minCount)
      val symCounts = words
        .select(col("n"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum(col("n")).as("scnt"))
      // exact fixed-scale decimal score: deterministic ordering with no
      // float round-off ambiguity; the denominator product is DECIMAL so
      // two billion-count symbols cannot overflow a long
      val best = pairs
        .join(symCounts.withColumnRenamed("s", "a").withColumnRenamed("scnt", "ca"), "a")
        .join(symCounts.withColumnRenamed("s", "b").withColumnRenamed("scnt", "cb"), "b")
        .select(col("a"), col("b"), col("cnt"),
          (col("cnt").cast(DecimalType(38, 18)) /
            (col("ca").cast(DecimalType(19, 0)) * col("cb").cast(DecimalType(19, 0))))
            .as("score"))
        .orderBy(desc("score"), desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((rank, a, b, WordPieceCodec.mergedSymbol(a, b), cnt))
        rank += 1
        val next = words.select(mergePairCol(col("syms"), a, b).as("syms"), col("n"))
        sinceCkpt += 1
        if (sinceCkpt >= ckptEvery) {
          words = next.localCheckpoint()
          base.unpersist()
          base = words
          sinceCkpt = 0
        } else words = next
      }
    } finally { base.unpersist(); () }
    out.result()
  }

  /** Corpus-wide encode statistics via the DISTINCT-WORD table (the q154
    * shape applied to WordPiece — see [[EncodeStats.over]]): greedy
    * longest-match is pure in the word, so each distinct word is encoded
    * once and joined back. Output identical to the per-occurrence
    * `transform` form (WordPieceSpec gates the equivalence):
    * (idCol, n_words, n_wp_tokens, unk_words, tokens_per_word,
    * first_word_pieces).
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame =
    EncodeStats.over(docs, idCol, split(lower(col(textCol)), " "),
        w => encodeCol(w, vocab), unkToken = Some(WordPieceCodec.Unk))
      .select(col(idCol), col("n_words"),
        col("n_tokens").as("n_wp_tokens"), col("n_unk").as("unk_words"),
        col("tokens_per_word"),
        array_join(col("first_toks"), " ").as("first_word_pieces"))

  /** Train and return the full inference vocabulary: the corpus's initial
    * alphabet (every single-code-point piece, '##' forms included —
    * charset-scale) plus every merged token, in deterministic order
    * (alphabet sorted, then merges by rank).
    */
  def trainVocab(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): (Seq[String], Seq[(Int, String, String, String, Long)]) = {
    val alphabet = Bpe.wordHistogram(docs, textCol)
      .select(explode(initWordCol(col("w"))).as("s"))
      .distinct().orderBy("s")
      .collect().map(_.getString(0)).toSeq
    val merges = trainMerges(docs, textCol, nMerges, minCount)
    (alphabet ++ merges.map(_._4), merges)
  }
}
