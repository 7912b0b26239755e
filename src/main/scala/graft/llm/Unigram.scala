package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM segmentation kernels (Kudo 2018, "Subword Regularization" —
  * the SentencePiece unigram model; public algorithm). Pure, driven from
  * the codegen'd expression below.
  *
  * Determinism contract (everything the spec pins):
  * - Viterbi DP scans positions left to right and candidate piece lengths
  *   LONGEST FIRST with strict-improvement updates, so on an exact score
  *   tie the segmentation with the longer final piece wins.
  * - All logs go through `StrictMath.log` — bit-identical across JVMs.
  * - An out-of-vocabulary single character scores [[UnigramCodec.UnkScore]]
  *   (training seeds every character, so this only fires on encode).
  */
object UnigramCodec {

  /** Penalty for an out-of-vocabulary single character at encode time —
    * harsh enough that any in-vocab path beats it, finite so unseen input
    * still segments instead of failing.
    */
  final val UnkScore: Double = -1e4

  /** Code-point boundary offsets of `s`: 0, …, s.length (surrogate-safe). */
  private def boundaries(s: String): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = 0
    out += 0
    while (i < s.length) { i += Character.charCount(s.codePointAt(i)); out += i }
    out.result()
  }

  /** Viterbi-best segmentation of `word` under piece log-probs; returns
    * (pieces, total score). `banWhole` disallows the single piece spanning
    * the whole word — the pruning loss's "segment without me" score.
    */
  def viterbi(word: String, vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int, banWhole: Boolean = false): (Array[String], Double) = {
    val bs = boundaries(word)
    val n = bs.length - 1
    if (n == 0) return (Array.empty, 0.0)
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      dp(i) = Double.NegativeInfinity
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val piece = word.substring(bs(i - l), bs(i))
        val hit = vocab.get(piece)
        val lp =
          if (hit != null) hit.doubleValue()
          else if (l == 1) UnkScore
          else Double.NegativeInfinity
        if (lp > Double.NegativeInfinity &&
            !(banWhole && l == n && i == n)) {
          val cand = dp(i - l) + lp
          if (cand > dp(i)) { dp(i) = cand; back(i) = i - l }
        }
        l -= 1
      }
      i += 1
    }
    var at = n
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    while (at > 0) { parts += word.substring(bs(back(at)), bs(at)); at = back(at) }
    (parts.reverseIterator.toArray, dp(n))
  }

  /** Expression entry point: UTF8String word → ARRAY<STRING> pieces. */
  def segment(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData = {
    val (pieces, _) = viterbi(word.toString, vocab, maxLen)
    new GenericArrayData(pieces.map(p => UTF8String.fromString(p): Any))
  }
}

/** Codegen'd unigram Viterbi segmentation: STRING → ARRAY<STRING>. The
  * vocabulary rides along as a reference object (same idiom as
  * [[BpeEncodeWord]]'s merge table).
  */
case class UnigramSegmentWord(child: Expression,
    vocab: Seq[(String, Double)], maxLen: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"UnigramSegmentWord expects STRING input, got ${child.dataType.sql}")
  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
    m
  }
  override protected def nullSafeEval(input: Any): Any =
    UnigramCodec.segment(input.asInstanceOf[UTF8String], table, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", table, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.llm.UnigramCodec.segment($c, $ref, $maxLen)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentWord =
    copy(child = newChild)
}

/** Unigram-LM tokenizer TRAINING, Spark-first (Kudo 2018; the
  * seed-then-EM-then-prune loop every production unigram trainer runs) —
  * the tokenizer family's second member beside [[Bpe]], completing the
  * choice a data pipeline actually makes (BPE vs unigram).
  *
  * Scale design — the exact [[Bpe]] contract: the corpus is touched ONCE
  * (the word histogram's explode+groupBy shuffle); seeding and every
  * E-step then run on that vocab-scale table (Heaps' law — ≤ a few
  * million rows at any corpus size), and each driver collect is bounded
  * by the CURRENT VOCABULARY (piece, count) — the same bounded metadata
  * contract as the BPE argmax and the IVF trainer sample. The number of
  * Spark jobs is rounds × emIters, rounds ≈ log(seed/target)/log(1/shrink).
  *
  * Hard-EM (Viterbi counts) rather than full forward-backward: expected
  * counts are integer sums of word counts, so the distributed aggregation
  * is exact long arithmetic and partition-order-free — bit-deterministic
  * by construction, which the lattice-weighted E-step would not be under
  * double summation. The prune criterion is SentencePiece's: the corpus
  * log-likelihood lost by removing a piece, count(p)·(logθ(p) −
  * bestAltScore(p)), computed driver-side over the bounded vocabulary.
  */
object Unigram {

  def segmentCol(word: Column, vocab: Seq[(String, Double)], maxLen: Int): Column =
    ColumnBridge.column(UnigramSegmentWord(
      ColumnBridge.expression(word), vocab, maxLen))

  /** Corpus-wide encode statistics via the DISTINCT-WORD table (the q154
    * shape applied to the Viterbi kernel — see [[EncodeStats.over]]):
    * segmentation is pure in the word, so each distinct word is segmented
    * once and joined back. Output identical to the per-occurrence
    * `transform` form (UnigramSpec gates the equivalence):
    * (idCol, n_words, n_unigram_tokens, tokens_per_word,
    * first_word_pieces).
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Double)], maxLen: Int): DataFrame =
    EncodeStats.over(docs, idCol, split(lower(col(textCol)), " "),
        w => segmentCol(w, vocab, maxLen), unkToken = None)
      .select(col(idCol), col("n_words"),
        col("n_tokens").as("n_unigram_tokens"), col("tokens_per_word"),
        array_join(col("first_toks"), " ").as("first_word_pieces"))

  /** All substrings (code-point semantics) of length 1..maxLen of every
    * histogram word, weighted by word count — the seed candidate table.
    * Vocab-scale input, ≤ len·maxLen rows per word out.
    */
  def substringHistogram(words: DataFrame, maxLen: Int): DataFrame =
    words
      .select(col("n"), explode(expr(
        s"""flatten(transform(sequence(1, char_length(w)), i ->
           |  transform(sequence(1, least($maxLen, char_length(w) - i + 1)),
           |    l -> substring(w, i, l))))""".stripMargin)).as("sub"))
      .groupBy("sub").agg(sum(col("n")).as("cnt"))

  /** One vocabulary state: piece → (count, logprob), plus the pinned
    * emission order (count desc, piece asc).
    */
  final case class Vocab(pieces: Vector[(String, Long, Double)]) {
    def logProbs: Seq[(String, Double)] = pieces.map(p => (p._1, p._3))
    def toMap: java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
      pieces.foreach { case (p, _, lp) => m.put(p, java.lang.Double.valueOf(lp)) }
      m
    }
  }

  /** Train to `targetMulti` multi-character pieces (all seen single
    * characters always stay — segmentation must remain total). Returns
    * pieces ordered (count desc, piece asc) with final hard-EM counts and
    * log-probs. Deterministic end to end: every tie-break is pinned
    * (seed: score desc / piece asc; prune: loss desc / count desc /
    * piece asc; DP: longest-piece-on-tie), counts are exact longs, logs
    * are StrictMath.
    */
  def train(docs: DataFrame, textCol: String, targetMulti: Int,
      seedSize: Int = 1000, maxPieceLen: Int = 8, emIters: Int = 2,
      shrink: Double = 0.75): Vocab = {
    require(targetMulti >= 0 && seedSize > 0 && maxPieceLen >= 2)
    require(shrink > 0 && shrink < 1, s"shrink must be in (0,1), got $shrink")
    val words = Bpe.wordHistogram(docs, textCol).localCheckpoint()
    try {
      val subs = substringHistogram(words, maxPieceLen)
      // chars: every distinct character, unconditionally (bounded by the
      // alphabet); multi seeds: top seedSize by the SentencePiece score
      // freq·len, ties to the lexicographically smaller piece
      val chars = subs.filter(length(col("sub")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val multi = subs.filter(length(col("sub")) > 1)
        .orderBy((col("cnt") * length(col("sub"))).desc, col("sub").asc)
        .limit(seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      var vocab = normalize((chars ++ multi).toVector.map {
        case (p, c) => (p, c, 0.0)
      })

      def emStep(): Vocab = {
        var v = vocab
        for (_ <- 1 to emIters) {
          val counts = words
            .select(col("n"),
              explode(segmentCol(col("w"), v.logProbs, maxPieceLen)).as("p"))
            .groupBy("p").agg(sum(col("n")).as("c"))
            .collect().map(r => (r.getString(0), r.getLong(1))).toMap
          v = normalize(v.pieces.map { case (p, _, _) =>
            (p, counts.getOrElse(p, 0L), 0.0)
          })
        }
        v
      }

      vocab = emStep()
      var aliveMulti = vocab.pieces.count(p => isMulti(p._1))
      while (aliveMulti > targetMulti) {
        val keepCount = math.max(targetMulti,
          math.ceil(aliveMulti * shrink).toInt - 1) // strict progress
        val m = vocab.toMap
        // loss of removing p = count·(logθ(p) − best segmentation of p's
        // text WITHOUT the whole-word piece p); zero-count pieces lose 0
        val scoredMulti = vocab.pieces.filter(p => isMulti(p._1)).map {
          case (p, c, lp) =>
            val alt = UnigramCodec.viterbi(p, m, maxPieceLen, banWhole = true)._2
            val loss = if (c == 0L) Double.NegativeInfinity else c * (lp - alt)
            (p, c, loss)
        }
        val kept = scoredMulti
          .sortBy { case (p, c, loss) => (-loss, -c, p) }
          .take(keepCount).map(_._1).toSet
        vocab = Vocab(vocab.pieces.filter { case (p, _, _) =>
          !isMulti(p) || kept(p)
        })
        vocab = emStep()
        aliveMulti = vocab.pieces.count(p => isMulti(p._1))
      }
      vocab
    } finally words.unpersist()
  }

  private def isMulti(p: String): Boolean = p.codePointCount(0, p.length) > 1

  /** logθ = StrictMath.log(count/total). A zero-count MULTI piece is
    * DROPPED — hard-EM never picked it, so it is unreachable dead weight
    * (this is why the trained size is "at most targetMulti"); a zero-count
    * char gets a floor instead (chars must stay so segmentation remains
    * total). Emission order pinned: (count desc, piece asc).
    */
  private def normalize(raw: Vector[(String, Long, Double)]): Vocab = {
    val total = raw.iterator.map(_._2).sum.toDouble
    val floor = StrictMath.log(0.5 / math.max(total, 1.0))
    Vocab(raw.flatMap { case (p, c, _) =>
      if (c > 0L) Some((p, c, StrictMath.log(c.toDouble / total)))
      else if (isMulti(p)) None
      else Some((p, c, floor))
    }.sortBy { case (p, c, _) => (-c, p) })
  }
}
