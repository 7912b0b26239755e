package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Unigram-LM trainer (Kudo 2018) gates: Viterbi kernel semantics with
  * every tie-break pinned, handcrafted-corpus golden, partition
  * determinism, chars-never-pruned, and the segment≡final-counts
  * invariant that makes the trained vocabulary self-consistent.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def jmap(ps: (String, Double)*): java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double]()
    ps.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  // ---- Viterbi kernel ---------------------------------------------------

  test("viterbi picks the max-likelihood segmentation") {
    val v = jmap("a" -> -2.0, "b" -> -2.0, "ab" -> -1.0, "abc" -> -9.0, "c" -> -2.0)
    // "abc": ab+c = -3.0 beats a+b+c = -6.0 and abc = -9.0
    val (pieces, score) = UnigramCodec.viterbi("abc", v, 3)
    assert(pieces.toSeq == Seq("ab", "c") && score == -3.0)
  }

  test("exact score tie goes to the longer final piece (pinned DP rule)") {
    // "aa" as one piece scores exactly 2·logp(a): -4.0 both ways
    val v = jmap("a" -> -2.0, "aa" -> -4.0)
    val (pieces, score) = UnigramCodec.viterbi("aa", v, 2)
    assert(pieces.toSeq == Seq("aa") && score == -4.0)
  }

  test("unknown single chars score UnkScore; multi-char OOV never used") {
    val v = jmap("a" -> -1.0)
    val (pieces, score) = UnigramCodec.viterbi("axa", v, 3)
    assert(pieces.toSeq == Seq("a", "x", "a"))
    assert(score == -2.0 + UnigramCodec.UnkScore)
    // concatenation always restores the word
    assert(pieces.mkString == "axa")
  }

  test("banWhole forbids only the whole-word piece (the prune-loss score)") {
    val v = jmap("a" -> -2.0, "ab" -> -1.0, "b" -> -2.0)
    val withP = UnigramCodec.viterbi("ab", v, 2)._2
    val altP = UnigramCodec.viterbi("ab", v, 2, banWhole = true)._2
    assert(withP == -1.0 && altP == -4.0)
    // a piece inside a longer word is NOT banned
    val (pieces, _) = UnigramCodec.viterbi("aba", v, 2, banWhole = true)
    assert(pieces.toSeq == Seq("ab", "a"))
  }

  test("surrogate pairs segment on code-point boundaries") {
    val face = new String(Character.toChars(0x1F600))
    val v = jmap("a" -> -1.0, face -> -1.0, "a" + face -> -0.5)
    val (pieces, _) = UnigramCodec.viterbi("a" + face + "a", v, 2)
    assert(pieces.toSeq == Seq("a" + face, "a"))
    assert(pieces.mkString == "a" + face + "a")
  }

  // ---- trainer ----------------------------------------------------------

  private val tinyCorpus = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new").toDF("text")

  test("handcrafted-corpus golden: vocabulary, counts, and order pinned") {
    val v = Unigram.train(tinyCorpus, "text", targetMulti = 3,
      seedSize = 50, maxPieceLen = 6, emIters = 2)
    val multi = v.pieces.filter(_._1.length > 1)
    // hard-EM settles on the three dominant whole words; "lower" then
    // segments low+e+r and "new" as n+e+w — the golden, pinned exactly
    assert(multi.map(p => (p._1, p._2)) ==
      Vector(("low", 7L), ("newest", 6L), ("wider", 2L)))
    // every character survives alongside them
    val chars = v.pieces.filter(_._1.length == 1).map(_._1).toSet
    assert(chars == Set("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    // the characters hard-EM actually uses carry their exact counts
    assert(v.pieces.filter(_._1.length == 1).filter(_._2 > 0)
      .map(p => (p._1, p._2)).toSet ==
      Set(("e", 4L), ("n", 2L), ("r", 2L), ("w", 2L)))
    // counts are exact longs from the final E-step: verify against a
    // direct recount with the final vocabulary
    val counts = tinyCorpus
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val m = v.toMap
    val recount = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    counts.foreach { case (w, n) =>
      UnigramCodec.viterbi(w, m, 6)._1.foreach(p => recount(p) += n)
    }
    v.pieces.foreach { case (p, c, _) =>
      assert(recount(p) == c, s"piece $p: trained count $c != recount ${recount(p)}")
    }
    // emission order is pinned: (count desc, piece asc)
    val order = v.pieces.map { case (p, c, _) => (-c, p) }
    assert(order == order.sorted)
  }

  test("training is deterministic under partitioning") {
    val a = Unigram.train(tinyCorpus, "text", targetMulti = 3,
      seedSize = 50, maxPieceLen = 6)
    val b = Unigram.train(tinyCorpus.repartition(7), "text", targetMulti = 3,
      seedSize = 50, maxPieceLen = 6)
    assert(a.pieces == b.pieces) // bit-identical, logprobs included
  }

  test("chars are never pruned even at targetMulti = 0") {
    val v = Unigram.train(tinyCorpus, "text", targetMulti = 0,
      seedSize = 50, maxPieceLen = 6)
    assert(v.pieces.nonEmpty && v.pieces.forall(_._1.length == 1))
    // chars alone still segment everything (totality)
    val m = v.toMap
    assert(UnigramCodec.viterbi("newest", m, 6)._1.mkString == "newest")
  }

  test("corpus fixture trains and every piece is reachable") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val v = Unigram.train(docs, "text", targetMulti = 24,
      seedSize = 200, maxPieceLen = 6)
    assert(v.pieces.count(_._1.length > 1) == 24)
    // no dead weight in the shipped vocabulary: every multi piece was
    // actually used by the final E-step
    assert(v.pieces.filter(_._1.length > 1).forall(_._2 > 0L),
      v.pieces.filter(p => p._1.length > 1 && p._2 == 0L).take(5).toString)
    // distributed segmentation agrees with the driver kernel
    val seg = docs.limit(20)
      .select(col("doc_id"), flatten(transform(
        split(lower(col("text")), "\\s+"),
        w => Unigram.segmentCol(w, v.logProbs, 6))).as("pieces"))
      .as[(Long, Seq[String])].collect()
    val m = v.toMap
    val want = docs.limit(20).select(col("doc_id"), lower(col("text")))
      .as[(Long, String)].collect().map { case (id, text) =>
        (id, text.split("\\s+").filter(_.nonEmpty)
          .flatMap(w => UnigramCodec.viterbi(w, m, 6)._1).toSeq)
      }
    assert(seg.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq)
  }

  test("encodeStats (distinct-word shape) equals the per-occurrence " +
      "transform exactly — the Viterbi kernel is a pure function of the word") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val vocab = Unigram.train(d, "text", targetMulti = 24,
      seedSize = 200, maxPieceLen = 6).logProbs
    val byWord = Unigram.encodeStats(d, "doc_id", "text", vocab, 6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    val words = split(lower(col("text")), " ")
    val enc = transform(words, w => Unigram.segmentCol(w, vocab, 6))
    val nTok = aggregate(enc, lit(0L), (acc, a) => acc + size(a))
    val perOcc = d.select(col("doc_id"),
        size(words).cast("long").as("n_words"), nTok.as("n_unigram_tokens"),
        array_join(element_at(enc, 1), " ").as("first_word_pieces"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(byWord.length == perOcc.length && byWord.length > 0)
    assert(byWord.toSeq == perOcc.toSeq,
      "distinct-word segment must be row-identical to per-occurrence")
  }
}
