package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** BPE training + encode: kernel semantics, the classic textbook corpus
  * golden, the encode≡train consistency invariant, and determinism under
  * repartitioning.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def syms(word: String): Seq[String] = {
    val a = BpeCodec.initWord(org.apache.spark.unsafe.types.UTF8String.fromString(word))
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }

  test("initWord splits code points and appends the end-of-word marker") {
    assert(syms("low") == Seq("l", "o", "w", "</w>"))
    assert(syms("né") == Seq("n", "é", "</w>"))
    assert(syms("a😀b") == Seq("a", "😀", "b", "</w>")) // surrogate pair
  }

  test("mergePair merges left-to-right, non-overlapping") {
    val df = Seq(Seq("a", "a", "a"), Seq("x", "a", "a", "y", "a", "a"))
      .toDF("syms").select(Bpe.mergePairCol(col("syms"), "a", "a").as("m"))
    assert(df.collect().map(_.getSeq[String](0)).toSeq ==
      Seq(Seq("aa", "a"), Seq("x", "aa", "y", "aa")))
  }

  // the Sennrich et al. 2016 worked example: {low×5, lower×2, newest×6,
  // widest×3} — (e,s)=9 merges first, then (es,t), (est,</w>), then the
  // l-o-w family at 7
  private def corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
    .map(w => s" $w ").mkString

  test("textbook corpus trains the known merge sequence with exact counts") {
    val docs = Seq(corpus).toDF("text")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 5)
    assert(merges == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "est", "</w>", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)))
  }

  test("encode with the trained table reproduces the trained symbols") {
    val docs = Seq(corpus).toDF("text")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 8)
    val table = merges.map(m => (m._2, m._3))
    // re-train the word table to its final state and compare per word
    var words = Bpe.wordHistogram(docs, "text")
      .select(col("w"), Bpe.initWordCol(col("w")).as("syms"))
    table.foreach { case (a, b) =>
      words = words.select(col("w"), Bpe.mergePairCol(col("syms"), a, b).as("syms"))
    }
    val trained = words.collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val encoded = Bpe.wordHistogram(docs, "text")
      .select(col("w"), Bpe.encodeCol(col("w"), table).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(encoded == trained)
    // 8 merges fully collapse the most frequent word on this tiny corpus
    assert(encoded("newest") == Seq("newest</w>"))
    // a 3-merge table stops at the suffix stage
    val enc3 = Bpe.wordHistogram(docs, "text")
      .select(col("w"), Bpe.encodeCol(col("w"), table.take(3)).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc3("newest") == Seq("n", "e", "w", "est</w>"))
  }

  test("training is deterministic under repartitioning") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(120)
    val a = Bpe.trainMerges(docs, "text", nMerges = 10)
    val b = Bpe.trainMerges(docs.repartition(7), "text", nMerges = 10)
    assert(a == b)
    assert(a.length == 10)
    // vocab grows by exactly one symbol per merge; counts never increase
    assert(a.map(_._4).sliding(2).forall(p => p.head >= p.last))
  }

  /** Train-side replay (rank-ordered mergePair fold) vs the encoder, both
    * driver-side on the raw kernels — the encode≡train invariant without
    * chaining 1000 codegen'd expressions.
    */
  private def assertEncodeEqualsTrain(words: Seq[String],
      merges: Seq[(String, String)]): Unit = {
    import org.apache.spark.unsafe.types.UTF8String
    val table = merges.map(m => Array(m._1, m._2)).toArray
    words.foreach { w =>
      var s: org.apache.spark.sql.catalyst.util.ArrayData =
        BpeCodec.initWord(UTF8String.fromString(w))
      merges.foreach { case (a, b) =>
        s = BpeCodec.mergePair(s, UTF8String.fromString(a), UTF8String.fromString(b))
      }
      val trained = (0 until s.numElements()).map(s.getUTF8String(_).toString)
      val e = BpeCodec.encode(UTF8String.fromString(w), table)
      val encoded = (0 until e.numElements()).map(e.getUTF8String(_).toString)
      assert(encoded == trained, s"word '$w': encode $encoded != train $trained")
    }
  }

  test("batched training: disjoint-prefix rounds, encode≡train, same head merge") {
    val docs = Seq(corpus).toDF("text")
    val b1 = Bpe.trainMerges(docs, "text", nMerges = 8)
    val b4 = Bpe.trainMerges(docs, "text", nMerges = 8, batch = 4)
    assert(b4.map(_._1) == (0 until b4.length), "ranks must stay contiguous")
    assert(b4.head == b1.head, "the top merge is the sequential argmax in any batch")
    assert(b4.map(m => (m._2, m._3)).distinct.size == b4.size, "no duplicate merges")
    val words = Bpe.wordHistogram(docs, "text").select("w")
      .collect().map(_.getString(0)).toSeq
    assertEncodeEqualsTrain(words, b4.map(m => (m._2, m._3)))
  }

  test("fixture corpus trains to full collapse; batched run holds invariants there") {
    // The driver's synthetic documents carry only 31 distinct words, so
    // BPE collapses the whole vocabulary (~105 merges) at ANY sf — train
    // past exhaustion and assert the stop is the true fixed point.
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.trainMerges(d, "text", nMerges = 1000, batch = 16, minCount = 1L)
    assert(merges.map(_._1) == (0 until merges.length), "contiguous ranks")
    assert(merges.map(m => (m._2, m._3)).distinct.size == merges.size, "no dup merges")
    val table = merges.map(m => (m._2, m._3))
    // exhaustion means every word encodes to exactly ONE symbol
    val multi = Bpe.wordHistogram(d, "text")
      .select(size(Bpe.encodeCol(col("w"), table)).as("k")).filter(col("k") > 1).count()
    assert(multi == 0, "training stopped before the vocabulary fully collapsed")
    val words = Bpe.wordHistogram(d, "text").select("w").orderBy("w")
      .collect().map(_.getString(0)).toSeq
    assertEncodeEqualsTrain(words, table)
  }

  test("1k-merge table at batch=32 holds every invariant (scale path)") {
    // A vocabulary rich enough to sustain 1000 ranks: 1500 seeded
    // pseudo-words (the fixture's 31-word vocab can't — see above).
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 1500).map { _ =>
      (0 until (6 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val docs = vocab.grouped(10).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.trainMerges(docs, "text", nMerges = 1000, batch = 32, minCount = 1L)
    assert(merges.length == 1000, s"expected the full 1000 ranks, got ${merges.length}")
    assert(merges.map(_._1) == (0 until 1000), "contiguous ranks")
    assert(merges.map(m => (m._2, m._3)).distinct.size == 1000, "no dup merges")
    val table = merges.map(m => (m._2, m._3))
    assertEncodeEqualsTrain(rnd.shuffle(vocab).take(200), table)
    // concatenation restores every word at 1k ranks
    val bad = docs.select(explode(split(col("text"), " ")).as("w"))
      .select(col("w"), concat_ws("", Bpe.encodeCol(col("w"), table)).as("joined"))
      .filter(col("joined") =!= concat(col("w"), lit(BpeCodec.EndOfWord)))
      .count()
    assert(bad == 0, "concatenation must restore word + </w> at 1k merges")
  }

  test("corpus encode restores every word on concatenation (q154 gate)") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.trainMerges(d, "text", nMerges = 20).map(m => (m._2, m._3))
    val bad = d.select(explode(split(col("text"), " ")).as("w"))
      .select(col("w"), concat_ws("", Bpe.encodeCol(col("w"), merges)).as("joined"))
      .filter(col("joined") =!= concat(col("w"), lit(BpeCodec.EndOfWord)))
      .count()
    assert(bad == 0, "BPE symbols must concatenate back to word + </w>")
    // and the q154 budget counts are conservative: >= 1 token per word,
    // <= the character count + marker per word
    val q = graft.SparkEntry.queries("q154_bpe_encode")(spark, "/root/testdata/sf0.001")
    val viol = q.filter(col("n_bpe_tokens") < col("n_words")).count()
    assert(viol == 0)
  }

  test("encodeStats (distinct-word shape) equals the per-occurrence " +
      "transform exactly — the kernel is a pure function of the word") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.trainMerges(d, "text", nMerges = 20).map(m => (m._2, m._3))
    val byWord = Bpe.encodeStats(d, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    val words = split(col("text"), " ")
    val enc = transform(words, w => Bpe.encodeCol(w, merges))
    val nBpe = aggregate(enc, lit(0L), (acc, a) => acc + size(a))
    val perOcc = d.select(col("doc_id"),
        size(words).cast("long").as("n_words"), nBpe.as("n_bpe_tokens"),
        array_join(element_at(enc, 1), " ").as("first_word_symbols"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(byWord.length == perOcc.length && byWord.length > 0)
    assert(byWord.toSeq == perOcc.toSeq,
      "distinct-word encode must be row-identical to per-occurrence")
  }
}
