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
}
