package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece training + encode: the likelihood-score ranking (including a
  * corpus where WordPiece and BPE provably choose DIFFERENT first merges),
  * the greedy longest-match encode goldens, the [UNK] whole-word rule,
  * vocabulary round-trip invariants over the fixture corpus, and
  * determinism under repartitioning.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def syms(word: String): Seq[String] = {
    val a = WordPieceCodec.initWord(UTF8String.fromString(word))
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }

  private def enc(word: String, vocab: Seq[String]): Seq[String] = {
    val set = new java.util.HashSet[String]()
    vocab.foreach(set.add)
    val a = WordPieceCodec.encode(UTF8String.fromString(word), set)
    (0 until a.numElements()).map(a.getUTF8String(_).toString)
  }

  test("initWord: first piece bare, continuations ##-prefixed, code points whole") {
    assert(syms("word") == Seq("w", "##o", "##r", "##d"))
    assert(syms("né") == Seq("n", "##é"))
    assert(syms("a😀b") == Seq("a", "##😀", "##b")) // surrogate pair stays whole
    assert(syms("x") == Seq("x"))
  }

  test("mergePair strips the continuation marker of the right piece") {
    val df = Seq(Seq("p", "##l", "##ay"), Seq("##i", "##ng", "##i", "##ng"))
      .toDF("syms")
    val m1 = df.select(WordPiece.mergePairCol(col("syms"), "##i", "##ng").as("m"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(m1 == Seq(Seq("p", "##l", "##ay"), Seq("##ing", "##ing")))
    assert(WordPieceCodec.mergedSymbol("play", "##ing") == "playing")
    assert(WordPieceCodec.mergedSymbol("##i", "##ng") == "##ing")
    assert(WordPieceCodec.mergedSymbol("a", "b") == "ab")
  }

  test("likelihood ranking: WordPiece and BPE pick provably different merges") {
    // {ab×10, cd×9}: pair counts favor (a,##b) 10 > (c,##d) 9, but the
    // WordPiece score is 10/(10·10) = 0.100 < 9/(9·9) = 0.111 — the
    // rarer-parts pair wins. This corpus SEPARATES the two trainers.
    val docs = Seq((Seq.fill(10)("ab") ++ Seq.fill(9)("cd")).mkString(" "))
      .toDF("text")
    val wp = WordPiece.trainMerges(docs, "text", nMerges = 2)
    assert(wp == Seq(
      (0, "c", "##d", "cd", 9L),
      (1, "a", "##b", "ab", 10L)))
    // same corpus, BPE: raw count argmax takes (a, b) first
    val bpe = Bpe.trainMerges(docs, "text", nMerges = 1)
    assert(bpe.head._2 == "a" && bpe.head._3 == "b")
  }

  test("training is deterministic under repartitioning") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val m1 = WordPiece.trainMerges(docs, "text", nMerges = 8)
    val m2 = WordPiece.trainMerges(docs.repartition(7), "text", nMerges = 8)
    assert(m1 == m2 && m1.length == 8)
  }

  test("greedy longest-match encode: BERT-style goldens") {
    // the canonical BERT example shape
    assert(enc("unaffable", Seq("un", "##aff", "##able"))
      == Seq("un", "##aff", "##able"))
    // LONGEST match wins over any shorter prefix
    assert(enc("abc", Seq("a", "ab", "abc", "##b", "##c")) == Seq("abc"))
    assert(enc("abd", Seq("a", "ab", "##d")) == Seq("ab", "##d"))
    // an unmatchable remainder makes the WHOLE word [UNK] — even when a
    // prefix matched
    assert(enc("abx", Seq("a", "ab")) == Seq(WordPieceCodec.Unk))
    assert(enc("xyz", Seq("a")) == Seq(WordPieceCodec.Unk))
    assert(enc("", Seq("a")) == Seq.empty)
    // continuation prefix is required after the first piece: bare "b" in
    // the vocab cannot match mid-word
    assert(enc("ab", Seq("a", "b")) == Seq(WordPieceCodec.Unk))
    assert(enc("ab", Seq("a", "##b")) == Seq("a", "##b"))
  }

  test("trained vocab round-trips the fixture corpus: tokens in vocab, " +
      "concatenation restores the word, UNK only without coverage") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (vocab, merges) = WordPiece.trainVocab(docs, "text", nMerges = 20)
    assert(merges.length == 20)
    assert(vocab.distinct.length == vocab.length, "vocab must not repeat")
    val vset = vocab.toSet
    // every merged token's text is the concat of its parts, ## stripped
    merges.foreach { case (_, a, b, m, _) =>
      assert(m == WordPieceCodec.mergedSymbol(a, b))
    }
    // encode a sample of real corpus words with the trained vocab
    val words = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().orderBy("w").limit(200)
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val pieces = enc(w, vocab)
      assert(pieces.nonEmpty)
      if (pieces != Seq(WordPieceCodec.Unk)) {
        pieces.foreach(p => assert(vset(p), s"token $p of '$w' not in vocab"))
        val restored = pieces.head + pieces.tail.map(
          _.stripPrefix(WordPieceCodec.Cont)).mkString
        assert(restored == w, s"round-trip broke: $w -> $pieces")
        // first piece bare, every later piece continuation-marked
        assert(!pieces.head.startsWith(WordPieceCodec.Cont))
        pieces.tail.foreach(p => assert(p.startsWith(WordPieceCodec.Cont)))
      }
      // the alphabet covers the corpus, so nothing can actually be UNK
      assert(pieces != Seq(WordPieceCodec.Unk),
        s"'$w' fell to UNK despite full alphabet coverage")
    }
    // the distributed codegen'd encoder agrees with the driver kernel
    val viaDf = spark.createDataset(words.toSeq).toDF("w")
      .select(col("w"), WordPiece.encodeCol(col("w"), vocab).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    words.foreach(w => assert(viaDf(w) == enc(w, vocab)))
  }

  test("minCount stops training before nMerges when pairs run dry") {
    val docs = Seq("aa bb").toDF("text") // every pair occurs once
    assert(WordPiece.trainMerges(docs, "text", nMerges = 5, minCount = 2).isEmpty)
  }

  test("encodeStats (distinct-word shape) equals the per-occurrence " +
      "transform exactly — greedy longest-match is a pure function of the word") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    val (vocab, _) = WordPiece.trainVocab(d, "text", nMerges = 20)
    val byWord = WordPiece.encodeStats(d, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(5)))
    val words = split(lower(col("text")), " ")
    val enc = transform(words, w => WordPiece.encodeCol(w, vocab))
    val nTok = aggregate(enc, lit(0L), (acc, a) => acc + size(a))
    val nUnk = aggregate(enc, lit(0L), (acc, a) =>
      acc + when(a === array(lit(WordPieceCodec.Unk)), 1L).otherwise(0L))
    val perOcc = d.select(col("doc_id"),
        size(words).cast("long").as("n_words"), nTok.as("n_wp_tokens"),
        nUnk.as("unk_words"),
        array_join(element_at(enc, 1), " ").as("first_word_pieces"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(byWord.length == perOcc.length && byWord.length > 0)
    assert(byWord.toSeq == perOcc.toSeq,
      "distinct-word encode must be row-identical to per-occurrence")
  }
}
