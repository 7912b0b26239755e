package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Model-equivalence properties for the unigram Viterbi kernel — pure JVM
  * calls, no Spark session: the DP must equal a brute-force enumeration
  * of EVERY segmentation on short words, and its structural invariants
  * must hold on arbitrary input.
  */
object UnigramProps extends Properties("UnigramViterbi") {

  private val alphabet = Seq("a", "b", "c")

  /** Random vocabulary over {a,b,c}-substrings up to length 3, with all
    * single chars present (the trainer's totality invariant).
    */
  private val vocabGen: Gen[Map[String, Double]] = for {
    nMulti <- Gen.choose(0, 8)
    multis <- Gen.listOfN(nMulti, for {
      len <- Gen.choose(2, 3)
      cs <- Gen.listOfN(len, Gen.oneOf(alphabet))
    } yield cs.mkString)
    probs <- Gen.listOfN(3 + nMulti, Gen.choose(-9.0, -0.5))
  } yield (alphabet ++ multis).distinct.zip(probs).toMap

  private val wordGen: Gen[String] =
    Gen.choose(0, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alphabet)).map(_.mkString))

  private def jmap(m: Map[String, Double]): java.util.HashMap[String, java.lang.Double] = {
    val j = new java.util.HashMap[String, java.lang.Double]()
    m.foreach { case (k, v) => j.put(k, java.lang.Double.valueOf(v)) }
    j
  }

  /** Every segmentation of `w` into vocab pieces (maxLen-bounded). */
  private def allSegmentations(w: String, vocab: Map[String, Double],
      maxLen: Int): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      val head = w.substring(0, l)
      if (!vocab.contains(head)) Nil
      else allSegmentations(w.substring(l), vocab, maxLen).map(head :: _)
    }

  property("DP score equals the brute-force max over all segmentations") =
    forAll(vocabGen, wordGen) { (vocab, w) =>
      val (pieces, score) = UnigramCodec.viterbi(w, jmap(vocab), 3)
      val all = allSegmentations(w, vocab, 3)
        .map(seg => seg.map(vocab).sum)
      // chars are always in vocab, so at least one segmentation exists
      val best = if (w.isEmpty) 0.0 else all.max
      math.abs(score - best) < 1e-9 &&
        math.abs(pieces.map(vocab).sum - score) < 1e-9
    }

  property("concatenation restores the word; every piece is in-vocab") =
    forAll(vocabGen, wordGen) { (vocab, w) =>
      val (pieces, _) = UnigramCodec.viterbi(w, jmap(vocab), 3)
      pieces.mkString == w && pieces.forall(vocab.contains)
    }

  property("banWhole only matters for whole-word pieces") =
    forAll(vocabGen, wordGen) { (vocab, w) =>
      val j = jmap(vocab)
      val plain = UnigramCodec.viterbi(w, j, 3)._2
      val banned = UnigramCodec.viterbi(w, j, 3, banWhole = true)._2
      if (w.length > 3 || w.isEmpty || !vocab.contains(w)) banned == plain
      else banned <= plain // forbidding a candidate can only lower the max
    }

  property("OOV chars segment with UnkScore, never crash") =
    forAll(Gen.listOf(Gen.oneOf("a", "z", "?")).map(_.mkString)) { w =>
      val j = jmap(Map("a" -> -1.0))
      val (pieces, score) = UnigramCodec.viterbi(w, j, 3)
      val nUnk = w.count(_ != 'a')
      pieces.mkString == w &&
        math.abs(score - (-1.0 * (w.length - nUnk) +
          UnigramCodec.UnkScore * nUnk)) < 1e-6
    }
}
