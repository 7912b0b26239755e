package graft.llm

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Model-equivalence properties for the codegen'd text kernels — pure
  * JVM calls, no Spark session: each kernel must equal the obvious
  * Scala-collections model on random token arrays.
  */
object TextKernelProps extends Properties("TextKernels") {

  private val token: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "c", "the", "x1"),
    Gen.alphaNumStr.map(_.take(8)))
  private val tokens: Gen[List[String]] = Gen.listOf(token)

  private def arr(ts: List[String]): ArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t): AnyRef).toArray)

  private def strings(a: ArrayData): Seq[String] =
    (0 until a.numElements()).map(a.getUTF8String(_).toString)

  property("shingles == distinct sliding k-grams (first-occurrence order)") =
    forAll(tokens, Gen.choose(1, 5)) { (ts, k) =>
      val got = strings(TextKernels.shingles(arr(ts), k))
      val want = ts.sliding(k).filter(_.size == k).map(_.mkString(" ")).toList.distinct
      got == want
    }

  property("spansAll == every sliding k-gram, position order, duplicates kept") =
    forAll(tokens, Gen.choose(1, 5)) { (ts, k) =>
      val got = strings(TextKernels.spansAll(arr(ts), k))
      val want = ts.sliding(k).filter(_.size == k).map(_.mkString(" ")).toList
      got == want
    }

  property("topTokenCount == max groupBy count (0 on empty)") =
    forAll(tokens) { ts =>
      val got = TextKernels.topTokenCount(arr(ts))
      val want = if (ts.isEmpty) 0 else ts.groupBy(identity).values.map(_.size).max
      got == want
    }

  property("simhash64 is token-order invariant and deterministic") =
    forAll(tokens) { ts =>
      val h = TextKernels.simhash64(arr(ts))
      h == TextKernels.simhash64(arr(ts)) &&
        h == TextKernels.simhash64(arr(scala.util.Random.shuffle(ts)))
    }

  // ---- winnowing (Schleimer et al. 2003) ----

  private def md5Prefix(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
  }

  /** The naive model: every full window of w gram hashes, rightmost
    * minimum, distinct positions — the definition, written without any of
    * the kernel's code.
    */
  private def winnowModel(ts: List[String], k: Int, w: Int): Set[(Int, String)] = {
    val hs = ts.sliding(k).filter(_.size == k).map(g => md5Prefix(g.mkString(" "))).toVector
    if (hs.length < w) Set.empty
    else (0 to hs.length - w).map { a =>
      val win = (a until a + w).map(p => (p, hs(p)))
      val minH = win.map(_._2).min
      win.filter(_._2 == minH).maxBy(_._1) // rightmost tie
    }.toSet
  }

  private def winnowGot(ts: List[String], k: Int, w: Int): Set[(Int, String)] = {
    val out = TextKernels.winnow(arr(ts), k, w)
    (0 until out.numElements()).map { i =>
      val row = out.getStruct(i, 2)
      (row.getInt(0), row.getUTF8String(1).toString)
    }.toSet
  }

  property("winnow == naive all-windows rightmost-min model") =
    forAll(tokens, Gen.choose(1, 4), Gen.choose(1, 6)) { (ts, k, w) =>
      winnowGot(ts, k, w) == winnowModel(ts, k, w)
    }

  property("winnow guarantees a selection in every full window") =
    forAll(tokens, Gen.choose(2, 6)) { (ts, w) =>
      val k = 3
      val ng = ts.length - k + 1
      val sel = winnowGot(ts, k, w).map(_._1)
      ng < w || (0 to ng - w).forall(a => (a until a + w).exists(sel))
    }

  property("a shared token run of >= k+w-1 shares a fingerprint hash") =
    forAll(tokens.suchThat(_.length >= 6), tokens, tokens) { (ts, pre, suf) =>
      val (k, w) = (3, 4)
      val run = ts.take(k + w - 1) // 6 tokens = exactly one full window of grams
      val doc2 = pre ++ run ++ suf
      val h1 = winnowGot(ts, k, w).map(_._2)
      val h2 = winnowGot(doc2, k, w).map(_._2)
      (h1 & h2).nonEmpty
    }

  property("winnow with fewer grams than one full window is empty") =
    forAll(Gen.choose(0, 10), Gen.choose(2, 6)) { (n0, w) =>
      val n = math.min(n0, w + 1) // ng = n - 2 <= w - 1 < w
      val ts = List.tabulate(n)(i => s"t$i")
      TextKernels.winnow(arr(ts), 3, w).numElements() == 0
    }

  // ---- robust tie rule (Schleimer et al. 2003, Fig. 6) ----

  private def winnowRobust(ts: List[String], k: Int, w: Int): Set[(Int, String)] = {
    val out = TextKernels.winnow(arr(ts), k, w, robust = true)
    (0 until out.numElements()).map { i =>
      val row = out.getStruct(i, 2)
      (row.getInt(0), row.getUTF8String(1).toString)
    }.toSet
  }

  property("robust positions are a subset of plain positions") =
    forAll(tokens, Gen.choose(1, 4), Gen.choose(1, 6)) { (ts, k, w) =>
      // The else branch computes the identical rightmost-min selection as
      // the plain rule; robust only ever *skips* recording, never records
      // a position plain would not.
      winnowRobust(ts, k, w).subsetOf(winnowGot(ts, k, w))
    }

  property("robust and plain select the same hash SET") =
    forAll(tokens, Gen.choose(1, 4), Gen.choose(1, 6)) { (ts, k, w) =>
      // Per window both rules select a hash equal to the window minimum,
      // so the distinct hashes (the dedup signal) are identical.
      winnowRobust(ts, k, w).map(_._2) == winnowGot(ts, k, w).map(_._2)
    }

  property("robust still guarantees a selection in every full window") =
    forAll(tokens, Gen.choose(2, 6)) { (ts, w) =>
      val k = 3
      val ng = ts.length - k + 1
      val sel = winnowRobust(ts, k, w).map(_._1)
      ng < w || (0 to ng - w).forall(a => (a until a + w).exists(sel))
    }

  property("robust == plain on tie-free (all-distinct-gram) input") =
    forAll(Gen.choose(0, 40), Gen.choose(1, 4), Gen.choose(1, 6)) { (n, k, w) =>
      val ts = List.tabulate(n)(i => s"t$i") // every k-gram distinct
      winnowRobust(ts, k, w) == winnowGot(ts, k, w)
    }

  property("robust is strictly denser-reducing on a constant-token run") =
    forAll(Gen.choose(12, 40), Gen.choose(2, 5)) { (n, w) =>
      // "a a a ... a": every gram hash ties, so plain records the rightmost
      // minimum of each window (a new position per window) while robust
      // keeps re-selecting one position per w-run.
      val ts = List.fill(n)("a")
      winnowRobust(ts, 3, w).size < winnowGot(ts, 3, w).size
    }

  // ---- Aho–Corasick phrase screen (q173) ----

  private val word: Gen[String] = Gen.oneOf("a", "b", "ab", "ba", "c", "the")
  private val phraseGen: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  property("AhoCorasick.hits == the naive space-padded contains filter") =
    forAll(Gen.listOf(word).map(_.mkString(" ")),
      Gen.nonEmptyListOf(phraseGen).map(_.distinct)) { (text, phrases) =>
      val ac = new AhoCorasick(phrases.toArray)
      val got = {
        val out = ac.hits(UTF8String.fromString(text))
        (0 until out.numElements()).map(out.getUTF8String(_).toString).toList
      }
      val padded = " " + text + " "
      val want = phrases.filter(p => padded.contains(" " + p + " "))
      got == want
    }

  property("overlapping and nested phrases all surface in one pass") =
    forAll(Gen.const(())) { _ =>
      val ac = new AhoCorasick(Array("a b", "b c", "a b c", "c", "x y"))
      val out = ac.hits(UTF8String.fromString("a b c d"))
      val got = (0 until out.numElements()).map(out.getUTF8String(_).toString).toList
      got == List("a b", "b c", "a b c", "c")
    }

  // ---- compression-ratio quality signal (q184) ----

  property("deflateRatio: deterministic, positive, 1.0 on empty") =
    forAll(Gen.asciiPrintableStr) { s =>
      val r = TextKernels.deflateRatio(UTF8String.fromString(s))
      r == TextKernels.deflateRatio(UTF8String.fromString(s)) &&
        r > 0.0 && (s.nonEmpty || r == 1.0)
    }

  property("deflateRatio orders repetitive < natural < random-noise text") =
    forAll(Gen.choose(1, 40)) { n =>
      val rep = ("spark " * (50 + n)).trim
      val nat = (0 until (50 + n)).map(i => s"w${i * 7919 % 997}").mkString(" ")
      val rnd = new scala.util.Random(n)
      val noise = Array.fill(rep.length)((33 + rnd.nextInt(94)).toChar).mkString
      val (a, b, c) = (
        TextKernels.deflateRatio(UTF8String.fromString(rep)),
        TextKernels.deflateRatio(UTF8String.fromString(nat)),
        TextKernels.deflateRatio(UTF8String.fromString(noise)))
      a < b && b < c
    }
}
