package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Value-level gate on q247's containment-drop policy
  * ([[LlmQueries.curationContainmentDrops]]): the sf fixtures' planted
  * containments are all ONE-WAY (the oracle exercises that arm), so the
  * MUTUAL-containment exemption (r12 ADVICE — two near-identical
  * survivors each ≥ 80% contained in the other must not both drop) is
  * pinned here on hand-built corpora where the expected drop set is
  * derivable by hand.
  */
class CurationPolicySpec extends SparkSpec {

  private def drops(docs: Seq[(Long, String)]): Set[Long] = {
    import spark.implicits._
    LlmQueries.curationContainmentDrops(docs.toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
  }

  // 10 words -> 8 trigrams; "base plus one appended word" shares all 8
  private val base = (1 to 10).map(i => s"w$i").mkString(" ")

  test("mutual containment keeps the canonical (longer) member") {
    // containment(1→2) = 8/8, containment(2→1) = 8/9 — mutual; doc 2 is
    // longer, so doc 1 drops and doc 2 survives (the old undirected rule
    // dropped BOTH and lost the content entirely)
    val d = Seq(1L -> base, 2L -> s"$base w11", 3L -> "completely different text with none of those words here")
    assert(drops(d) == Set(1L))
  }

  test("equal-length mutual containment keeps the lower id") {
    // a rotation shares 7 of 8 trigrams each way (7/8 = 0.875 ≥ 0.8) and
    // the texts are byte-equal in length — the tie breaks to the lower id
    val words = (1 to 10).map(i => f"v$i%02d")
    val a = words.mkString(" ")
    val b = (words.tail :+ words.head).mkString(" ")
    assert(a.length == b.length)
    val d = Seq(5L -> a, 6L -> b)
    assert(drops(d) == Set(6L))
  }

  test("one-way containment still drops unconditionally (the quote case)") {
    // doc 3 is a strict prefix of the much longer doc 4: containment(3→4)
    // = 1, containment(4→3) well under 0.8 — no exemption applies
    val long = (1 to 40).map(i => s"q$i").mkString(" ")
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val d = Seq(3L -> quote, 4L -> long)
    assert(drops(d) == Set(3L))
  }

  test("a chain of mutual pairs drops everything but each pair's canonical") {
    // two independent mutual pairs in one corpus: each keeps its own
    // canonical; drops never leak across pairs
    val other = (1 to 10).map(i => s"z$i").mkString(" ")
    val d = Seq(1L -> base, 2L -> s"$base w11",
      7L -> other, 8L -> s"$other z11")
    assert(drops(d) == Set(1L, 7L))
  }
}
