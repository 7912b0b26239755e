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
}
