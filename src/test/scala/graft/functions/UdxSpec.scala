package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WeightedMean's long buffer must be exact within its documented bound and
  * throw (not wrap) past it.
  */
class UdxSpec extends SparkSpec {
  import spark.implicits._

  test("weighted mean matches the exact decimal result") {
    val wm = udaf(new Udx.WeightedMean)
    val df = Seq((10.50, 2.0), (3.25, 4.0), (7.75, 1.0)).toDF("v", "w")
    val got = df.agg(wm($"v", $"w")).as[Double].head()
    val expect = (10.50 * 2.0 + 3.25 * 4.0 + 7.75 * 1.0) / 7.0
    assert(math.abs(got - expect) < 1e-12)
  }

  test("overflow past the scale-4 capacity throws instead of wrapping") {
    val a = new Udx.WeightedMean
    // v=9.2e12, w=100.00 -> v*w unscaled scale-4 = 9.2e14*1e4 > Long.MaxValue
    val big = (9.3e12, 100.0)
    intercept[ArithmeticException] {
      a.reduce(a.reduce(a.zero, big), big)
    }
    intercept[ArithmeticException] {
      val half = (Long.MaxValue / 2 + 1, 1L)
      a.merge(half, half)
    }
  }

  test("empty group yields NaN") {
    val a = new Udx.WeightedMean
    assert(a.finish(a.zero).isNaN)
  }
}
