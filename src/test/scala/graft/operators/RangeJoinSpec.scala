package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join equals the naive theta join on every bin width. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

  test("timestampRangeJoin matches naive BETWEEN join across bin widths") {
    val left = Seq((1L, ts(100)), (2L, ts(250)), (3L, ts(1000)))
      .toDF("lid", "ts")
    val right = Seq((10L, ts(99)), (11L, ts(100)), (12L, ts(160)),
      (13L, ts(161)), (14L, ts(260)), (15L, ts(999)))
      .toDF("rid", "ts")
    val winUs = 60L * 1000000 // [ts, ts+60s]
    val naive = left.as("l").join(right.as("r"),
        col("r.ts") >= col("l.ts") &&
          unix_micros(col("r.ts")) <= unix_micros(col("l.ts")) + winUs)
      .select(col("l.lid"), col("r.rid"))
      .as[(Long, Long)].collect().toSet
    assert(naive == Set((1L, 11L), (1L, 12L), (2L, 14L)))
    for (binUs <- Seq(7L * 1000000, 60L * 1000000, 3600L * 1000000)) {
      val binned = RangeJoin
        .timestampRangeJoin(left, right, "ts", "ts", 0L, winUs, binUs)
        .select(col("l_lid"), col("r_rid"))
        .as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidthUs=$binUs")
    }
  }

  test("randomized equivalence: binned == naive over random data/windows/bins") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val left = (1 to 40).map(i => (i.toLong, ts(rnd.nextInt(5000).toLong))).toDF("lid", "ts")
      val right = (1 to 60).map(i => (i.toLong, ts(rnd.nextInt(5000).toLong))).toDF("rid", "ts")
      val lo = (rnd.nextInt(120) - 60).toLong * 1000000
      val hi = lo + rnd.nextInt(300).toLong * 1000000
      val binUs = (rnd.nextInt(200) + 1).toLong * 1000000
      val naive = left.as("l").join(right.as("r"),
          unix_micros(col("r.ts")) >= unix_micros(col("l.ts")) + lo &&
            unix_micros(col("r.ts")) <= unix_micros(col("l.ts")) + hi)
        .select(col("l.lid"), col("r.rid")).as[(Long, Long)].collect().toSet
      val binned = RangeJoin.timestampRangeJoin(left, right, "ts", "ts", lo, hi, binUs)
        .select(col("l_lid"), col("r_rid")).as[(Long, Long)].collect().toSet
      assert(binned == naive,
        s"trial=$trial lo=$lo hi=$hi binUs=$binUs naive=${naive.size} binned=${binned.size}")
    }
  }

  test("rejects empty windows and non-positive bins") {
    val df = Seq((1L, ts(0))).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.timestampRangeJoin(df, df, "ts", "ts", 10L, 5L, 1L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.timestampRangeJoin(df, df, "ts", "ts", 0L, 5L, 0L)
    }
  }

  test("rejects unbounded fan-out (window >> bin width)") {
    val df = Seq((1L, ts(0))).toDF("id", "ts")
    intercept[IllegalArgumentException] {
      // 1-year window on 1us bins: ~3.15e13 bins per row
      RangeJoin.timestampRangeJoin(df, df, "ts", "ts",
        0L, 365L * 86400L * 1000000L, 1L)
    }
  }

  test("year-9999 timestamps bin exactly (integer floorDiv, not double)") {
    // |us| ~2.5e17 > 2^53: a double-based floor(us/w) rounds us to a
    // multiple of 32us, misbinning rows near bin boundaries. ms-grain
    // timestamps with 1ms bins make any such rounding visible.
    val base = java.sql.Timestamp.valueOf("9999-12-31 12:00:00").getTime
    def tms(ms: Long) = new java.sql.Timestamp(base + ms)
    val left = (0 until 40).map(i => (i.toLong, tms(i * 7L))).toDF("lid", "ts")
    val right = (0 until 60).map(i => (100L + i, tms(i * 5L))).toDF("rid", "ts")
    val winUs = 20L * 1000 // [ts, ts+20ms]
    val naive = left.as("l").join(right.as("r"),
        unix_micros(col("r.ts")) >= unix_micros(col("l.ts")) &&
          unix_micros(col("r.ts")) <= unix_micros(col("l.ts")) + winUs)
      .select(col("l.lid"), col("r.rid")).as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (binUs <- Seq(1000L, 3000L, 20000L)) {
      val binned = RangeJoin.timestampRangeJoin(left, right, "ts", "ts", 0L, winUs, binUs)
        .select(col("l_lid"), col("r_rid")).as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binWidthUs=$binUs")
    }
  }

  test("right-side column named `us` survives (collision-proof scratch names)") {
    val left = Seq((1L, ts(100))).toDF("lid", "ts")
    val right = Seq((10L, ts(100), 42L)).toDF("rid", "ts", "us")
    val out = RangeJoin.timestampRangeJoin(left, right, "ts", "ts",
      0L, 60L * 1000000, 3600L * 1000000)
    assert(out.columns.contains("r_us"))
    assert(out.select("r_us").as[Long].collect().toSeq == Seq(42L))
  }
}
