package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Executed-GTID-set collapse: the two-level (bucketed) islands-and-gaps
  * must agree with a direct single-pass collapse for every bucket width —
  * narrow buckets force interval merges across bucket boundaries (level
  * 2), wide buckets degenerate to a single island pass (level 1 only).
  */
class GtidSetSpec extends SparkSpec {

  val sidA = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
  val sidB = "00000000-0000-0000-0000-0000000000aa"

  // sidA: 1-5, 7, 64-66 (66 straddles the 64-bucket edge at bits=6 and
  // every narrower width), 1000; sidB: 3-4
  val gnos: Seq[(String, Long)] =
    (Seq(1L, 2L, 3L, 4L, 5L, 7L, 64L, 65L, 66L, 1000L).map(sidA -> _) ++
      Seq(3L, 4L).map(sidB -> _))
  val expectA = s"$sidA:1-5:7:64-66:1000"
  val expectB = s"$sidB:3-4"

  private def df = {
    val spark2 = spark
    import spark2.implicits._
    gnos.toDF("sid", "gno")
  }

  test("interval collapse is bucket-width independent") {
    for (bits <- Seq(1, 2, 6, 20)) {
      val out = GtidSet.setText(GtidSet.intervals(df, bucketBits = bits))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out == Map(sidA -> expectA, sidB -> expectB), s"bucketBits=$bits")
    }
  }

  test("set text is byte-identical to the PREVIOUS_GTIDS codec rendering") {
    val ivs = GtidSet.intervals(df, bucketBits = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq).toMap
    for ((sid, expected) <- Seq(sidA -> expectA, sidB -> expectB)) {
      val body = BinlogGtidCodec.encodePreviousGtids(Seq(sid -> ivs(sid)))
      assert(BinlogGtidCodec.decodePreviousGtids(body).toString == expected)
    }
  }

  test("parse inverts setText") {
    val text = GtidSet.setText(GtidSet.intervals(df, bucketBits = 4))
    val back = GtidSet.parse(text, "gtid_set")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = GtidSet.intervals(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(back == direct)
    assert(direct == Set(
      (sidA, 1L, 5L), (sidA, 7L, 7L), (sidA, 64L, 66L), (sidA, 1000L, 1000L),
      (sidB, 3L, 4L)))
  }

  test("skipCovered drops covered gnos via both the binned and the wide path") {
    val spark2 = spark
    import spark2.implicits._
    // narrow (width-3) interval + a VERY wide one (10⁹ gnos — would be
    // ~15.6M bin rows if exploded; must take the residual path) + another
    // sid whose identical gnos must NOT be skipped
    val ivs = Seq(
      (sidA, 10L, 12L),
      (sidA, 1000000L, 1001000000L),
      (sidB, 5L, 5L)).toDF("sid", "lo", "hi")
    val rows = Seq(
      (sidA, 9L), (sidA, 10L), (sidA, 12L), (sidA, 13L),        // narrow edges
      (sidA, 999999L), (sidA, 1000000L),                        // wide lo edge
      (sidA, 500000000L),                                       // wide middle
      (sidA, 1001000000L), (sidA, 1001000001L),                 // wide hi edge
      (sidB, 10L), (sidB, 5L)).toDF("sid", "gno")               // per-sid scoping
    val kept = GtidSet.skipCovered(rows, ivs)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == Set(
      (sidA, 9L), (sidA, 13L), (sidA, 999999L), (sidA, 1001000001L),
      (sidB, 10L)))
    // binned semantics must be bin-width independent around the edges
    val kept2 = GtidSet.skipCovered(rows, ivs, binBits = 3, maxBins = 4L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept2 == kept)
  }
}
