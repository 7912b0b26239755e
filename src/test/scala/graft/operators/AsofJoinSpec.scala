package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  import java.sql.Timestamp
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def fixture() = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")),
      (3L, 10L, ts("2024-01-01 00:00:02")), // before any right row
      (4L, 20L, ts("2024-01-01 00:00:07")), // key with no right rows at all
      (5L, 30L, ts("2024-01-01 00:00:07"))  // exactly AT a right timestamp
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:03"), 1.0),
      (10L, ts("2024-01-01 00:00:05"), 2.0), // ties left #1's ts — inclusive
      (10L, ts("2024-01-01 00:00:09"), 3.0),
      (30L, ts("2024-01-01 00:00:07"), 9.0)
    ).toDF("k", "ts", "v")
    (left, right)
  }

  test("takes the latest right row at or before each left row, null when none") {
    val (left, right) = fixture()
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
    assert(got.toSeq == Seq(
      1L -> Some(2.0), // inclusive: row AT 00:05 wins over 00:03
      2L -> Some(3.0),
      3L -> None,      // left before any right state
      4L -> None,      // key absent from right
      5L -> Some(9.0)  // exact timestamp match on another key
    ))
  }

  test("left columns and row count are preserved exactly") {
    val (left, right) = fixture()
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("event_id", "k", "ts", "v"))
    // No right timestamps leak into the left ts column.
    assert(out.select("ts").except(left.select("ts")).isEmpty)
  }

  test("a null in one value column does not stitch fields of older rows") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:10"))).toDF("id", "k", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 00:00:01"), Option(5.0), Option("old")),
      (1L, ts("2024-01-01 00:00:05"), Option.empty[Double], Option("new"))
    ).toDF("k", "ts", "a", "b")
    val row = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("a", "b"))
      .select("a", "b").collect().head
    // The newest right row wins wholesale: a is its null, not the older 5.0.
    assert(row.isNullAt(0) && row.getString(1) == "new")
  }

  test("value-column name collision is rejected loudly") {
    val (left, right) = fixture()
    val ex = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right.withColumnRenamed("v", "k2"),
        Seq("k"), "ts", "ts", Seq("ts"))
    }
    assert(ex.getMessage.contains("collide"))
  }
}
