package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operator surface, batch-replayed (SURVEY.md §2B): the same
  * StreamOps functions run over the `events` fixture as a batch frame so a
  * DuckDB oracle can verify the event-time semantics; StreamingSpec drives
  * the identical code over MemoryStream with watermarks.
  */
object StreamQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val qs: Seq[Q] = Seq(

    Q("q60_stream_tumbling",
      (s, dir) => StreamOps.tumbling(t(s, dir, "events"), "ts", "event_type", "value")
        .orderBy("w_start", "event_type"),
      Some("""SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
             |time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS w_end,
             |event_type, count(*) AS cnt,
             |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin),
      headline = true),

    Q("q61_stream_sliding",
      (s, dir) => StreamOps.sliding(t(s, dir, "events"), "ts", "event_type")
        .orderBy("w_start", "event_type"),
      Some("""SELECT ws AS w_start, ws + INTERVAL '10 minutes' AS w_end, event_type, count(*) AS cnt
             |FROM (
             |  SELECT event_type, unnest([
             |    time_bucket(INTERVAL '5 minutes', ts),
             |    time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS ws
             |  FROM events)
             |GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin)),

    Q("q62_stream_sessions",
      (s, dir) => StreamOps.sessions(t(s, dir, "events"), "ts", "user_id")
        .orderBy("user_id", "session_start"),
      Some("""WITH marked AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '5 minutes'
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |), grouped AS (
             |  SELECT user_id, ts,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM marked)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL '5 minutes' AS session_end, count(*) AS n_events
             |FROM grouped GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    Q("q63_stream_dedup",
      (s, dir) => StreamOps.dedupFirst(t(s, dir, "events"),
          Seq("user_id", "event_type"), Seq(col("ts"), col("event_id")))
        .select("user_id", "event_type", "event_id")
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type, event_id FROM (
             |  SELECT user_id, event_type, event_id,
             |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
             |  FROM events)
             |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin))
  )
}
