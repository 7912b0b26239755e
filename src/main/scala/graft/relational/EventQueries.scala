package graft.relational

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-analytics surface over the `events` fixture: ordered funnel
  * conversion and cohort retention — the batch queries an engine fed by the
  * CDC/event stream answers daily. Both are plain shuffled aggregations +
  * equi-joins on `user_id`; at 100 TB they hash-partition by user and the
  * per-stage joins reuse that partitioning (no broadcast needed on the
  * fact side, no windows over unbounded partitions).
  */
object EventQueries {

  val qs: Seq[Q] = Seq(

    // Ordered 3-stage funnel with a 24h conversion window: first view →
    // first click within 24h → first purchase within 24h of that click.
    // Each stage is a conditional-min aggregation joined back on user —
    // the standard distributed funnel shape (no per-user event-array
    // collect, which would OOM on a power user at scale).
    Q("q94_funnel_conversion", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val win = expr("INTERVAL 24 HOURS")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = ev.filter(col("event_type") === "click").as("e")
          .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
            col("e.ts") > col("t1") && col("e.ts") <= col("t1") + win)
          .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase").as("e")
          .join(c.as("c"), col("e.user_id") === col("c.user_id") &&
            col("e.ts") > col("t2") && col("e.ts") <= col("t2") + win)
          .groupBy(col("e.user_id")).agg(min(col("e.ts")).as("t3"))
        v.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"))
          .unionAll(c.agg(lit("2_click_24h").as("stage"), count(lit(1)).as("n_users")))
          .unionAll(p.agg(lit("3_purchase_24h").as("stage"), count(lit(1)).as("n_users")))
          .select("stage", "n_users")
          .orderBy("stage")
      },
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
             |), c AS (
             |  SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
             |    AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL 24 HOUR
             |  WHERE e.event_type = 'click' GROUP BY e.user_id
             |), p AS (
             |  SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
             |    AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL 24 HOUR
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
             |)
             |SELECT * FROM (
             |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
             |  UNION ALL SELECT '2_click_24h', count(*) FROM c
             |  UNION ALL SELECT '3_purchase_24h', count(*) FROM p)
             |ORDER BY stage""".stripMargin)),

    // Day-granularity cohort retention: users grouped by first-seen day,
    // counted once per (cohort, active day) — two shuffles (first-seen agg,
    // distinct active days) and one user-keyed join.
    Q("q95_retention_cohort", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val firstSeen = ev.groupBy("user_id")
          .agg(date_trunc("DAY", min("ts")).as("cohort_day"))
        val active = ev.select(col("user_id"),
          date_trunc("DAY", col("ts")).as("active_day")).distinct()
        firstSeen.join(active, "user_id")
          .groupBy(col("cohort_day").cast(DateType).as("cohort_day"),
            datediff(col("active_day"), col("cohort_day")).as("day_offset"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH first_seen AS (
             |  SELECT user_id, date_trunc('day', min(ts)) AS cohort_day FROM events GROUP BY user_id
             |), active AS (
             |  SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
             |)
             |SELECT CAST(f.cohort_day AS DATE) AS cohort_day,
             |  CAST(date_diff('day', f.cohort_day, a.active_day) AS INTEGER) AS day_offset,
             |  count(*) AS n_active
             |FROM first_seen f JOIN active a ON f.user_id = a.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Temporal range join: errors within 5 minutes after each signup,
    // via the binned rewrite (operators.RangeJoin) — a hash join on time
    // buckets instead of the BroadcastNestedLoop Spark would plan for the
    // raw BETWEEN predicate (PlanSpec asserts no nested-loop/cartesian).
    Q("q98_range_join", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val fiveMinUs = 5L * 60 * 1000000
        graft.operators.RangeJoin.timestampRangeJoin(
            ev.filter(col("event_type") === "signup").select("event_id", "ts"),
            ev.filter(col("event_type") === "error").select("event_id", "ts"),
            "ts", "ts", lowerUs = 0L, upperUs = fiveMinUs, binWidthUs = fiveMinUs)
          .groupBy(col("l_event_id").as("signup_id"))
          .agg(count(lit(1)).as("n_errors"))
          .orderBy("signup_id")
      },
      Some("""SELECT s.event_id AS signup_id, count(*) AS n_errors
             |FROM events s JOIN events e
             |  ON e.ts >= s.ts AND e.ts <= s.ts + INTERVAL 5 MINUTE
             |WHERE s.event_type = 'signup' AND e.event_type = 'error'
             |GROUP BY s.event_id ORDER BY signup_id""".stripMargin)),

    // The SAME range-join semantics written the NAIVE way — a bare BETWEEN
    // join — relying on the RangeJoinRule optimizer rewrite to plan it as
    // the bin hash join (purchases within 10 minutes of each click).
    // PlanSpec asserts the rewrite fired; this row gates its results.
    Q("q110_range_join_auto", { (s, dir) =>
        graft.GraftExtensions.register(s)
        val ev = Tables(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("ts").as("cts"))
        val buys = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("ts").as("bts"))
        clicks.join(buys,
            col("bts") >= col("cts") &&
              col("bts") <= col("cts") + expr("INTERVAL 10 MINUTES"))
          .groupBy("click_id")
          .agg(count(lit(1)).as("n_buys"))
          .orderBy("click_id")
      },
      Some("""SELECT c.event_id AS click_id, count(*) AS n_buys
             |FROM events c JOIN events b
             |  ON b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 10 MINUTE
             |WHERE c.event_type = 'click' AND b.event_type = 'purchase'
             |GROUP BY c.event_id ORDER BY click_id""".stripMargin)),

    // Time-series resample + forward fill: per user, an hourly grid over
    // the user's observed span (sequence + explode — no driver loop), the
    // sparse hourly aggregate left-joined on, gaps carried forward with
    // last(ignoreNulls) over a running frame. Decimal-exact hourly mean,
    // so both engines fill the same doubles.
    Q("q112_resample_ffill", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val hourly = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("h"))
          .agg(graft.Exact.davg(col("value")).as("v"))
        val grid = hourly.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("h"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("h")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        grid.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h"),
            col("v").isNotNull.cast(IntegerType).as("observed"),
            last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
          .orderBy("user_id", "h")
      },
      Some(s"""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS h,
             |    ${graft.Exact.sqlAvg("value")} AS v
             |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
             |), span AS (
             |  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
             |), grid AS (
             |  SELECT s.user_id, unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS h
             |  FROM span s
             |)
             |SELECT g.user_id, g.h,
             |  CAST(hy.v IS NOT NULL AS INTEGER) AS observed,
             |  last_value(hy.v IGNORE NULLS) OVER (
             |    PARTITION BY g.user_id ORDER BY g.h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
             |FROM grid g LEFT JOIN hourly hy ON g.user_id = hy.user_id AND g.h = hy.h
             |ORDER BY g.user_id, g.h""".stripMargin)),

    // Z-score outlier detection per event type, deterministic at any
    // partitioning: mean/stddev come from exact decimal power sums (the
    // q89 trick) so the z expression — identical IEEE math both engines —
    // flags the exact same rows. The per-type moments broadcast back.
    Q("q113_outlier_zscore", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val dv = col("value").cast(DecimalType(18, 2))
        val m = ev.groupBy("event_type").agg(
          count(lit(1)).cast(DoubleType).as("nd"),
          sum(dv).cast(DoubleType).as("s1"),
          sum(dv * dv).cast(DoubleType).as("s2"))
        // Degenerate groups (single row / zero variance) are excluded
        // EXPLICITLY: Spark's 0/0 is NULL while DuckDB's is NaN (> any
        // threshold there), so leaving them in diverges the engines.
        val varE = (col("s2") - col("s1") * col("s1") / col("nd")) / (col("nd") - 1.0)
        val z = (col("value") - col("s1") / col("nd")) / sqrt(varE)
        ev.join(broadcast(m), "event_type")
          .filter(col("nd") > 1.0 && varE > 0.0)
          .select(col("event_id"), col("event_type"), col("value"), z.as("z"))
          .filter(abs(col("z")) > 2.5)
          .orderBy("event_id")
      },
      Some("""WITH m AS (
             |  SELECT event_type, CAST(count(*) AS DOUBLE) AS nd,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
             |  FROM events GROUP BY event_type)
             |SELECT e.event_id, e.event_type, e.value,
             |  (e.value - m.s1 / m.nd) / sqrt((m.s2 - m.s1 * m.s1 / m.nd) / (m.nd - 1.0)) AS z
             |FROM events e JOIN m ON e.event_type = m.event_type
             |WHERE m.nd > 1.0 AND (m.s2 - m.s1 * m.s1 / m.nd) / (m.nd - 1.0) > 0.0
             |  AND abs((e.value - m.s1 / m.nd)
             |  / sqrt((m.s2 - m.s1 * m.s1 / m.nd) / (m.nd - 1.0))) > 2.5
             |ORDER BY e.event_id""".stripMargin)),

    // Fixed-width value histogram per event type — one hash agg; the
    // bucket floor is identical double math in both engines.
    Q("q114_value_histogram", { (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"),
            floor(col("value") / 2.0).cast(IntegerType).as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bucket")
      },
      Some("""SELECT event_type, CAST(floor(value / 2.0) AS INTEGER) AS bucket, count(*) AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Path analysis: the within-session event-type transition matrix
    // (lag per user, 30-minute session gap) — one user-keyed window pass
    // plus a hash agg; the "what happens after X" counterpart to the
    // funnel's fixed stages.
    Q("q115_event_transitions", { (s, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            lag("event_type", 1).over(w).as("prev_type"),
            (unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))).as("gap_s"))
          .filter(col("prev_type").isNotNull && col("gap_s") <= 1800)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
          .orderBy("prev_type", "next_type")
      },
      Some("""WITH seq AS (
             |  SELECT user_id, ts, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             |    CAST(date_diff('second',
             |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS BIGINT) AS gap_s
             |  FROM events)
             |SELECT prev_type, event_type AS next_type, count(*) AS n
             |FROM seq WHERE prev_type IS NOT NULL AND gap_s <= 1800
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )

  /** q188 lives outside the main Seq literal purely to keep the file's
    * giant Seq readable; [[qs]] exposes everything.
    */
  val qs2: Seq[Q] = Seq(

    // DYNAMIC-gap sessionization — Spark's expression-valued
    // session_window (3.2+; the static-gap q62 can't express "a purchase
    // keeps the session alive longer"): each event extends its session by
    // its own gap (48 h after a purchase, 12 h otherwise), sessions are
    // the merged overlapping [ts, ts+gap) intervals. The oracle replays
    // the merge as the classic variable-gap islands: new session iff
    // ts strictly beyond the running max of (ts + gap) over all earlier
    // events (an event landing EXACTLY on the reach still merges — the
    // boundary semantic StreamingSpec pins for the static-gap operator) —
    // the interval-union semantics, in integer microseconds on both
    // sides. One user-key window shuffle, no unbounded state.
    Q("q188_dynamic_session", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val gap = when(col("event_type") === "purchase", "48 hours")
          .otherwise("12 hours")
        ev.groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("sw.start")).as("session_start_us"),
            unix_micros(col("sw.end")).as("session_end_us"),
            col("n_events"))
          .orderBy("user_id", "session_start_us")
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t,
             |    CASE WHEN event_type = 'purchase' THEN 172800000000
             |         ELSE 43200000000 END AS gap
             |  FROM events),
             |m AS (SELECT user_id, t, gap,
             |    max(t + gap) OVER (PARTITION BY user_id ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS reach
             |  FROM e),
             |f AS (SELECT user_id, t, gap,
             |    CASE WHEN reach IS NULL OR t > reach THEN 1 ELSE 0 END AS brk
             |  FROM m),
             |sess AS (SELECT user_id, t, gap,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM f)
             |SELECT user_id, CAST(min(t) AS BIGINT) AS session_start_us,
             |  CAST(max(t + gap) AS BIGINT) AS session_end_us,
             |  CAST(count(*) AS BIGINT) AS n_events
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, session_start_us""".stripMargin)),

    // Last-touch attribution — for every purchase, the latest preceding
    // non-purchase event by the same user within a 7-day lookback is the
    // credited touchpoint (the standard marketing-attribution primitive;
    // first-touch/linear are the same shape with a different pick).
    // Spark side: the q80 as-of join shape — per-user ordered window,
    // latest-event carry, never a per-purchase scan. Credited counts per
    // touch type plus the unattributed bucket.
    Q("q196_last_touch_attribution", { (s, dir) =>
        val ev = Tables(s, dir, "events")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val sevenDaysUs = 7L * 86400 * 1000000
        val touched = ev
          .withColumn("touch", max(
            when(col("event_type") =!= "purchase",
              struct(unix_micros(col("ts")).as("tts"),
                col("event_id").as("eid"), col("event_type").as("ttype"))))
            .over(w.rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            when(col("touch").isNotNull &&
              unix_micros(col("ts")) - col("touch.tts") <= sevenDaysUs,
              col("touch.ttype")).otherwise("unattributed").as("credited"))
        touched.groupBy("credited").agg(count(lit(1)).as("n_purchases"))
          .orderBy("credited")
      },
      Some("""WITH seq AS (SELECT event_id, user_id, ts, event_type,
             |    max(CASE WHEN event_type <> 'purchase'
             |        THEN {'tts': epoch_us(ts), 'eid': event_id,
             |              'ttype': event_type} END) OVER
             |      (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
             |  FROM events),
             |cr AS (SELECT event_id,
             |    CASE WHEN touch IS NOT NULL
             |        AND epoch_us(ts) - touch.tts <= 604800000000
             |      THEN touch.ttype ELSE 'unattributed' END AS credited
             |  FROM seq WHERE event_type = 'purchase')
             |SELECT credited, CAST(count(*) AS BIGINT) AS n_purchases
             |FROM cr GROUP BY credited ORDER BY credited""".stripMargin))
  )
}
