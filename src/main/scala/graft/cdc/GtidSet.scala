package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Executed-GTID-set computation: collapse the (sid, gno) pairs of applied
  * transactions into the canonical inclusive interval text
  * (`uuid:a[-b][:c[-d]]`) that [[BinlogGtidCodec.decodePreviousGtids]]
  * renders and a failing-over consumer publishes as its resume position —
  * the capability file+pos positions (all the reference tracks,
  * `/root/reference/src/main.rs:84-99`) cannot express.
  *
  * Scale shape: a server has FEW sids (one per primary) but billions of
  * gnos at corpus scale, so the textbook single-window islands-and-gaps
  * (partition by sid, order by gno) would sort every gno of a sid on ONE
  * reducer. Instead the collapse is two-level: level 1 detects islands
  * inside fixed-width gno buckets — `(sid, bucket)` keys, parallel across
  * the gno range; level 2 merges adjacent intervals across bucket
  * boundaries, operating only on the collapsed intervals (metadata-scale:
  * at most two boundary intervals per bucket survive level 1 unmerged).
  */
object GtidSet {

  /** Distinct (sid, gno) pairs → one row per maximal inclusive interval
    * `(sid, lo, hi)`. `bucketBits` fixes the level-1 bucket width
    * (2^bits gnos per bucket); any value is correct, it only moves the
    * parallelism/merge-work trade-off.
    */
  def intervals(gtids: DataFrame, sidCol: String = "sid",
      gnoCol: String = "gno", bucketBits: Int = 20): DataFrame = {
    val sid = col(sidCol)
    val gno = col(gnoCol).cast(LongType)
    // level 1: islands within (sid, bucket) — the bucket key keeps one
    // sid's gnos spread across reducers; the follow-up groupBy reuses the
    // window's (sid, bucket) hash partitioning (subset-key clustering)
    val w1 = Window.partitionBy(sid, col("__bucket")).orderBy(col(gnoCol))
    val local = gtids
      .select(sid, gno.as(gnoCol)).distinct()
      .withColumn("__bucket", shiftrightunsigned(col(gnoCol), bucketBits))
      .withColumn("__island", col(gnoCol) - row_number().over(w1))
      .groupBy(sid, col("__bucket"), col("__island"))
      .agg(min(gnoCol).as("lo"), max(gnoCol).as("hi"))
    // level 2: merge intervals that touch across bucket edges; input here
    // is already collapsed, so the per-sid window sorts interval rows, not
    // gno rows
    val w2 = Window.partitionBy(sid).orderBy(col("lo"))
    local
      .withColumn("__new",
        when(col("lo") > lag(col("hi"), 1).over(w2) + 1, 1L).otherwise(0L))
      .withColumn("__grp",
        sum(col("__new")).over(w2.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(sid, col("__grp"))
      .agg(min("lo").as("lo"), max("hi").as("hi"))
      .drop("__grp")
  }

  /** Intervals → one row per sid with the canonical set text
    * (`gtid_set` column), interval order ascending — byte-identical to
    * [[BinlogGtidCodec.decodePreviousGtids]]'s rendering of the same set.
    */
  def setText(ivs: DataFrame, sidCol: String = "sid"): DataFrame = {
    val iv = col("__ivs")
    ivs.groupBy(col(sidCol))
      .agg(array_sort(collect_list(struct(col("lo"), col("hi")))).as("__ivs"))
      .select(col(sidCol),
        concat(col(sidCol), lit(":"),
          array_join(transform(iv, x =>
            concat(x.getField("lo").cast(StringType),
              when(x.getField("hi") > x.getField("lo"),
                concat(lit("-"), x.getField("hi").cast(StringType)))
                .otherwise(lit("")))), ":")).as("gtid_set"))
  }

  /** Parse canonical set text back into interval rows: the inverse of
    * [[setText]], for consuming a PREVIOUS_GTIDS position decoded by
    * [[BinlogPreviousGtidsDecode]]. `sets` must carry `textCol` with
    * canonical set text (one sid per row); returns (sid, lo, hi) rows.
    */
  def parse(sets: DataFrame, textCol: String): DataFrame = {
    val parts = split(col(textCol), ":")
    sets
      // sid via substring_index, NOT element_at(split(...), 1): the
      // non-generator expressions of this select land in the projection
      // ABOVE the Generate and are evaluated once per EMITTED interval,
      // so re-splitting a multi-MB set text per interval is a hidden
      // quadratic (measured: 154 s → 1.9 s for 187k intervals at sf1).
      // substring_index stops at the first ':' — O(sid length) per row.
      .select(substring_index(col(textCol), ":", 1).as("sid"),
        explode(slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))).as("__iv"))
      .select(col("sid"),
        element_at(split(col("__iv"), "-"), 1).cast(LongType).as("lo"),
        // try_: a single-gno interval has no '-'-split second element, and
        // ANSI element_at throws instead of returning null
        coalesce(try_element_at(split(col("__iv"), "-"), lit(2)).cast(LongType),
          element_at(split(col("__iv"), "-"), 1).cast(LongType)).as("hi"))
  }

  /** Drop every row whose (sid, gno) an applied interval set covers — the
    * resume/failover skip. `ivs` is (sid, lo, hi) interval metadata (from
    * [[parse]] or [[intervals]]), never row-scale, so both joins
    * broadcast; `rows` is the replayed stream at any scale.
    *
    * Join shape: joining on sid alone (a server has a handful of sids)
    * would make the BroadcastHashJoin probe scan EVERY interval of the
    * row's sid as a residual range check — O(rows × intervals/sid), the
    * hidden quadratic once the applied history holds millions of
    * intervals. So intervals spanning < `maxBins` bins of 2^`binBits`
    * gnos explode into one build row per overlapped bin and join with the
    * bin as a second equi key (each probe's build group is O(1); a
    * covering interval always overlaps its gno's bin). Intervals spanning
    * ≥ maxBins bins are NOT exploded — a long-lived server's executed set
    * is a few VERY wide intervals (`uuid:1-10⁹` would materialize
    * millions of bin rows) — and stay on a sid-keyed residual join:
    * O(wide intervals/sid) per probe, bounded because wideness is exactly
    * what keeps their count small. A row survives iff neither join covers
    * its gno, so the two anti joins compose.
    */
  def skipCovered(rows: DataFrame, ivs: DataFrame, sidCol: String = "sid",
      gnoCol: String = "gno", binBits: Int = 6, maxBins: Long = 64L): DataFrame = {
    val binSpan = shiftright(col("hi"), binBits) - shiftright(col("lo"), binBits)
    val narrow = ivs.filter(binSpan < maxBins).withColumn("__bin",
      explode(sequence(shiftright(col("lo"), binBits), shiftright(col("hi"), binBits))))
    val wide = ivs.filter(binSpan >= maxBins)
    val probe = rows.withColumn("__bin", shiftright(col(gnoCol), binBits))
    val afterNarrow = probe.join(broadcast(narrow),
      probe(sidCol) === narrow("sid") &&
        probe("__bin") === narrow("__bin") &&
        probe(gnoCol) >= narrow("lo") && probe(gnoCol) <= narrow("hi"),
      "left_anti")
    afterNarrow.join(broadcast(wide),
        afterNarrow(sidCol) === wide("sid") &&
          afterNarrow(gnoCol) >= wide("lo") && afterNarrow(gnoCol) <= wide("hi"),
        "left_anti")
      .drop("__bin")
  }
}
