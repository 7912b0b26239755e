package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins (SURVEY.md §2B
  * scale notes; the "pre-partition both sides once, join many times free"
  * pattern every 100 TB fact⋈fact pipeline relies on).
  *
  * Writing both join sides bucketed on the join key with the same bucket
  * count lets Spark's bucketed-scan rule prove partitioning compatibility:
  * the sort-merge join consumes bucket files directly and the plan carries
  * NO shuffle exchange on either side — the shuffle cost was paid once at
  * write time and amortizes over every subsequent join, aggregation, or
  * merge keyed on the same column. This is also the batch analog of the
  * pk-bucketed CDC snapshot ([[graft.streaming.CdcSnapshot]]).
  */
object Bucketing {

  /** Write `df` as a bucketed-and-sorted external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — plans shuffle-free
    * when both were written with the same bucket count on `key`. The merge
    * hint pins the sort-merge strategy (what the planner picks unaided for
    * fact⋈fact sizes; at fixture scale broadcast would win and bypass the
    * bucketed scan this operator exists to exercise).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right).hint("merge"), key)
}
