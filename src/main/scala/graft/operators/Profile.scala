package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** One-pass dataset profiling: per-column null count, distinct count, and
  * min/max — the quality-monitoring sweep a 100 TB ingest runs before
  * anything trains on the data.
  *
  * Shape: ONE aggregation over the table computes every column's metrics
  * as parallel aggregate expressions (map-side partials, one shuffle of a
  * single row), then the 1×(4·C) result unpivots driver-side into C rows.
  * Min/max/null are cheap streams; distinct is the knob: `exact = true`
  * uses `count(distinct)` (Catalyst expands one row per distinct-column —
  * C× the scan width; fine to a few dozen columns), `exact = false` uses
  * HyperLogLog++ partials that fold into the same single pass, the 100 TB
  * default.
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__d_$c"),
        min(col(c)).cast(StringType).as(s"__mn_$c"),
        max(col(c)).cast(StringType).as(s"__mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single metrics row into one row per column. stack() would
    // need uniform value types; building the rows from the collected single
    // row is exact and driver-cheap (4·C scalars).
    val r = one.collect().head
    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      (c,
        r.getAs[Long](s"__n_$c"),
        r.getAs[Long](s"__d_$c"),
        Option(r.getAs[String](s"__mn_$c")),
        Option(r.getAs[String](s"__mx_$c")))
    // "col_name", not "column": the driver compare re-selects output
    // columns unquoted, and `column` is a reserved word there.
    }.toDF("col_name", "n_nulls", "n_distinct", "min_s", "max_s")
      .select(col("col_name"), col("n_nulls").cast(LongType),
        col("n_distinct").cast(LongType), col("min_s"), col("max_s"))
  }
}
