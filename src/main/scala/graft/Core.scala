package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One declared engine operator: a Spark query over the fixture tables plus
  * (when SQL-expressible) an equivalent ANSI SQL string the driver replays in
  * DuckDB. `headline = true` tags the flagship-representative queries for
  * reporting; [[Bench]] times the whole corpus regardless.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Fixture-table loaders (driver-generated parquet, see TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.parquet has stored ts either as TIMESTAMP(MICROS) (read back
      // natively) or as TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects unless nanosAsLong is set — in that case read nanos as long
      // and convert (the fixture's nanos are exact multiples of 1000, so the
      // micros conversion is lossless). Branch on the type actually read so
      // both fixture generations load identically.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        // NTZ micros: same instants under the UTC session zone; cast to LTZ
        // so downstream code sees one ts type across fixture generations.
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}

/** Helpers that keep Spark and the DuckDB oracle bit-identical.
  *
  * Money/quantity columns in the fixtures are doubles that carry exactly two
  * decimal digits, so summing through `DecimalType` is lossless AND exact —
  * it removes the floating-point addition-order nondeterminism that would
  * otherwise make a distributed Spark sum hash-differ from DuckDB's serial
  * sum. Per-row double arithmetic (e.g. `price * (1 - disc)`) is identical
  * IEEE ops in both engines and needs no such treatment.
  */
object Exact {
  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact sum of a per-row double expression, rounded to 6 decimals at the
    * row level (same binary double rounds identically in both engines).
    */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Deterministic average: exact decimal sum divided by count, in doubles. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1)).cast(DoubleType)

  /** SQL fragments mirroring the above for the DuckDB oracle. */
  def sqlSum(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlSum6(expr: String): String = s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))"
}
