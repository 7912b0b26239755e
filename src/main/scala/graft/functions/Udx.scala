package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Declared user-defined-extension surface (SURVEY.md §2B, last row):
  * a typed `Aggregator` UDAF and a `flatMap`-based generator (UDTF shape).
  * (The Scala-UDF exemplar is [[graft.cdc.Catalog.jdbcCodeUdf]].)
  *
  * The UDAF keeps its buffer in exact decimals so the distributed
  * partial+final merge is order-insensitive and matches a serial oracle
  * bit-for-bit; the finish mirrors the oracle's double division.
  */
object Udx {

  /** Weighted mean of `value` by `weight`, both 2-decimal doubles.
    * Buffer = (Σ value·weight, Σ weight) as exact UNSCALED longs (4 and 2
    * decimal digits of scale): a 2-decimal double is k/100 with k exactly
    * recoverable via `math.round(x*100)`, so long arithmetic carries the
    * same exact decimal sums a BigDecimal buffer would — order-insensitive
    * across any partitioning — at a fraction of the per-row cost (an
    * earlier BigDecimal-buffered version spent the whole aggregate in
    * setScale/boxing). Capacity: the scale-4 sum overflows only past
    * Σ v·w ≈ 9.2e14 (the fixture's is ~3e12); the exemplar documents the
    * bound rather than paying for 128-bit math.
    * `finish` converts through java.math.BigDecimal exactly like the
    * oracle's CAST(DECIMAL AS DOUBLE) / CAST(DECIMAL AS DOUBLE).
    */
  class WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
      val v = math.round(in._1 * 100.0) // unscaled, scale 2
      val w = math.round(in._2 * 100.0)
      // addExact/multiplyExact: past the documented ~9.2e14 scale-4 bound
      // the aggregate must throw, not silently wrap to a wrong mean.
      (Math.addExact(b._1, Math.multiplyExact(v, w)), Math.addExact(b._2, w))
    }
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (Math.addExact(a._1, b._1), Math.addExact(a._2, b._2))
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0L) Double.NaN
      else java.math.BigDecimal.valueOf(b._1, 4).doubleValue() /
        java.math.BigDecimal.valueOf(b._2, 2).doubleValue()
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val qs: Seq[Q] = Seq(

    // UDAF: qty-weighted mean extended price per return flag.
    Q("q38_udaf_weighted_mean", { (s, dir) =>
        val wm = udaf(new WeightedMean)
        Tables(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(wm(col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |  / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS w_avg_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Generator (UDTF shape): word 3-shingles per document via typed flatMap,
    // then distinct-shingle counts. At scale the flatMap is map-side only.
    Q("q39_udtf_shingles", { (s, dir) =>
        val spark = s
        import spark.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")).as[(Long, String)]
          .flatMap { case (id, text) =>
            text.split(" ", -1).sliding(3).collect {
              case w if w.length == 3 => (id, w.mkString(" "))
            }
          }
          .toDF("doc_id", "shingle")
          .groupBy("doc_id")
          .agg(countDistinct(col("shingle")).as("n_shingles"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, count(DISTINCT sh) AS n_shingles FROM (
             |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
             |) GROUP BY doc_id ORDER BY doc_id""".stripMargin))
  )
}
