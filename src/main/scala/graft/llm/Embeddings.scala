package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column transforms for training-data pipelines: symmetric int8
  * quantization (the storage/serving format for ANN indexes at scale) as
  * pure per-row column expressions — narrow, fused into whole-stage codegen
  * over the scan, zero shuffle at any scale.
  */
object Embeddings {

  /** Per-vector symmetric scale: max |x| / 127, so round(x/scale) lands in
    * [-127, 127]. Double-exact: abs/max/divide are identical IEEE ops in
    * Spark and a SQL oracle.
    */
  def int8Scale(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast(DoubleType)))) / lit(127.0)

  /** Int8-quantized vector under [[int8Scale]]; all-zero vectors (scale 0)
    * quantize to zeros rather than dividing by zero.
    */
  def int8Quantize(emb: Column, scale: Column): Column =
    transform(emb, x =>
      when(scale === 0.0, lit(0))
        .otherwise(round(x.cast(DoubleType) / scale).cast(IntegerType)))

  /** (vec_id, scale, q_str): quantized vectors serialized as CSV strings so
    * a hash-compare oracle sees scalar columns (integer-exact contents).
    */
  def quantized(embeddings: DataFrame, embCol: String, idCol: String): DataFrame =
    embeddings
      .withColumn("scale", int8Scale(col(embCol)))
      .select(col(idCol), col("scale"),
        concat_ws(",", transform(int8Quantize(col(embCol), col("scale")),
          q => q.cast(StringType))).as("q_str"))
}
