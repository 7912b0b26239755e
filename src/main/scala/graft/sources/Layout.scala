package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit-interleave kernel, callable from generated code. */
object ZOrderKernels {

  /** Spread the low 31 bits of `v` to the even bit positions 0,2,..,60.
    * Classic mask-shift spread; branch-free, JIT-friendly.
    */
  def spread(v: Int): Long = {
    var x = v.toLong & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 31 bits of `x` (even positions) and `y` (odd):
    * the Z-order / Morton index. Always non-negative (uses 62 bits), so
    * plain signed-long ordering is the space-filling-curve order.
    */
  def interleave(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)
}

/** Codegen'd Z-order index of two INT columns (low 31 bits each). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ZOrder2 expects INT inputs, got ${l.sql}, ${r.sql}")
    }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKernels.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sources.ZOrderKernels.interleave($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def apply(x: Column, y: Column): Column =
    ColumnBridge.column(ZOrder2(ColumnBridge.expression(x), ColumnBridge.expression(y)))
}

/** Data-layout operators: how 100 TB gets written so it can be read
  * cheaply. Correctness lives in the engine's operators; at scale the
  * scan is the budget, and layout is what shrinks it:
  *
  *  - **Hive partitioning** ([[writePartitioned]]): a predicate on the
  *    partition column prunes whole directories at PLANNING time — the
  *    pruned data is never listed, opened, or read. The right tool for
  *    low-cardinality routing columns (language, date, source).
  *  - **Z-order clustering** ([[zorderWrite]]): for two higher-cardinality
  *    numeric dims, range-partition + sort by the Morton index gives every
  *    file a tight min/max footer range on BOTH dims, so parquet
  *    row-group/file skipping works for predicates on EITHER column —
  *    unlike a plain sort, which serves only its leading column.
  *
  * Both compose with the engine's pushed filters (PlanSpec asserts
  * `PushedFilters`/`PartitionFilters` reach the scan).
  */
object Layout {

  /** Write `df` hive-partitioned by `partitionCols`. Rows are repartitioned
    * on the partition key first so each partition directory is written by
    * the tasks that own its rows — without it every task appends a file
    * into every directory (task-count × partition-count small files, the
    * classic 100 TB small-file explosion).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read a hive-partitioned dataset; partition-column predicates prune at
    * planning time (`PartitionFilters` in the scan, LayoutSpec-asserted).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Z-order clustered write: range-partition by the Morton index of
    * (`xCol`, `yCol`) into `files` output files, sorted by the index
    * within each, so every file covers one tight Z-curve segment — a
    * contiguous tile in (x, y) space — and min/max skipping serves
    * predicates on either dim. Inputs must be non-negative INTs (31 bits);
    * map/quantize wider domains first.
    */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int): Unit = {
    val z = ZOrder2(col(xCol), col(yCol))
    df.repartitionByRange(files, z)
      .sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }
}
