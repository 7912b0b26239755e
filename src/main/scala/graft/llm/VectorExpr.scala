package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Imperative vector kernels callable from generated code. Higher-order
  * `aggregate`/`zip_with` folds are never codegen'd (interpreted lambda per
  * element); one static call running a fused JIT'd loop is ~an order of
  * magnitude faster at embedding widths, which dominates the ANN verify
  * stage. Accumulation is ascending-index, so results are bit-identical to
  * the HOF formulation `dot/(sqrt(aa)*sqrt(bb))` they replace.
  */
object VectorKernels {
  /** Cosine similarity of two equal-length double arrays (one fused pass). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }
}

/** Codegen'd cosine similarity over two `array<double>` columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"CosineSim expects ARRAY<DOUBLE> inputs, got ${l.sql}, ${r.sql}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.llm.VectorKernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
