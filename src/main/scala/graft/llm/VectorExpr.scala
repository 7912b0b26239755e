package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  /** Cosine similarity of two equal-length double arrays (one fused pass).
    * Mismatched lengths FAIL LOUDLY: silently scoring a common prefix
    * would hide mixed-dimension embedding bugs behind plausible values
    * (and an unguarded loop would read past the shorter array).
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: embedding dimensions differ ($n vs ${b.numElements()})")
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

/** IVF coarse-quantizer kernels: cell = argmax-dot centroid (first max
  * wins), probe = the `nprobe` best cells ordered (dot desc, index asc) —
  * the same tie behavior as a stable descending sort.
  */
object IvfKernels {
  private def dots(v: ArrayData, centroids: Array[Array[Double]]): Array[Double] = {
    // Same fail-loudly policy as VectorKernels.cosine: a truncated dot over
    // a dimension-mismatched embedding yields a plausible wrong cell.
    if (centroids.length > 0 && v.numElements() != centroids(0).length)
      throw new IllegalArgumentException(
        s"IVF: embedding dimension ${v.numElements()} != centroid dimension ${centroids(0).length}")
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = cen.length
      var s = 0.0
      var i = 0
      while (i < n) { s += cen(i) * v.getDouble(i); i += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  def cell(v: ArrayData, centroids: Array[Array[Double]]): Int = {
    val d = dots(v, centroids)
    var best = 0
    var i = 1
    while (i < d.length) { if (d(i) > d(best)) best = i; i += 1 }
    best
  }

  /** The argmax dot value itself — spherical k-means' cosine to the
    * assigned unit centroid (the per-row quality signal cluster-based
    * pruning keys on). Same first-max-wins tie rule as [[cell]].
    */
  def bestDot(v: ArrayData, centroids: Array[Array[Double]]): Double = {
    val d = dots(v, centroids)
    var best = 0.0
    var i = 0
    while (i < d.length) { if (i == 0 || d(i) > best) best = d(i); i += 1 }
    best
  }

  def probe(v: ArrayData, centroids: Array[Array[Double]], nprobe: Int): ArrayData = {
    val d = dots(v, centroids)
    val idx = Array.range(0, d.length)
    // stable selection sort of the first nprobe positions by dot desc
    val n = math.min(nprobe, d.length)
    var i = 0
    while (i < n) {
      var best = i
      var j = i + 1
      while (j < d.length) {
        if (d(idx(j)) > d(idx(best))) best = j
        j += 1
      }
      val t = idx(i); idx(i) = idx(best); idx(best) = t
      i += 1
    }
    new GenericArrayData(idx.take(n))
  }

  /** TWO-LEVEL (hierarchical) cell assignment — the coarse-quantizer
    * shape past the flat clamp (IMI/IVF-HNSW family idea in its simplest
    * public form): argmax over k1 coarse centroids picks a branch, argmax
    * over that branch's k2 sub-centroids picks the cell, id = branch·k2 +
    * sub. Assignment costs (k1 + k2) dots instead of the flat k1·k2 —
    * the term the r10 unclamped-cells A/B measured as the superlinear
    * killer. Same first-max-wins tie rule as [[cell]] at both levels.
    */
  def cell2(v: ArrayData, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]]): Int = {
    val b = cell(v, coarse)
    b * subs(b).length + cell(v, subs(b))
  }

  /** Multi-probe two-level assignment: the top-`nprobe` coarse branches,
    * each refined to its best sub-cell — the recall dial of [[cell2]].
    */
  def probe2(v: ArrayData, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]], nprobe: Int): ArrayData = {
    val branches = probe(v, coarse, nprobe)
    val out = new Array[Int](branches.numElements())
    var i = 0
    while (i < out.length) {
      val b = branches.getInt(i)
      out(i) = b * subs(b).length + cell(v, subs(b))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** IVFADC's per-vector (cell, residual): unit-normalize, assign the
    * argmax-dot cell (identical tie rule to [[cell]]), residual =
    * unit − centroid — the quantity the residual PQ codebooks code.
    * One fused pass; returns struct(cell INT, res ARRAY<DOUBLE>).
    */
  def residual(v: ArrayData,
      centroids: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    if (centroids.length > 0 && n != centroids(0).length)
      throw new IllegalArgumentException(
        s"IVF: embedding dimension $n != centroid dimension ${centroids(0).length}")
    val unit = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); unit(i) = x; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm != 0.0) { i = 0; while (i < n) { unit(i) /= nrm; i += 1 } }
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      var s = 0.0
      i = 0
      while (i < n) { s += cen(i) * unit(i); i += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    val cen = centroids(best)
    val res = new Array[Any](n)
    i = 0
    while (i < n) { res(i) = unit(i) - cen(i); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(best, new GenericArrayData(res))
  }
}

/** Hyperplane-LSH signature kernel: bit j of the result is
  * sign(v · plane_j) — one fused pass over all planes of one table.
  */
object HyperplaneKernels {
  def signature(v: ArrayData, planes: Array[Array[Double]]): Int = {
    // Fail loudly on dimension mismatch (see VectorKernels.cosine).
    if (planes.length > 0 && v.numElements() != planes(0).length)
      throw new IllegalArgumentException(
        s"hyperplane LSH: embedding dimension ${v.numElements()} != plane dimension ${planes(0).length}")
    var sig = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = p.length
      var s = 0.0
      var i = 0
      while (i < n) { s += p(i) * v.getDouble(i); i += 1 }
      if (s > 0) sig |= 1 << j
      j += 1
    }
    sig
  }
}

/** Codegen'd hyperplane-LSH bucket signature over an `array<double>`. */
case class HyperplaneSig(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"HyperplaneSig expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    HyperplaneKernels.signature(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      s"${ev.value} = graft.llm.HyperplaneKernels.signature($c, $ref);"
    })
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(new HyperplaneSig(ColumnBridge.expression(v), planes))
}

/** Codegen'd IVF cell assignment over an `array<double>` column. */
case class IvfCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"IvfCell expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.cell(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"${ev.value} = graft.llm.IvfKernels.cell($c, $ref);"
    })
  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

/** Codegen'd IVF probe list (top-nprobe cells) over an `array<double>`. */
case class IvfProbe(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"IvfProbe expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.probe(input.asInstanceOf[ArrayData], centroids, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"${ev.value} = graft.llm.IvfKernels.probe($c, $ref, $nprobe);"
    })
  override protected def withNewChildInternal(newChild: Expression): IvfProbe =
    copy(child = newChild)
}

/** Codegen'd IVFADC (cell, residual) assignment over an `array<double>`
  * column — see [[IvfKernels.residual]].
  */
case class IvfResidual(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("res",
      ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"IvfResidual expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.residual(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"${ev.value} = graft.llm.IvfKernels.residual($c, $ref);"
    })
  override protected def withNewChildInternal(newChild: Expression): IvfResidual =
    copy(child = newChild)
}

object IvfResidual {
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(IvfResidual(ColumnBridge.expression(v), centroids))
}

object IvfCell {
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(new IvfCell(ColumnBridge.expression(v), centroids))
}

/** Codegen'd max-dot-to-any-centroid over an `array<double>` column. */
case class IvfBestDot(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"IvfBestDot expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.bestDot(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      s"${ev.value} = graft.llm.IvfKernels.bestDot($c, $ref);"
    })
  override protected def withNewChildInternal(newChild: Expression): IvfBestDot =
    copy(child = newChild)
}

object IvfBestDot {
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(new IvfBestDot(ColumnBridge.expression(v), centroids))
}

object IvfProbe {
  def apply(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ColumnBridge.column(new IvfProbe(ColumnBridge.expression(v), centroids, nprobe))
}

/** Codegen'd two-level cell assignment — see [[IvfKernels.cell2]]. */
case class Ivf2Cell(child: Expression, coarse: Array[Array[Double]],
    subs: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Ivf2Cell expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.cell2(input.asInstanceOf[ArrayData], coarse, subs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rc = ctx.addReferenceObj("coarse", coarse, "double[][]")
      val rs = ctx.addReferenceObj("subs", subs, "double[][][]")
      s"${ev.value} = graft.llm.IvfKernels.cell2($c, $rc, $rs);"
    })
  override protected def withNewChildInternal(newChild: Expression): Ivf2Cell =
    copy(child = newChild)
}

object Ivf2Cell {
  def apply(v: Column, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(new Ivf2Cell(ColumnBridge.expression(v), coarse, subs))
}

/** Codegen'd two-level multi-probe — see [[IvfKernels.probe2]]. */
case class Ivf2Probe(child: Expression, coarse: Array[Array[Double]],
    subs: Array[Array[Array[Double]]], nprobe: Int)
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"Ivf2Probe expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.probe2(input.asInstanceOf[ArrayData], coarse, subs, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rc = ctx.addReferenceObj("coarse", coarse, "double[][]")
      val rs = ctx.addReferenceObj("subs", subs, "double[][][]")
      s"${ev.value} = graft.llm.IvfKernels.probe2($c, $rc, $rs, $nprobe);"
    })
  override protected def withNewChildInternal(newChild: Expression): Ivf2Probe =
    copy(child = newChild)
}

object Ivf2Probe {
  def apply(v: Column, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]], nprobe: Int): Column =
    ColumnBridge.column(
      new Ivf2Probe(ColumnBridge.expression(v), coarse, subs, nprobe))
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

/** Product-quantization kernels (Jégou et al. 2011, "Product quantization
  * for nearest neighbor search"): a vector is split into `m` contiguous
  * subspaces and each sub-vector is replaced by the index of its nearest
  * sub-codebook centroid — `m` small ints instead of `dim` doubles. ADC
  * (asymmetric distance computation) then scores a candidate against a
  * query-specific lookup table in O(m) adds, never touching the original
  * vector: the N-row scan cost drops from O(dim) mults to O(m) loads.
  */
object PqKernels {
  /** codes(v): for each subspace, argmin squared-L2 sub-centroid (first
    * min wins). Codebooks are [m][ksub][dsub]; v.length must equal m·dsub.
    */
  def code(v: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    if (v.numElements() != m * dsub)
      throw new IllegalArgumentException(
        s"PQ: embedding dimension ${v.numElements()} != m*dsub (${m * dsub})")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cen = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v.getDouble(off + i) - cen(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The [[PqAdcMargin]] kernel: decode the codes (direct lookup, no
    * search) and return ‖n − dec‖ + max(0, (‖dec‖² − 1)/2).
    */
  def adcMargin(v: ArrayData, codes: ArrayData,
      codebooks: Array[Array[Array[Double]]]): Double = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    var r2 = 0.0
    var dec2 = 0.0
    var s = 0
    while (s < m) {
      val cen = codebooks(s)(codes.getInt(s))
      val off = s * dsub
      var i = 0
      while (i < dsub) {
        val d = v.getDouble(off + i) - cen(i)
        r2 += d * d
        dec2 += cen(i) * cen(i)
        i += 1
      }
      s += 1
    }
    math.sqrt(r2) + math.max(0.0, (dec2 - 1.0) / 2.0)
  }

  /** Per-query ADC table: tab[s][c] = ||q_sub(s) - codebook[s][c]||². */
  def adcTable(q: Array[Double], codebooks: Array[Array[Array[Double]]]): Array[Array[Double]] = {
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    require(q.length == m * dsub,
      s"PQ: query dimension ${q.length} != m*dsub (${m * dsub})")
    Array.tabulate(m) { s =>
      val book = codebooks(s)
      val off = s * dsub
      Array.tabulate(book.length) { c =>
        val cen = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = q(off + i) - cen(i)
          d += diff * diff
          i += 1
        }
        d
      }
    }
  }

  /** ADC distance of one coded candidate to one query's table: O(m) adds,
    * ascending-subspace accumulation (deterministic doubles). Unknown
    * query ids FAIL LOUDLY — a silent null would drop candidates from the
    * ranking with no visible cause.
    */
  def adc(queryId: Long, codes: ArrayData,
      tables: java.util.HashMap[java.lang.Long, Array[Array[Double]]]): Double = {
    val tab = tables.get(queryId)
    if (tab == null)
      throw new IllegalArgumentException(s"PQ ADC: no distance table for query id $queryId")
    if (codes.numElements() != tab.length)
      throw new IllegalArgumentException(
        s"PQ ADC: ${codes.numElements()} codes vs ${tab.length} subspaces")
    var d = 0.0
    var s = 0
    while (s < tab.length) {
      d += tab(s)(codes.getInt(s))
      s += 1
    }
    d
  }
}

/** Codegen'd PQ code assignment over an `array<double>` column. */
case class PqCode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"PqCode expects ARRAY<DOUBLE> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    PqKernels.code(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      s"${ev.value} = graft.llm.PqKernels.code($c, $ref);"
    })
  override protected def withNewChildInternal(newChild: Expression): PqCode =
    copy(child = newChild)
}

object PqCode {
  def apply(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(new PqCode(ColumnBridge.expression(v), codebooks))
}

/** Codegen'd ADC lookup: (query_id, codes) → approximate squared L2 using
  * the per-query tables baked in as a reference object (|Q|·m·ksub doubles
  * — bounded by the query set, independent of N).
  */
case class PqAdc(left: Expression, right: Expression,
    tables: java.util.HashMap[java.lang.Long, Array[Array[Double]]])
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (org.apache.spark.sql.types.LongType,
          ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"PqAdc expects (BIGINT, ARRAY<INT>) inputs, got ${l.sql}, ${r.sql}")
  }
  override protected def nullSafeEval(qid: Any, codes: Any): Any =
    PqKernels.adc(qid.asInstanceOf[Long], codes.asInstanceOf[ArrayData], tables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tables", tables, "java.util.HashMap")
    defineCodeGen(ctx, ev, (q, c) => s"graft.llm.PqKernels.adc($q, $c, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

object PqAdc {
  def apply(queryId: Column, codes: Column,
      tables: java.util.HashMap[java.lang.Long, Array[Array[Double]]]): Column =
    ColumnBridge.column(
      PqAdc(ColumnBridge.expression(queryId), ColumnBridge.expression(codes), tables))
}

/** Codegen'd EXACT per-posting ADC error bound, computed at encode time
  * from the unit vector `n` and its own codes: for any unit query `q`,
  * with `dec` the codes' decode and `adc = 1 − ‖q − dec‖²/2`,
  *
  *   cos(q, n) − adc = q·(n − dec) + (‖dec‖² − 1)/2
  *                   ≤ ‖n − dec‖ + max(0, (‖dec‖² − 1)/2)
  *
  * (Cauchy–Schwarz on the first term; both right-hand quantities depend
  * only on the posting). A threshold screen that keeps candidates with
  * `adc ≥ threshold − mrg(posting)` therefore NEVER drops a true pair —
  * recall safety by construction rather than by a p99 calibration, and
  * an out-of-distribution row (large residual) simply degrades to
  * always-verify instead of silently under-margining (the r14 ADVICE
  * hazard).
  */
case class PqAdcMargin(left: Expression, right: Expression,
    codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"PqAdcMargin expects (ARRAY<DOUBLE>, ARRAY<INT>) inputs, got ${l.sql}, ${r.sql}")
  }
  override protected def nullSafeEval(v: Any, codes: Any): Any =
    PqKernels.adcMargin(v.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) => s"graft.llm.PqKernels.adcMargin($v, $c, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcMargin =
    copy(left = newLeft, right = newRight)
}

object PqAdcMargin {
  def apply(unitVec: Column, codes: Column,
      codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcMargin(ColumnBridge.expression(unitVec),
      ColumnBridge.expression(codes), codebooks))
}

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein
  * 1998, the classic retrieval diversity re-ranker): from a bounded
  * candidate array pick k items maximizing
  * `λ·relevance − (1−λ)·max-cosine-to-already-selected`, relevance-only
  * for the first pick. Runs per group over ≤ kCand structs —
  * O(k·kCand·dim) inside codegen, no iterative driver loop; ties break to
  * the smaller id so selection is deterministic under any partitioning.
  */
object MmrKernels {
  def select(cands: ArrayData, k: Int, lam: Double): GenericArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val s = cands.getStruct(i, 3)
      ids(i) = s.getLong(0)
      rel(i) = s.getDouble(1)
      vecs(i) = s.getArray(2).toDoubleArray()
      i += 1
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val chosen = new Array[Boolean](n)
    // max cosine to the selected set; NaN marks "nothing selected yet"
    val maxSim = Array.fill(n)(Double.NaN)
    val out = Array.newBuilder[Any]
    var r = 1
    val kk = math.min(k, n)
    while (r <= kk) {
      var best = -1
      var bestScore = 0.0
      var ci = 0
      while (ci < n) {
        if (!chosen(ci)) {
          val pen = if (maxSim(ci).isNaN) 0.0 else maxSim(ci)
          val sc = lam * rel(ci) - (1.0 - lam) * pen
          if (best < 0 || sc > bestScore ||
              (sc == bestScore && ids(ci) < ids(best))) {
            best = ci; bestScore = sc
          }
        }
        ci += 1
      }
      chosen(best) = true
      out += org.apache.spark.sql.catalyst.InternalRow(r, ids(best), bestScore)
      var cj = 0
      while (cj < n) {
        if (!chosen(cj)) {
          val c2 = cos(vecs(cj), vecs(best))
          if (maxSim(cj).isNaN || c2 > maxSim(cj)) maxSim(cj) = c2
        }
        cj += 1
      }
      r += 1
    }
    new GenericArrayData(out.result())
  }
}

/** Codegen'd MMR selection over a per-query candidate array of
  * `struct(id BIGINT, rel DOUBLE, vec ARRAY<DOUBLE>)` — see [[MmrKernels]].
  */
case class MmrSelect(child: Expression, k: Int, lam: Double)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("rnk",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: org.apache.spark.sql.types.StructType, _) if s.length == 3 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"MmrSelect expects ARRAY<STRUCT(id, rel, vec)> input, got ${other.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    MmrKernels.select(input.asInstanceOf[ArrayData], k, lam)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.MmrKernels.select($c, $k, $lam)")
  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrSelect {
  def apply(cands: Column, k: Int, lam: Double): Column =
    ColumnBridge.column(MmrSelect(ColumnBridge.expression(cands), k, lam))
}
