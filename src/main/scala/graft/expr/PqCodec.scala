package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization ENCODE: split a dim-length double vector into
  * M contiguous subvectors and emit, per subvector, the index of the
  * nearest codebook centroid (squared L2, accumulated in ascending
  * component order so the float chain is the exact expression the
  * DuckDB oracle mirrors term by term; strict `<` keeps the LOWEST
  * index on ties — both engines break ties identically on exact
  * equality of identically-shaped IEEE sums).
  *
  * Compiled loop via the reference-object pattern (one tight
  * M·K·subdim pass per row inside whole-stage codegen) — the per-row
  * cost a nested HOF expression tree would pay interpreter overhead
  * on. Codebook rides the expression (M·K·subdim doubles — KBs — in
  * the task closure, never a join).
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = codebook.length
  private val k = codebook.head.length
  private val sub = codebook.head.head.length
  require(m >= 1 && k >= 2, s"need M >= 1 subvectors and K >= 2 centroids")
  require(codebook.forall(cb => cb.length == k && cb.forall(_.length == sub)),
    "ragged codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects array<double>, got $t")
    }

  @transient private lazy val flat: Array[Double] = {
    // [m][k][j] flattened — one contiguous array for the hot loop
    val a = new Array[Double](m * k * sub)
    var i = 0
    for (mm <- 0 until m; kk <- 0 until k; j <- 0 until sub) {
      a(i) = codebook(mm)(kk)(j); i += 1
    }
    a
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(v: ArrayData): GenericArrayData = {
    require(v.numElements() == m * sub,
      s"vector length ${v.numElements()} != M*sub = ${m * sub}")
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.MaxValue
      var kk = 0
      while (kk < k) {
        var d = 0.0
        var j = 0
        val base = (mm * k + kk) * sub
        while (j < sub) {
          val diff = v.getDouble(mm * sub + j) - flat(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = kk }
        kk += 1
      }
      out(mm) = best
      mm += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Product-quantization DECODE: codes → the concatenated codeword
  * vector (the reconstruction ADC search ranks against). Same
  * compiled reference-object shape as [[PqEncode]]. */
case class PqDecode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = codebook.length
  private val k = codebook.head.length
  private val sub = codebook.head.head.length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_decode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects array<int>, got $t")
    }

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var i = 0
    for (mm <- 0 until m; kk <- 0 until k; j <- 0 until sub) {
      a(i) = codebook(mm)(kk)(j); i += 1
    }
    a
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(codes: ArrayData): GenericArrayData = {
    require(codes.numElements() == m, s"expected $m codes")
    val out = new Array[Double](m * sub)
    var mm = 0
    while (mm < m) {
      val kk = codes.getInt(mm)
      require(kk >= 0 && kk < k, s"code $kk out of [0, $k)")
      val base = (mm * k + kk) * sub
      var j = 0
      while (j < sub) { out(mm * sub + j) = flat(base + j); j += 1 }
      mm += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
