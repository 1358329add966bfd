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

/** FUSED asymmetric-distance cosine: sim = dot(q, decode(packed)) /
  * (qnorm · |decode(packed)|) computed in ONE compiled pass straight
  * from the PACKED code BIGINT — no intermediate codes array, no
  * decoded-codeword allocation, no three-expression chain. This is
  * the ADC hot loop of the IVF-PQ candidate scorer: per candidate,
  * 2·dims multiplies against codebook entries addressed by 4-bit
  * shifts out of one long.
  *
  * BIT-EQUALITY CONTRACT (what makes this a drop-in for the oracled
  * q148/q149 chain): both accumulations run sequentially left-to-
  * right over the flat element order — exactly [[DotProduct]] over
  * [[PqDecode]]'s output — so dot, norm, and the final division are
  * the identical IEEE sequences the unfused form produces. Returns
  * NULL when the decoded norm is zero (the unfused form's
  * `dnrm > 0` filter becomes an isNotNull filter — same surviving
  * rows, same values).
  *
  * Codes are masked to [0, K): a corrupted packed value scores
  * against a wrong-but-in-range codeword rather than crashing the
  * scan (the 4-bit mask makes out-of-range impossible for K = 16).
  */
case class PqCosineScore(
    first: Expression, second: Expression, third: Expression,
    codebook: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  private val m = codebook.length
  private val k = codebook.head.length
  private val sub = codebook.head.head.length
  require(k <= 16, "packed 4-bit codes hold at most 16 centroids")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_cosine"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, org.apache.spark.sql.types.LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"expects (array<double> query, double qnorm, bigint packed), got $t")
    }

  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var i = 0
    for (mm <- 0 until m; kk <- 0 until k; j <- 0 until sub) {
      a(i) = codebook(mm)(kk)(j); i += 1
    }
    a
  }

  override protected def nullSafeEval(q: Any, qn: Any, packed: Any): Any =
    compute(q.asInstanceOf[ArrayData], qn.asInstanceOf[Double],
      packed.asInstanceOf[Long])

  /** Boxed Double (null for zero decoded norm). */
  def compute(q: ArrayData, qn: Double, packed: Long): java.lang.Double = {
    var dot = 0.0
    var nrm2 = 0.0
    var mm = 0
    while (mm < m) {
      val code = ((packed >>> (4 * mm)) & 15L).toInt % k
      val base = (mm * k + code) * sub
      var j = 0
      while (j < sub) {
        val c = flat(base + j)
        dot += q.getDouble(mm * sub + j) * c
        nrm2 += c * c
        j += 1
      }
      mm += 1
    }
    val dnrm = java.lang.Math.sqrt(nrm2)
    if (dnrm == 0.0) null else java.lang.Double.valueOf(dot / (qn * dnrm))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqCosine", this, classOf[PqCosineScore].getName)
    val sim = ctx.freshName("graftPqSim")
    nullSafeCodeGen(ctx, ev, (q, qn, p) => s"""
       |java.lang.Double $sim = $ref.compute($q, $qn, $p);
       |if ($sim == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $sim.doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqCosineScore =
    copy(first = f, second = s, third = t)
}
