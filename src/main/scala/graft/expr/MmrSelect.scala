package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance selection (Carbonell/Goldstein 1998):
  * greedily pick up to k candidates maximizing
  *
  *   score(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * (the penalty term is 0.0 for the first pick — selected is empty),
  * ties on (score DESC, id ASC). The per-query diversification every
  * retrieval stack bolts onto its top-k: near-duplicate hits crowd
  * out coverage, MMR trades relevance against redundancy.
  *
  * Inputs are PER-QUERY bounded arrays (a candidate pool, never the
  * corpus): `left` = array<struct<id: long, rel: double>>, `right` =
  * array<struct<a: long, b: long, s: double>> with canonical a < b —
  * the pool's pairwise similarities. Output = the selected
  * array<struct<id, score>> in pick order. O(k·n²) over n = pool
  * size — constant per query, inside whole-stage codegen via the
  * reference-object pattern.
  *
  * Every arithmetic step (λ·rel − (1−λ)·pen, the max fold, the
  * DESC/id tie order) is a fixed-shape IEEE expression the DuckDB
  * oracle mirrors step-for-step (q168 unrolls the greedy picks as
  * materialized CTEs, the q150 discipline). A pair absent from
  * `right` contributes penalty 0.0 (treated as unknown-dissimilar;
  * the catalog always supplies the full pool grid). */
case class MmrSelect(left: Expression, right: Expression, k: Int, lambda: Double)
    extends BinaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_mmr_select"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType, fields: Seq[DataType]): Boolean = dt match {
      case ArrayType(StructType(fs), _) =>
        fs.length == fields.length && fs.map(_.dataType).sameElements(fields)
      case _ => false
    }
    if (!ok(left.dataType, Seq(LongType, DoubleType)))
      TypeCheckResult.TypeCheckFailure(
        s"left expects array<struct<long,double>>, got ${left.dataType}")
    else if (!ok(right.dataType, Seq(LongType, LongType, DoubleType)))
      TypeCheckResult.TypeCheckFailure(
        s"right expects array<struct<long,long,double>>, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(cands: Any, pairs: Any): Any =
    compute(cands.asInstanceOf[ArrayData], pairs.asInstanceOf[ArrayData])

  def compute(cands: ArrayData, pairs: ArrayData): GenericArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = cands.getStruct(i, 2)
      ids(i) = r.getLong(0); rel(i) = r.getDouble(1)
      i += 1
    }
    // pair sims keyed (a, b), a < b canonical
    val sim = new java.util.HashMap[Long, Double](pairs.numElements() * 2)
    // n is a bounded pool (≤ a few hundred): index candidates densely
    val pos = new java.util.HashMap[Long, Integer](n * 2)
    i = 0
    while (i < n) { pos.put(ids(i), i); i += 1 }
    def pk(x: Int, y: Int): Long = (x.toLong << 32) | (y.toLong & 0xffffffffL)
    i = 0
    while (i < pairs.numElements()) {
      val r = pairs.getStruct(i, 3)
      val pa = pos.get(r.getLong(0)); val pb = pos.get(r.getLong(1))
      if (pa != null && pb != null) {
        sim.put(pk(math.min(pa, pb), math.max(pa, pb)), r.getDouble(2))
      }
      i += 1
    }
    val taken = new Array[Boolean](n)
    val outN = math.min(k, n)
    val out = new Array[Any](outN)
    var t = 0
    while (t < outN) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          // penalty: max sim to any already-selected candidate
          var pen = 0.0
          var first = true
          var s = 0
          while (s < n) {
            if (taken(s)) {
              val v = sim.get(pk(math.min(c, s), math.max(c, s)))
              val sv = if (v == null) 0.0 else v.doubleValue()
              if (first || sv > pen) { pen = sv; first = false }
            }
            s += 1
          }
          val score = lambda * rel(c) - (1.0 - lambda) * pen
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(c) < ids(best))) {
            best = c; bestScore = score
          }
        }
        c += 1
      }
      taken(best) = true
      out(t) = new GenericInternalRow(Array[Any](ids(best), bestScore))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("mmrSelect", this, classOf[MmrSelect].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelect =
    copy(left = newLeft, right = newRight)
}
