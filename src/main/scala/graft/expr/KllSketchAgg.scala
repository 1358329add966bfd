package graft.expr

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile-sketch aggregate (Karnin/Lang/Liberty 2016, via the
  * Apache DataSketches heap implementation): folds a double column
  * into one serialized KLL sketch — the mergeable order-statistics
  * summary the manifest quantile tier (X218) records per generation
  * dir. A TypedImperativeAggregate like [[TopKAgg]]: map-side
  * partials are sketches (O(k log n) state regardless of input
  * size), merges are sketch merges, and the exchange carries
  * kilobytes per (mapper, group) instead of the column.
  *
  * The result is the sketch's BINARY image (not a quantile): the
  * caller decides the ranks at READ time, and recorded images
  * compose by merge — exactly what a per-dir manifest stat needs
  * (per-dir sketches at commit, one driver-side merge at serve).
  *
  * Honesty: KLL compaction flips random coins, so two aggregations
  * of the same data may record DIFFERENT (all individually valid)
  * sketch images — this is a recorded ESTIMATE artifact with an
  * error bound (~1.65% normalized rank error at the default k=200,
  * 99% confidence), not a replayable value; specs assert rank-error
  * bands against exact order statistics, never bit equality. Nulls
  * and NaN are skipped (NaN has no place in an order statistic);
  * ±Infinity participates — it IS an honest extreme order stat. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8, s"KLL k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = false

  override def dataType: DataType = BinaryType

  override def prettyName: String = "graft_kll_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"input must be double (cast numerics explicitly), got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  @transient private lazy val childProj = UnsafeProjection.create(Array(child))

  override def update(
      buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val r = childProj(input)
    if (!r.isNullAt(0)) {
      val v = r.getDouble(0)
      if (!java.lang.Double.isNaN(v)) buf.update(v)
    }
    buf
  }

  override def merge(
      buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified images may come back read-only shaped; merging into a
    // fresh updatable instance is the documented-safe rehydration
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren(0))
}

/** Scalar serve of a KLL sketch image: `graft_kll_quantile(sketch,
  * p)` → the sketch's value at normalized rank p — the read half of
  * the [[KllSketchAgg]] workflow, so GROUP-BY quantile dashboards
  * stay in one SQL text:
  *
  *   SELECT grp, graft_kll_quantile(graft_kll_sketch(v), 0.5)
  *   FROM t GROUP BY grp
  *
  * Same honesty as the aggregate: the served value carries the
  * sketch's ~1.65%-rank-error band and the image itself is
  * randomized — spec assertions are bands, never bits. Empty sketch
  * (all-null input) → null (no data, no order statistic). */
case class KllQuantile(
    left: Expression,
    right: Expression,
) extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expects (binary sketch, double rank), got ($l, $r)")
    }

  override protected def nullSafeEval(img: Any, p: Any): Any =
    compute(img.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])

  def compute(img: Array[Byte], rank: Double): java.lang.Double = {
    if (rank < 0.0 || rank > 1.0)
      throw new IllegalArgumentException(s"rank must be in [0, 1]: $rank")
    val s = KllDoublesSketch.heapify(Memory.wrap(img))
    if (s.isEmpty) null else java.lang.Double.valueOf(s.getQuantile(rank))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kllQuantile", this,
      classOf[KllQuantile].getName)
    nullSafeCodeGen(ctx, ev, (img, p) => s"""
      java.lang.Double ${ev.value}Boxed = $ref.compute($img, $p);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

object KllSketchAgg {

  /** Column form of [[KllQuantile]]. */
  def kllQuantile(sketch: org.apache.spark.sql.Column,
      p: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}
    toColumn(KllQuantile(toExpr(sketch), toExpr(p)))
  }

  /** The DataSketches default accuracy point: ~1.65% normalized rank
    * error at 99% confidence, ~3 KB serialized at stream lengths the
    * manifest tier sees. Frozen for recorded artifacts the same way
    * [[graft.io.SnapshotBucketedStore.NdvLgK]] is: images of
    * different k still merge (KLL downgrades to the smaller k), but
    * a stable k keeps every dir's error bound uniform. */
  val DefaultK: Int = 200

  /** Column form: `kllSketch(col)` aggregates a DOUBLE column to the
    * serialized KLL sketch binary. Cast numerics explicitly — the
    * double promotion is the caller's stated, visible choice (ints
    * beyond 2^53 round; same caveat as any double quantile path). */
  def kllSketch(c: org.apache.spark.sql.Column,
      k: Int = DefaultK): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}
    toColumn(KllSketchAgg(toExpr(c), k).toAggregateExpression())
  }

  /** Driver-side union of recorded sketch images (merge order fixed
    * by the caller for a deterministic structure GIVEN the images);
    * None when every image is empty — no data, no order statistic. */
  def mergeImages(images: Seq[Array[Byte]], k: Int = DefaultK): Option[KllDoublesSketch] = {
    val u = KllDoublesSketch.newHeapInstance(k)
    images.foreach(b => u.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    if (u.isEmpty) None else Some(u)
  }

  /** Population Stability Index between two sketches: equal-probability
    * bin boundaries from the REFERENCE, bin probabilities as rank
    * differences on each side, Σ (pᵢ−qᵢ)·ln(pᵢ/qᵢ) with 1e-6 clamps
    * (an empty bin is evidence, not a division by zero). The standard
    * drift score (< 0.1 stable, 0.1–0.25 investigate, > 0.25 shifted);
    * inherits both sketches' rank-error bands — an estimate,
    * band-specced, never value-pinned. */
  def psi(ref: KllDoublesSketch, cur: KllDoublesSketch, buckets: Int = 10): Double = {
    require(buckets >= 2, s"need >= 2 bins, got $buckets")
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val bounds = (1 until buckets).map(i => ref.getQuantile(i.toDouble / buckets))
    def binProbs(s: KllDoublesSketch): Seq[Double] = {
      val cum = 0.0 +: bounds.map(b =>
        s.getRank(b, QuantileSearchCriteria.INCLUSIVE)) :+ 1.0
      cum.sliding(2).map(p => math.max(0.0, p(1) - p(0))).toSeq
    }
    val eps = 1e-6
    binProbs(ref).zip(binProbs(cur)).map { case (p, q) =>
      val pc = math.max(p, eps)
      val qc = math.max(q, eps)
      (pc - qc) * math.log(pc / qc)
    }.sum
  }
}
