package graft.expr

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded per-group TOP-K aggregate: keeps the `k` payloads with the
  * highest scores (score DESC, payload ASC on ties), evaluated as the
  * sorted payload array.
  *
  * Why an aggregate and not the idiomatic window: Spark's only native
  * per-group top-k is `row_number() OVER (PARTITION BY g ORDER BY s)
  * <= k` — which SORTS every group in full and cannot combine
  * map-side, so the exchange carries every input row. This aggregate
  * is a TypedImperativeAggregate over a bounded heap: each map task
  * reduces its slice of a group to <= k entries BEFORE the shuffle
  * (partial mode), merges are heap-unions, and per-group state is
  * O(k) BY CONSTRUCTION regardless of group size. At 100 TB the
  * difference is shuffling k rows per (mapper, group) vs shuffling
  * the corpus.
  *
  * Determinism: the kept set and its order depend only on the total
  * order (score DESC, payload ASC — payload ties broken by the
  * interpreted ordering of its type), never on arrival order, so the
  * result is stable under any partitioning; an equivalence spec pins
  * it pointwise equal to the window formulation, and q62's DuckDB
  * oracle replays the window form against this aggregate's output.
  * Null scores are skipped (SQL aggregate convention), and so are
  * null PAYLOADS (the output array is containsNull = false; a window
  * formulation would rank such rows, so the pointwise-equivalence
  * contract holds only for payload expressions that never evaluate
  * to null — every in-repo caller passes a struct(...), which is
  * non-null by construction). NaN ranks above every finite score,
  * matching Spark's DESC sort order.
  *
  * The buffer serializes through an UnsafeProjection of
  * (score, payload) rows — the same storage-format technique Spark's
  * own percentile/collect aggregates use; payload type is anything
  * RowOrdering can sort (atomics, structs, arrays of those). */
case class TopKAgg(
    score: Expression,
    payload: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[mutable.PriorityQueue[(Any, Any)]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, payload)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(payload.dataType, containsNull = false)

  override def prettyName: String = "graft_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType && score.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"score must be double or long, got ${score.dataType}")
    else TypeUtils.checkForOrderingExpr(payload.dataType, prettyName)

  /** Score comparison: doubles via Double.compare (NaN ranks above
    * every finite, matching Spark's DESC order), longs exactly — the
    * long path is what keeps integer-score rankings (BM25's idf·sat
    * sums) exact at ANY magnitude, where a double key would round
    * past 2⁵³. */
  @transient private lazy val scoreCmp: (Any, Any) => Int =
    if (score.dataType == LongType)
      (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    else
      (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])

  @transient private lazy val payloadOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(payload.dataType)
      .asInstanceOf[Ordering[Any]]

  /** Heap order: the WORST entry at the head (lowest score; ties →
    * LARGEST payload), so eviction is one dequeue. */
  @transient private lazy val worstFirst: Ordering[(Any, Any)] =
    new Ordering[(Any, Any)] {
      override def compare(a: (Any, Any), b: (Any, Any)): Int = {
        val c = scoreCmp(b._1, a._1)
        if (c != 0) c else payloadOrd.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Any, Any)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Any, Any)],
      entry: (Any, Any)): Unit = {
    if (buf.size < k) buf.enqueue(entry)
    else if (worstFirst.compare(entry, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(entry)
    }
  }

  // the update path evaluates children through CODEGEN'D projections,
  // not Expression.eval: the aggregate's child expressions arrive
  // inlined by the optimizer (the projection below the aggregate is
  // collapsed into it), so eval() would walk the full interpreted
  // tree — score and payload both — once per input row. Measured on
  // the q158 Hamming scan, the generated projections are ~10× the
  // interpreted walk; the score projection alone gates the payload
  // work exactly like the eval form did.
  @transient private lazy val scoreProj =
    UnsafeProjection.create(Array(score))
  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payload))

  override def update(
      buf: mutable.PriorityQueue[(Any, Any)],
      input: InternalRow): mutable.PriorityQueue[(Any, Any)] = {
    val sr = scoreProj(input)
    if (!sr.isNullAt(0)) {
      val sv: Any =
        if (score.dataType == LongType) java.lang.Long.valueOf(sr.getLong(0))
        else java.lang.Double.valueOf(sr.getDouble(0))
      // skip the payload copy entirely when the score alone already
      // loses to the current worst (the common case on big groups)
      if (buf.size < k || scoreCmp(sv, buf.head._1) >= 0) {
        val pr = payloadProj(input)
        if (!pr.isNullAt(0))
          insert(buf, (sv, InternalRow.copyValue(pr.get(0, payload.dataType))))
      }
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Any, Any)],
      other: mutable.PriorityQueue[(Any, Any)]): mutable.PriorityQueue[(Any, Any)] = {
    other.foreach(insert(buf, _))
    buf
  }

  // sorted() puts the ordering-MINIMAL element first, and worstFirst's
  // minimum is the BEST entry — so ascending worstFirst IS best-first
  override def eval(buf: mutable.PriorityQueue[(Any, Any)]): Any =
    new GenericArrayData(
      buf.toSeq.sorted(worstFirst).map(_._2).toArray)

  @transient private lazy val entryProj =
    UnsafeProjection.create(Array(score.dataType, payload.dataType))

  override def serialize(buf: mutable.PriorityQueue[(Any, Any)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val row = new GenericInternalRow(2)
    buf.foreach { case (s, p) =>
      row.update(0, s)
      row.update(1, p)
      val u = entryProj(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Any, Any)] = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val arr = new Array[Byte](len)
      in.get(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf.enqueue(
        (InternalRow.copyValue(row.get(0, score.dataType)),
          InternalRow.copyValue(row.get(1, payload.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), payload = newChildren(1))
}

object TopKAgg {

  /** Column form: `topK(score, payload, k)` aggregates to the
    * array<payload-type> of the k best payloads, score DESC then
    * payload ASC. Score may be double (NaN ranks first) or long
    * (exact at any magnitude — the integer-score ranking path). */
  def topK(score: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}
    toColumn(TopKAgg(toExpr(score), toExpr(payload), k).toAggregateExpression())
  }
}
