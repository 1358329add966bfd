package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-text unigram-LM Viterbi segmentation under a frozen
  * vocabulary, as ONE compiled loop — the serve-path successor to
  * [[graft.llm.UnigramLm]]'s nested-`aggregate` Catalyst DP. The
  * Catalyst form stays the EM-side anchor (it is what the q125 oracle
  * narrative pins and what the fit runs over the Heaps-bounded
  * distinct-word table); at SERVE scale it pays the higher-order
  * functions' per-step array allocation on EVERY word occurrence —
  * measured 61 s for q130 at sf0.1 — where this plain-JVM DP is the
  * same arithmetic in primitive arrays (~20×). Bit-identical by
  * construction and triple-pinned: UnigramLmSpec's reference DP, the
  * Catalyst expression, and this loop must agree.
  *
  * Contract (exactly [[graft.llm.UnigramLm.segment]]'s): whitespace
  * words split on single spaces, empties skipped; per word the DP
  * minimizes (total cost, piece count, split position) — the last
  * tie-break makes the LAST piece longest; unknown single chars cost
  * `unkCost` (totality), unknown multi-char pieces are not pieces.
  * Output struct: flattened `pieces`, summed `total_cost`, `n_pieces`.
  *
  * Scale: pure map-side per-row work, vocab in a task-local hash map
  * (≤ vocabSize + charset entries riding the closure); stays inside
  * whole-stage codegen via the reference-object pattern.
  */
case class UnigramSegment(
    child: Expression,
    vocab: Seq[(String, Long)],
    maxLen: Int,
    unkCost: Long,
) extends UnaryExpression {

  require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
  require(vocab.map(_._1).distinct.length == vocab.length,
    "vocab pieces must be distinct")
  require(vocab.forall(_._1.nonEmpty), "vocab pieces must be non-empty")
  require(vocab.forall(_._2 >= 0L), "piece costs must be non-negative")
  require(unkCost >= 0L, "unkCost must be non-negative")

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("total_cost", LongType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false)))

  override def prettyName: String = "graft_unigram_segment"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  private val Inf = Long.MaxValue / 4

  @transient private lazy val vm: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, c) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** DP over one word; appends its pieces, returns its terminal cost. */
  private def segmentWord(
      w: String, out: scala.collection.mutable.ArrayBuffer[UTF8String]): Long = {
    val n = w.length
    val cost = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(cost, Inf)
    cost(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (cost(j) < Inf) {
          val boxed = vm.get(w.substring(j, i))
          val pc: Long =
            if (boxed != null) boxed.longValue
            else if (i - j == 1) unkCost
            else -1L
          if (pc >= 0L) {
            val c = cost(j) + pc
            val k = np(j) + 1
            // lexicographic min on (cost, np, back) — strict, so the
            // first minimum found is kept, matching `cand < best`
            if (c < cost(i) || (c == cost(i) &&
                (k < np(i) || (k == np(i) && j < back(i))))) {
              cost(i) = c; np(i) = k; back(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    // backtrack: collect (start, end) spans right-to-left, emit in order
    var pos = n
    val ends = new Array[Int](np(n))
    var m = np(n)
    while (pos > 0) {
      m -= 1
      ends(m) = pos
      pos = back(pos)
    }
    var s = 0
    var t = 0
    while (t < ends.length) {
      out += UTF8String.fromString(w.substring(s, ends(t)))
      s = ends(t)
      t += 1
    }
    cost(n)
  }

  def compute(input: UTF8String): InternalRow = {
    val toks = input.toString.split(" ", -1)
    val pieces = new scala.collection.mutable.ArrayBuffer[UTF8String]
    var total = 0L
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) total += segmentWord(toks(t), pieces)
      t += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(pieces.toArray[Any]), total, pieces.length))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("unigramSegment", this,
      classOf[UnigramSegment].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
