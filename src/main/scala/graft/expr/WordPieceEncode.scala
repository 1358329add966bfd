package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece encode of a text column under a frozen vocabulary, as
  * ONE compiled loop: split on single spaces (the house `tokens`
  * convention — no case folding, unlike [[SubwordCount]]'s q37
  * contract), then per word greedily consume the LONGEST matching
  * vocab piece — word-start pieces (entries without the `##` marker)
  * at position 0, `##`-continuation entries after — and emit the
  * pieces space-joined. A position with NO matching piece makes the
  * WHOLE word `[UNK]` and discards its partial pieces (the BERT
  * rule; [[SubwordCount]]'s per-char fallback is the other published
  * convention and stays as-is).
  *
  * Determinism across engines: at every cursor both engines take the
  * MAXIMUM length over matching entries, and two distinct entries of
  * equal length cannot match the same substring — no ties exist. The
  * q135 oracle replays the identical algorithm in DuckDB as a
  * recursive CTE over the distinct-word table.
  *
  * Scale: pure map-side per-row work — no shuffle, linear in input;
  * lookups are O(entries sharing the cursor char) via per-first-char
  * buckets sorted longest-first. Stays inside whole-stage codegen
  * through the same reference-object pattern as [[SubwordCount]].
  *
  * The literal entry `"##"` is rejected: as a continuation it would
  * be the empty piece (an infinite loop); no trainer emits it.
  */
case class WordPieceEncode(
    child: Expression,
    vocab: Seq[String],
    unk: String = "[UNK]",
) extends UnaryExpression {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.distinct.length == vocab.length, "vocab entries must be distinct")
  require(vocab.forall(_.nonEmpty), "vocab entries must be non-empty")
  require(!vocab.contains("##"), "the bare '##' marker is not a piece")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  /** Word-start pieces bucketed by first char, longest-first — the
    * first `startsWith` hit IS the greedy match. */
  @transient private lazy val startByFirstChar: Map[Char, Array[String]] =
    vocab.filterNot(_.startsWith("##"))
      .groupBy(_.charAt(0))
      .map { case (c, es) => c -> es.sortBy(-_.length).toArray }

  /** Continuation pieces STORED STRIPPED of their `##` marker (what
    * is matched against the word), bucketed the same way. */
  @transient private lazy val contByFirstChar: Map[Char, Array[String]] =
    vocab.filter(_.startsWith("##")).map(_.substring(2))
      .groupBy(_.charAt(0))
      .map { case (c, es) => c -> es.sortBy(-_.length).toArray }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  private def longestAt(w: String, pos: Int, index: Map[Char, Array[String]]): Int = {
    index.get(w.charAt(pos)) match {
      case Some(entries) =>
        var i = 0
        while (i < entries.length) {
          if (w.startsWith(entries(i), pos)) return entries(i).length
          i += 1
        }
        0
      case None => 0
    }
  }

  def compute(input: UTF8String): UTF8String = {
    val toks = input.toString.split(" ", -1)
    val sb = new java.lang.StringBuilder
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      if (w.nonEmpty) {
        val mark = sb.length
        if (mark > 0) sb.append(' ')
        val wordStart = sb.length
        var pos = 0
        var failed = false
        while (pos < w.length && !failed) {
          val idx = if (pos == 0) startByFirstChar else contByFirstChar
          val len = longestAt(w, pos, idx)
          if (len == 0) failed = true
          else {
            if (sb.length > wordStart) sb.append(' ')
            if (pos > 0) sb.append("##")
            sb.append(w, pos, pos + len)
            pos += len
          }
        }
        if (failed) {
          sb.setLength(wordStart)
          sb.append(unk)
        }
      }
      t += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceEncode", this,
      classOf[WordPieceEncode].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncode =
    copy(child = newChild)
}
