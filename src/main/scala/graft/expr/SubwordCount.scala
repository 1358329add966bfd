package graft.expr

import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocab-driven subword token count (WordPiece-style greedy
  * longest-match-first) of a text column, as ONE compiled loop:
  * whitespace-tokenize, lowercase each word (Locale.ROOT — ASCII
  * fold, matching DuckDB/SQL `lower`), then per word repeatedly
  * consume the LONGEST vocab entry matching at the cursor, or one
  * character when nothing matches (the per-char [UNK] fallback), and
  * count consumed pieces.
  *
  * This is the production-real successor to the regex proxy
  * [[graft.llm.TextOps.bpeishCount]]: the vocabulary is data, not a
  * pattern — swap in any subword list (one entry per line via
  * [[graft.llm.TextOps.loadVocab]]) without touching the expression.
  *
  * Determinism across engines: at every cursor position both engines
  * take the MAXIMUM length over matching vocab entries; two distinct
  * entries of equal length cannot both match the same substring, so
  * there are no ties to break. The q37 oracle replays the identical
  * algorithm in DuckDB as a recursive CTE over distinct words.
  *
  * Scale: pure map-side per-row work — no shuffle, linear in input,
  * vocab lookup is O(entries-sharing-first-char) via a 128-way
  * first-byte index. Stays inside whole-stage codegen through the
  * same reference-object pattern as [[ShingleHashes]].
  */
case class SubwordCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "vocab must not be empty")
  require(vocab.distinct.length == vocab.length, "vocab entries must be distinct")
  require(vocab.forall(_.nonEmpty), "vocab entries must be non-empty")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_subword_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val ws = Pattern.compile("\\s+")

  /** Vocab entries bucketed by first char (ASCII fast path), each
    * bucket sorted longest-first so the first `startsWith` hit IS the
    * greedy match. */
  @transient private lazy val byFirstChar: Map[Char, Array[String]] =
    vocab.groupBy(_.charAt(0)).map { case (c, es) =>
      c -> es.sortBy(-_.length).toArray
    }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Generated code calls back into this via a codegen reference
    * object — the surrounding operator stays in whole-stage codegen
    * and the loop is plain compiled JVM code either way. */
  def compute(input: UTF8String): Int = {
    val toks = ws.split(input.toString, -1)
    var total = 0
    var t = 0
    while (t < toks.length) {
      val w = toks(t).toLowerCase(Locale.ROOT)
      val len = w.length
      var pos = 0
      while (pos < len) {
        var advance = 1
        byFirstChar.get(w.charAt(pos)) match {
          case Some(entries) =>
            var i = 0
            var found = false
            while (i < entries.length && !found) {
              if (w.startsWith(entries(i), pos)) {
                advance = entries(i).length
                found = true
              }
              i += 1
            }
          case None => ()
        }
        pos += advance
        total += 1
      }
      t += 1
    }
    total
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("subwordCount", this, classOf[SubwordCount].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}
