package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct blocklist terms occurring in a text column, as ONE
  * compiled Aho–Corasick pass (Aho/Corasick 1975 — the multi-pattern
  * automaton): goto/fail links walked once over the text's UTF-16
  * code units, output links collecting every matched term id —
  * O(|text| + hits) per row regardless of blocklist size. The result
  * is the SORTED (UTF-8 binary order — Spark's and DuckDB's shared
  * string collation) distinct matched-term array; `size(...) > 0` is
  * the screening decision, the array itself the attribution a
  * filtered corpus must record (WHY a document was dropped).
  *
  * Why an expression and not a join: the declarative form is
  * `documents JOIN terms ON contains(text, term)` — a theta-join no
  * engine can hash, planned as a nested loop that rescans every text
  * once PER TERM (a 10k-term blocklist over 100 TB reads the corpus
  * 10k times). The automaton is built once per executor from the
  * broadcast term list and shares one text scan across all terms —
  * the q171 oracle replays the join form at fixture scale, where it
  * is merely slow instead of impossible.
  *
  * Semantics, stated exactly: plain SUBSTRING match on code units —
  * no case folding, no word boundaries (fold/normalize explicitly
  * upstream: `lower(col)` and [[UnicodeNormalize]] are the composable
  * knobs, same discipline as the dedup normalizers X105). Overlapping
  * and nested occurrences all count ("he" and "she" both hit inside
  * "ushers"); a term occurring twice reports once (the array is
  * DISTINCT — screening wants membership, [[SubwordCount]]-style
  * counting is a different operator). Empty text → empty array; null
  * text → null.
  *
  * Scale: pure map-side per-row work, no shuffle; the automaton is
  * immutable after [[freeze]] (flat int arrays, binary-searched
  * transitions — no per-char boxing, cache-friendly) and rides the
  * expression reference object into whole-stage codegen like the
  * rest of the family ([[WordPieceEncode]], [[MmrSelect]]).
  */
case class BlocklistHits(
    child: Expression,
    terms: Seq[String],
) extends UnaryExpression {

  require(terms.nonEmpty, "blocklist must not be empty")
  require(terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
  require(terms.distinct.length == terms.length,
    "blocklist terms must be distinct")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_blocklist_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  /** Terms in UTF-8 binary order — rank IS the emit order, so the
    * match loop collects a bitset of ranks and the output array is
    * sorted by construction. */
  @transient private lazy val sortedTerms: Array[UTF8String] =
    terms.map(UTF8String.fromString).sorted.toArray

  @transient private lazy val automaton: BlocklistHits.Automaton =
    BlocklistHits.build(sortedTerms.map(_.toString))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): GenericArrayData = {
    val hits = automaton.matchRanks(input.toString)
    val out = new Array[Any](hits.cardinality())
    var i = hits.nextSetBit(0)
    var n = 0
    while (i >= 0) {
      out(n) = sortedTerms(i)
      n += 1
      i = hits.nextSetBit(i + 1)
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("blocklistHits", this,
      classOf[BlocklistHits].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistHits =
    copy(child = newChild)
}

object BlocklistHits {

  /** Frozen AC automaton: per-node transition slices into two flat
    * parallel arrays (chars sorted — binary search, no boxing), fail
    * links, and output links (nearest fail-ancestor that ends a
    * term) so per-position hit collection walks only actual hits. */
  final class Automaton(
      private val transStart: Array[Int], // node -> first slot (len = nodes+1)
      private val transChar: Array[Char], // slot -> edge char (sorted per node)
      private val transNext: Array[Int], // slot -> target node
      private val fail: Array[Int], // node -> fail node
      private val termRank: Array[Int], // node -> rank of term ending here, or -1
      private val outLink: Array[Int], // node -> nearest output node via fail, or -1
  ) extends Serializable {

    private def step(from: Int, c: Char): Int = {
      var state = from
      while (true) {
        var lo = transStart(state)
        var hi = transStart(state + 1) - 1
        while (lo <= hi) { // binary search this node's edge slice
          val mid = (lo + hi) >>> 1
          val mc = transChar(mid)
          if (mc == c) return transNext(mid)
          else if (mc < c) lo = mid + 1
          else hi = mid - 1
        }
        if (state == 0) return 0
        state = fail(state)
      }
      0 // unreachable
    }

    /** Ranks (emit-order term ids) of every term occurring in `s`. */
    def matchRanks(s: String): java.util.BitSet = {
      val hits = new java.util.BitSet()
      var state = 0
      var i = 0
      while (i < s.length) {
        state = step(state, s.charAt(i))
        var o = if (termRank(state) >= 0) state else outLink(state)
        while (o >= 0) {
          hits.set(termRank(o))
          o = outLink(o)
        }
        i += 1
      }
      hits
    }

    /** Code-unit positions covered by ANY match — the union of all
      * match intervals (overlapping and nested spans merge for
      * free in the bitset). `rankLen(r)` = length of term rank r. */
    def coverMask(s: String, rankLen: Array[Int]): java.util.BitSet = {
      val covered = new java.util.BitSet(s.length)
      var state = 0
      var i = 0
      while (i < s.length) {
        state = step(state, s.charAt(i))
        var o = if (termRank(state) >= 0) state else outLink(state)
        while (o >= 0) {
          covered.set(i - rankLen(termRank(o)) + 1, i + 1)
          o = outLink(o)
        }
        i += 1
      }
      covered
    }
  }

  /** Classic build: trie insert, BFS fail links, then freeze the
    * HashMap trie into the flat binary-searchable form. `terms` must
    * already be in emit (rank) order. */
  def build(terms: Array[String]): Automaton = {
    val children = scala.collection.mutable.ArrayBuffer(
      new java.util.TreeMap[Character, Integer]())
    val rank = scala.collection.mutable.ArrayBuffer(-1)
    terms.zipWithIndex.foreach { case (t, r) =>
      var node = 0
      var i = 0
      while (i < t.length) {
        val c = Character.valueOf(t.charAt(i))
        val nxt = children(node).get(c)
        node = if (nxt != null) nxt.intValue()
        else {
          children += new java.util.TreeMap[Character, Integer]()
          rank += -1
          val id = children.length - 1
          children(node).put(c, Integer.valueOf(id))
          id
        }
        i += 1
      }
      rank(node) = r
    }
    val n = children.length
    val fail = new Array[Int](n)
    val outLink = Array.fill(n)(-1)
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      // u's output link: its fail node if that ends a term, else the
      // fail node's own output link (already final — BFS order)
      outLink(u) =
        if (rank(fail(u)) >= 0) fail(u) else outLink(fail(u))
      children(u).forEach { (c, v) =>
        // child's fail: deepest proper suffix state with an edge on c
        var f = fail(u)
        var target = 0
        var found = false
        while (!found) {
          val t = children(f).get(c)
          if (t != null) { target = t.intValue(); found = true }
          else if (f == 0) { target = 0; found = true }
          else f = fail(f)
        }
        fail(v.intValue()) = target
        queue.add(v)
      }
    }
    // freeze: per-node sorted edge slices (TreeMap iterates sorted)
    val totalEdges = children.iterator.map(_.size()).sum
    val transStart = new Array[Int](n + 1)
    val transChar = new Array[Char](totalEdges)
    val transNext = new Array[Int](totalEdges)
    var slot = 0
    var node = 0
    while (node < n) {
      transStart(node) = slot
      children(node).forEach { (c, v) =>
        transChar(slot) = c.charValue()
        transNext(slot) = v.intValue()
        slot += 1
      }
      node += 1
    }
    transStart(n) = slot
    new Automaton(transStart, transChar, transNext, fail, rank.toArray, outLink)
  }

  /** Column form: sorted distinct blocklist terms occurring in
    * `text` (substring semantics — fold/normalize upstream). */
  def blocklistHits(text: org.apache.spark.sql.Column,
      terms: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}
    toColumn(BlocklistHits(toExpr(text), terms))
  }

  /** Column form of [[BlocklistRedact]]: every matched span masked. */
  def blocklistRedact(text: org.apache.spark.sql.Column,
      terms: Seq[String], mask: Char = '*'): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftBridge.{toColumn, toExpr}
    toColumn(BlocklistRedact(toExpr(text), terms, mask))
  }
}

/** Blocklist REDACTION — [[BlocklistHits]]'s masking sibling: every
  * code unit covered by ANY term match is replaced by `mask`, one
  * automaton pass per row. The interval UNION is the semantic (in
  * "scan slow fast" with terms "scan slow" and "slow fast" the whole
  * overlap masks — partial redaction of an overlapping banned span
  * would leak it); length in code units is preserved, so downstream
  * offset-based features (chunk boundaries, span labels) stay
  * aligned. Same match contract as [[BlocklistHits]] (substring on
  * code units, no folding — normalize upstream); a supplementary
  * character inside a span masks as TWO mask units (stated, spec'd
  * — length preservation wins over codepoint aesthetics). Null →
  * null; no match → the input unchanged (no copy). */
case class BlocklistRedact(
    child: Expression,
    terms: Seq[String],
    mask: Char = '*',
) extends UnaryExpression {

  require(terms.nonEmpty, "blocklist must not be empty")
  require(terms.forall(_.nonEmpty), "blocklist terms must be non-empty")
  require(terms.distinct.length == terms.length,
    "blocklist terms must be distinct")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_blocklist_redact"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"expects string input, got $t")
    }

  @transient private lazy val sortedTerms: Array[String] =
    terms.map(UTF8String.fromString).sorted.map(_.toString).toArray

  @transient private lazy val rankLen: Array[Int] = sortedTerms.map(_.length)

  @transient private lazy val automaton: BlocklistHits.Automaton =
    BlocklistHits.build(sortedTerms)

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val covered = automaton.coverMask(s, rankLen)
    if (covered.isEmpty) return input
    val arr = s.toCharArray
    var i = covered.nextSetBit(0)
    while (i >= 0) {
      arr(i) = mask
      i = covered.nextSetBit(i + 1)
    }
    UTF8String.fromString(new String(arr))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode,
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("blocklistRedact", this,
      classOf[BlocklistRedact].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $ref.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistRedact =
    copy(child = newChild)
}
