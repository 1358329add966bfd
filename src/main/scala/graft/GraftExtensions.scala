package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions with the session function registry, making
  * them available to SQL texts as well as the DataFrame API
  * (`spark.sql("SELECT graft_dot(a, b) ...")`).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  * The DataFrame-API path ([[graft.llm.Similarity.dot]]) does NOT
  * require the extension — it builds the expression directly — so a
  * session without it still runs every catalog query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[graft.expr.DotProduct].getName, "graft_dot"),
        (exprs: Seq[Expression]) => graft.expr.DotProduct(exprs(0), exprs(1)),
      )
    )
    // graft_shingle_hashes(text, n): n must be a literal (it selects
    // the coefficient family at plan build time)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_shingle_hashes"),
        new ExpressionInfo(classOf[graft.expr.ShingleHashes].getName, "graft_shingle_hashes"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2 && exprs(1).foldable,
            "usage: graft_shingle_hashes(text, <literal n>)")
          val n = exprs(1).eval().asInstanceOf[Number].intValue()
          require(n >= 1 && n <= graft.llm.TextOps.ShingleC.length,
            s"graft_shingle_hashes: n must be in [1, ${graft.llm.TextOps.ShingleC.length}] " +
              s"(the frozen coefficient family has ${graft.llm.TextOps.ShingleC.length} slots); got $n")
          graft.expr.ShingleHashes(
            exprs(0), n,
            graft.llm.TextOps.ShingleC.take(n),
            graft.llm.TextOps.ShingleM)
        },
      )
    )
    // graft_subword_count(text): greedy longest-match over the frozen
    // default vocabulary
    ext.injectFunction(
      (
        FunctionIdentifier("graft_subword_count"),
        new ExpressionInfo(classOf[graft.expr.SubwordCount].getName, "graft_subword_count"),
        (exprs: Seq[Expression]) =>
          graft.expr.SubwordCount(exprs(0), graft.llm.TextOps.SubwordVocab),
      )
    )
    // graft_top_k(score, payload, k): bounded per-group top-k
    // aggregate; k must be a literal (it sizes the heap at plan build
    // time). The registry receives the bare AggregateFunction — the
    // analyzer wraps it in an AggregateExpression like any built-in
    // aggregate, so GROUP BY / window / partial modes all apply.
    ext.injectFunction(
      (
        FunctionIdentifier("graft_top_k"),
        new ExpressionInfo(classOf[graft.expr.TopKAgg].getName, "graft_top_k"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3 && exprs(2).foldable,
            "usage: graft_top_k(score, payload, <literal k>)")
          graft.expr.TopKAgg(
            exprs(0), exprs(1),
            exprs(2).eval().asInstanceOf[Number].intValue())
        },
      )
    )
    // graft_blocklist_hits(text, term, term, ...): the Aho–Corasick
    // screen (X219); terms must be string literals — the automaton is
    // built once at plan time from the frozen list
    ext.injectFunction(
      (
        FunctionIdentifier("graft_blocklist_hits"),
        new ExpressionInfo(classOf[graft.expr.BlocklistHits].getName,
          "graft_blocklist_hits"),
        (exprs: Seq[Expression]) => {
          require(exprs.length >= 2 && exprs.tail.forall(_.foldable),
            "usage: graft_blocklist_hits(text, <literal term>, ...)")
          graft.expr.BlocklistHits(exprs(0),
            exprs.tail.map(_.eval().toString))
        },
      )
    )
    // graft_blocklist_redact(text, term, term, ...): the masking
    // sibling — every matched span's code units become '*'
    ext.injectFunction(
      (
        FunctionIdentifier("graft_blocklist_redact"),
        new ExpressionInfo(classOf[graft.expr.BlocklistRedact].getName,
          "graft_blocklist_redact"),
        (exprs: Seq[Expression]) => {
          require(exprs.length >= 2 && exprs.tail.forall(_.foldable),
            "usage: graft_blocklist_redact(text, <literal term>, ...)")
          graft.expr.BlocklistRedact(exprs(0),
            exprs.tail.map(_.eval().toString))
        },
      )
    )
    // graft_unicode_normalize(text, <literal form>): NFC/NFKC/NFD/NFKD
    ext.injectFunction(
      (
        FunctionIdentifier("graft_unicode_normalize"),
        new ExpressionInfo(classOf[graft.expr.UnicodeNormalize].getName,
          "graft_unicode_normalize"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2 && exprs(1).foldable,
            "usage: graft_unicode_normalize(text, <literal form>)")
          graft.expr.UnicodeNormalize(exprs(0), exprs(1).eval().toString)
        },
      )
    )
    // graft_deflate_len(text): compressed-size signal (X148 family)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_deflate_len"),
        new ExpressionInfo(classOf[graft.expr.DeflateLen].getName,
          "graft_deflate_len"),
        (exprs: Seq[Expression]) => graft.expr.DeflateLen(exprs(0)),
      )
    )
    // graft_kll_sketch(x[, <literal k>]): mergeable quantile-sketch
    // aggregate over a double column (X218's recording primitive)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kll_sketch"),
        new ExpressionInfo(classOf[graft.expr.KllSketchAgg].getName,
          "graft_kll_sketch"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 1 || (exprs.length == 2 && exprs(1).foldable),
            "usage: graft_kll_sketch(x[, <literal k>])")
          val k =
            if (exprs.length == 2) exprs(1).eval().asInstanceOf[Number].intValue()
            else graft.expr.KllSketchAgg.DefaultK
          graft.expr.KllSketchAgg(exprs(0), k)
        },
      )
    )
    // graft_sign_project(vec, <literal k>, <literal d>): JL sign
    // projection — the matrix is a plan-time constant (X227)
    ext.injectFunction(
      (
        FunctionIdentifier("graft_sign_project"),
        new ExpressionInfo(classOf[graft.llm.Projection.type].getName,
          "graft_sign_project"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
            "usage: graft_sign_project(vec, <literal k>, <literal d>)")
          // a RESOLVED catalyst tree (the Column bridge would leave
          // unresolved array/* nodes the registry seam can't plan)
          import org.apache.spark.sql.catalyst.expressions.{Cast, CreateArray, Literal, Multiply}
          import org.apache.spark.sql.types.{ArrayType, DoubleType}
          val k = exprs(1).eval().asInstanceOf[Number].intValue()
          val d = exprs(2).eval().asInstanceOf[Number].intValue()
          require(k >= 1 && d >= 1, s"need k, d >= 1: k=$k d=$d")
          val signs = graft.llm.Projection.signMatrix(k, d)
          val scale = Literal(1.0 / math.sqrt(k.toDouble))
          val v = Cast(exprs(0), ArrayType(DoubleType))
          CreateArray((0 until k).map { j =>
            Multiply(
              graft.expr.DotProduct(v,
                Literal.create(signs(j), ArrayType(DoubleType, containsNull = false))),
              scale)
          })
        },
      )
    )
    // graft_kll_quantile(sketch, p): serve a rank from a recorded
    // KLL image — the read half of graft_kll_sketch
    ext.injectFunction(
      (
        FunctionIdentifier("graft_kll_quantile"),
        new ExpressionInfo(classOf[graft.expr.KllQuantile].getName,
          "graft_kll_quantile"),
        (exprs: Seq[Expression]) => {
          require(exprs.length == 2,
            "usage: graft_kll_quantile(sketch, rank)")
          graft.expr.KllQuantile(exprs(0), exprs(1))
        },
      )
    )
  }
}
