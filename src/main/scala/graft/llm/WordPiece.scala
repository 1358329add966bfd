package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer induction and serve (Schuster & Nakajima 2012,
  * the BERT trainer — the third member of the house tokenizer family:
  * BPE grows by raw pair COUNT, unigram-LM prunes top-down by
  * likelihood, WordPiece grows bottom-up by likelihood GAIN).
  *
  * Fit: words decompose to a word-start char plus `##`-prefixed
  * continuation chars; each round fuses the adjacent symbol pair with
  * the maximal score cnt(ab) / (cnt(a)·cnt(b)) — the exact increase
  * surrogate of corpus likelihood under a unigram model (the
  * published criterion). Published trainers compare these fractions
  * in floating point; here the argmax is EXACT: candidates reduce
  * under BigInt cross-multiplication c₁·u_a₂·u_b₂ vs c₂·u_a₁·u_b₁
  * (ties to the lexicographically smallest pair), so the fit
  * hash-replays cross-engine — the oracle (q134) mirrors the
  * comparison in HUGEINT, whose 2¹²⁷ ceiling holds while
  * cnt·u·u < 2¹²⁷ (any corpus under ~2⁴² tokens). The fused symbol is
  * `lhs + rhs.stripPrefix("##")` so continuation status rides the
  * left edge, exactly as published.
  *
  * Scale: the working table is the DISTINCT-word table
  * (Heaps-bounded ~√corpus). Per round: one pair-count shuffle and
  * one unigram shuffle (both map-side combinable), two joins against
  * the vocab-sized unigram table (broadcast), and ONE Option[Cand]
  * per partition reaching the driver via `rdd.aggregate` — the exact
  * rational argmax is genuine per-partition imperative logic no SQL
  * ordering expresses, which is what RDD fallbacks are for. Symbol
  * rewrite is map-side; `localCheckpoint` per round caps lineage
  * (the X34 rule).
  *
  * The documented `#` caveat (shared with every published WordPiece):
  * a corpus word containing literal `#` can fuse into a symbol
  * string-identical to a continuation symbol, conflating their
  * counts. Both engines replay the conflation identically, so
  * determinism is unaffected.
  *
  * Serve is [[graft.expr.WordPieceEncode]]: greedy longest-match-first
  * with the `##` convention and WHOLE-word `[UNK]` on any uncovered
  * position (the BERT rule — partial pieces are discarded), compiled,
  * map-side, zero shuffle; q135 replays it as a recursive CTE over
  * the distinct-word table and pins fit + serve end to end.
  */
object WordPiece {

  /** One induced merge: `lhs`+`rhs` fused into `merged` at `round`
    * (1-based) with pair count `cnt` and unigram symbol counts
    * `lhsCnt`/`rhsCnt` — score = cnt/(lhsCnt·rhsCnt), kept as its
    * exact integer ingredients. */
  final case class Merge(round: Int, lhs: String, rhs: String,
      merged: String, cnt: Long, lhsCnt: Long, rhsCnt: Long)

  private[llm] def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** The (word, freq, syms) working table under the `##` convention:
    * "cat" → ["c", "##a", "##t"]. */
  private def wordTable(docs: DataFrame, textCol: String): DataFrame = {
    val w = col("w")
    docs
      .select(explode(split(coalesce(col(textCol), lit("")), " ")).as("w"))
      .groupBy(w)
      .agg(count(lit(1)).as("freq"))
      .filter(length(w) > 0)
      .withColumn("syms",
        transform(sequence(lit(1), length(w)),
          i => when(i === lit(1), w.substr(i, lit(1)))
            .otherwise(concat(lit("##"), w.substr(i, lit(1))))))
  }

  private final case class Cand(lhs: String, rhs: String,
      cnt: Long, ua: Long, ub: Long)

  /** UTF-8 binary order — the collation DuckDB's HUGEINT-oracle
    * tie-break and every Spark string sort use. JVM String `<` is
    * UTF-16 code-unit order, which DISAGREES on supplementary-plane
    * characters (an emoji sorts below U+E000..U+FFFF in UTF-16 but
    * above in UTF-8), so the tie-break must compare bytes. */
  private def u8lt(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Total-order max under (exact score DESC, (lhs, rhs) ASC in
    * UTF-8 byte order) — associative and commutative, so
    * `rdd.aggregate` is deterministic regardless of partition
    * combine order. */
  private def better(x: Cand, y: Cand): Cand = {
    val xs = BigInt(x.cnt) * BigInt(y.ua) * BigInt(y.ub)
    val ys = BigInt(y.cnt) * BigInt(x.ua) * BigInt(x.ub)
    if (xs > ys) x
    else if (ys > xs) y
    else {
      val cl = u8lt(x.lhs, y.lhs)
      if (cl < 0 || (cl == 0 && u8lt(x.rhs, y.rhs) <= 0)) x else y
    }
  }

  /** The scored candidate table of one round: adjacent-pair counts
    * joined twice against the BROADCAST vocab-sized unigram table
    * (the only tables in play after the two map-side-combinable
    * count shuffles). */
  private def candidates(words: DataFrame, minCount: Long): DataFrame = {
    val uni = words
      .select(explode(col("syms")).as("sym"), col("freq"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("u"))
    Bpe.pairCounts(words)
      .filter(col("cnt") >= minCount)
      .join(broadcast(uni.select(col("sym").as("lhs"), col("u").as("ua"))),
        Seq("lhs"))
      .join(broadcast(uni.select(col("sym").as("rhs"), col("u").as("ub"))),
        Seq("rhs"))
      .select(col("lhs"), col("rhs"), col("cnt"), col("ua"), col("ub"))
  }

  /** Round-1 [[candidates]] over a raw corpus, exposed for plan
    * audits (the `moveRoundForAudit` precedent). */
  def candidatesForAudit(docs: DataFrame, textCol: String): DataFrame =
    candidates(wordTable(docs, textCol), 1L)

  /** Run `rounds` likelihood-scored merge rounds; returns the merge
    * sequence in order. Stops early when no pair reaches `minCount`. */
  def induceMerges(
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
  ): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    var words = wordTable(docs, textCol).localCheckpoint(false)
    val out = Seq.newBuilder[Merge]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = candidates(words, minCount).rdd
        .map(row => Cand(row.getString(0), row.getString(1),
          row.getLong(2), row.getLong(3), row.getLong(4)))
        .aggregate(Option.empty[Cand])(
          (o, c) => Some(o.fold(c)(better(_, c))),
          {
            case (Some(x), Some(y)) => Some(better(x, y))
            case (a, b) => a.orElse(b)
          })
      top match {
        case None => dry = true
        case Some(c) =>
          val m = c.lhs + stripCont(c.rhs)
          out += Merge(r, c.lhs, c.rhs, m, c.cnt, c.ua, c.ub)
          words = words
            .withColumn("syms", Bpe.applyMerge(col("syms"), c.lhs, c.rhs, m))
            .localCheckpoint(false)
          r += 1
      }
    }
    out.result()
  }

  /** [[induceMerges]] as a DataFrame (one row per merge, columns
    * from [[Merge]]) — the catalog/oracle surface. */
  def induce(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      textCol: String = "text",
      rounds: Int,
      minCount: Long = 1L,
  ): DataFrame = {
    import spark.implicits._
    induceMerges(docs, textCol, rounds, minCount).toDF()
  }

  /** The serving vocabulary after a fit: every initial symbol the
    * corpus exhibits (word-start chars + `##`-continuations — an
    * alphabet-bounded driver collect, ≤ 2·|charset| rows) plus each
    * merged symbol, deduped and sorted.
    *
    * `#`-bearing corpora (the documented caveat made serve-safe): a
    * word containing literal `#` can fuse into the bare marker string
    * "##" (word-start '#' + stripped continuation '#'), which is not
    * a legal piece — [[graft.expr.WordPieceEncode]] rejects it — so
    * it is filtered here; the greedy encode simply never matches it
    * (it could only cover a literal "##" infix, which the remaining
    * '#' pieces still cover char-by-char). Merged symbols that BEGIN
    * with "##" but arose from a word-START fuse are kept: encode
    * reclassifies them as continuations, the same count conflation
    * the fit already documents — deterministic in both engines. */
  def vocab(docs: DataFrame, textCol: String, merges: Seq[Merge]): Seq[String] = {
    val base = wordTable(docs, textCol)
      .select(explode(col("syms")).as("sym")).distinct()
      .collect().map(_.getString(0)).toSeq
    (base ++ merges.map(_.merged)).distinct.filter(_ != "##").sorted
  }

  /** Greedy `##`-convention encode of `textCol` under a frozen
    * vocabulary (see [[graft.expr.WordPieceEncode]]): space-joined
    * pieces, `[UNK]` per uncoverable word. */
  def encode(text: Column, vocabulary: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.WordPieceEncode(
        org.apache.spark.sql.GraftBridge.toExpr(text), vocabulary))
}
