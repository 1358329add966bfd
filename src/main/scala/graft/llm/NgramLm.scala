package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed n-gram LM score table — the two frames [[NgramLm.fit]]
  * produces and [[NgramLm.docScores]] serves against, persistable
  * like any model artifact (the X49/X134 recipe: plain frames, no
  * opaque binaries).
  *
  * @param grams       (ord: int, h: long, cnt: long) — corpus counts
  *                    of the positional window hashes for orders
  *                    1..3; orders ≥ 2 pruned to cnt ≥ minCount
  *                    (count-cutoff pruning, the move that keeps a
  *                    web-scale gram table near corpus size instead
  *                    of 3× it — Brants 2007 §4 prune-by-threshold)
  * @param totalTokens Σ tokens over the fit corpus (the unigram
  *                    denominator) — one driver long, the constant-
  *                    size hop every model fit already makes
  * @param minCount    the pruning threshold the table was built with
  */
final case class NgramLmModel(grams: DataFrame, totalTokens: Long, minCount: Int)

/** Stupid Backoff trigram language model (Brants/Popat/Xu/Och/Dean
  * 2007, "Large language models in machine translation" — THE
  * distributed n-gram LM, designed for MapReduce-scale corpora:
  * no discounting, no normalization pass, scores are raw count
  * ratios with a fixed backoff multiplier), serving the
  * perplexity-style QUALITY GATE of the CCNet pipeline (Wenzek 2020:
  * score text against an LM fit on a reference corpus; improbable
  * text is machine junk, too-probable text is boilerplate — filter
  * or bucket by the doc-level score).
  *
  * Grams are HASHED (the q13 affine family over 28-bit md5 token
  * hashes — [[TextOps.windowHashesPositional]], one compiled loop
  * per row): counts key on 8-byte hashes, so the fit shuffle carries
  * (ord, hash) instead of gram STRINGS — at 100 TB the gram-string
  * table is several times the corpus; the hashed table is fixed
  * 20 bytes/row and the collision rate at 28 bits spread over mod
  * 2^31−1 only perturbs counts, never crashes a query (hashed LMs
  * are themselves standard — Talbot/Osborne 2007). Collisions can
  * make a hashed gram "present" while its true context was pruned,
  * so each tier requires BOTH its gram and its context row before it
  * fires (the chain falls through otherwise — conservative, and
  * both engines replay the same rule).
  *
  * SCORING IS PURE INTEGER — the [[CorpusStats.surprisalProfile]]
  * discipline: log2 count ratios stand in as bit-length differences
  * (`length(bin(cnt))` = ⌊log2 cnt⌋+1, exact in both engines), and
  * the 0.4 backoff multiplier becomes an integer `penaltyBits` per
  * backed-off order (−log2 0.4 ≈ 1.32; the default 2 penalizes
  * slightly steeper). A libm-log score would be reduction-order
  * dependent and engine-split; the bits surrogate is monotone in
  * every count ratio and replays bit-for-bit in DuckDB (q165).
  *
  * Score of token at position p (0-based; avail = min(p+1, 3) is the
  * highest order the doc prefix can support):
  *   trigram tier:  bl(c₃(w_{p−2..p})) − bl(c₂(w_{p−2..p−1}))
  *   bigram tier:   bl(c₂(w_{p−1..p})) − bl(c₁(w_{p−1}))
  *                    − penaltyBits·(avail−2)
  *   unigram tier:  bl(c₁(w_p) | unseen → 1) − bl(T)
  *                    − penaltyBits·(avail−1)
  * Doc-start positions score at their highest AVAILABLE order with
  * no penalty for orders the boundary makes impossible — penalty
  * counts only orders the model actually backed off (Brants scores
  * sentence starts from lower orders directly). An unseen unigram
  * counts as 1 — rarest possible, the X134 conservative-unseen rule.
  *
  * Shape at 100 TB: fit is one union-explode (3 window widths, one
  * pass each over the token arrays) into ONE (ord, h) exchange;
  * serve builds the 5 role hashes per position inside a single O(L)
  * array transform (no O(L²) array duplication), melts them to
  * (id, p, ord, h, role) rows, joins the gram table ONCE on
  * (ord, h), and re-assembles per position — three exchanges total,
  * every one carrying ≤ 40-byte rows, text never shuffles.
  */
object NgramLm {

  /** Orders fitted/served. Fixed: the serve chain materializes the
    * role hashes for exactly orders 1..3. */
  val N = 3

  private def bl(x: Column): Column = length(bin(x))

  /** Fit the trigram count tables over `docs(textCol)`. Eager (the
    * artifact discipline): the gram table is localCheckpoint-
    * materialized so every serve reads the computed counts instead
    * of replaying the corpus pass, and `totalTokens` rides the same
    * materialized frame (one 1-row aggregate). */
  def fit(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minCount: Int = 2,
  ): NgramLmModel = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val exploded = (1 to N).map { k =>
      docs.select(lit(k).as("ord"),
        explode(TextOps.windowHashesPositional(col(textCol), k)).as("h"))
    }.reduce(_ unionByName _)
    val grams = exploded
      .groupBy(col("ord"), col("h"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("ord") === 1 || col("cnt") >= minCount)
      .localCheckpoint()
    val total = grams.filter(col("ord") === 1)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("t"))
      .head().getLong(0)
    NgramLmModel(grams, total, minCount)
  }

  /** Per-position score table: (id, p, ord_used, score_bits). The
    * five role hashes per position — unigram, bigram + its unigram
    * context, trigram + its bigram context — come out of one indexed
    * `transform` over the order-1 array (each element is O(1) `get`s
    * into the order-2/3 arrays: O(L) per doc, the arrays are never
    * duplicated per position), melt into (ord, h) rows, join the
    * gram table once, and pivot back per position. */
  def tokenScores(
      docs: DataFrame,
      model: NgramLmModel,
      idCol: String = "doc_id",
      textCol: String = "text",
      penaltyBits: Int = 2,
  ): DataFrame = {
    require(penaltyBits >= 0, s"penaltyBits must be >= 0, got $penaltyBits")
    val withArrays = docs.select(
      col(idCol).as("id"),
      TextOps.windowHashesPositional(col(textCol), 1).as("u1"),
      TextOps.windowHashesPositional(col(textCol), 2).as("u2"),
      TextOps.windowHashesPositional(col(textCol), 3).as("u3"))
    // one O(L) pass: position p's role hashes, null where the doc
    // prefix is too short (guarded `get` — no out-of-bounds reads)
    def at(arr: Column, idx: Column): Column =
      when(idx >= 0, get(arr, idx))
    val roles = withArrays.select(
      col("id"),
      posexplode(transform(col("u1"), (h, p) => struct(
        h.as("ug"),
        at(col("u2"), p - 1).as("bg"),
        at(col("u1"), p - 1).as("bgc"),
        at(col("u3"), p - 2).as("tg"),
        at(col("u2"), p - 2).as("tgc")))))
      .toDF("id", "p", "r")
    val melted = roles.select(col("id"), col("p"),
      explode(filter(array(
        struct(lit(1).as("ord"), col("r.ug").as("h"), lit("ug").as("role")),
        struct(lit(2).as("ord"), col("r.bg").as("h"), lit("bg").as("role")),
        struct(lit(1).as("ord"), col("r.bgc").as("h"), lit("bgc").as("role")),
        struct(lit(3).as("ord"), col("r.tg").as("h"), lit("tg").as("role")),
        struct(lit(2).as("ord"), col("r.tgc").as("h"), lit("tgc").as("role"))),
        e => e.getField("h").isNotNull)).as("m"))
      .select(col("id"), col("p"), col("m.ord").as("ord"),
        col("m.h").as("h"), col("m.role").as("role"))
    val joined = melted
      .join(model.grams, Seq("ord", "h"), "left")
    def roleCnt(r: String): Column =
      max(when(col("role") === r, col("cnt")))
    val pivoted = joined
      .groupBy(col("id"), col("p"))
      .agg(
        roleCnt("ug").as("c_ug"),
        roleCnt("bg").as("c_bg"),
        roleCnt("bgc").as("c_bgc"),
        roleCnt("tg").as("c_tg"),
        roleCnt("tgc").as("c_tgc"))
    val avail = least(col("p") + 1, lit(N))
    val blT = lit(64 - java.lang.Long.numberOfLeadingZeros(
      math.max(model.totalTokens, 1L)))
    val ordUsed =
      when(col("c_tg").isNotNull && col("c_tgc").isNotNull, 3)
        .when(col("c_bg").isNotNull && col("c_bgc").isNotNull, 2)
        .otherwise(1)
    val score =
      when(col("c_tg").isNotNull && col("c_tgc").isNotNull,
        bl(col("c_tg")) - bl(col("c_tgc")))
        .when(col("c_bg").isNotNull && col("c_bgc").isNotNull,
          bl(col("c_bg")) - bl(col("c_bgc"))
            - lit(penaltyBits) * (avail - 2))
        .otherwise(
          bl(coalesce(col("c_ug"), lit(1L))) - blT
            - lit(penaltyBits) * (avail - 1))
    pivoted.select(col("id"), col("p"),
      ordUsed.cast("int").as("ord_used"),
      score.cast("int").as("score_bits"))
  }

  /** Per-document LM score: (idCol, n_tokens, sum_bits, mean_bits) —
    * mean_bits (one IEEE division of exact integers) is the
    * perplexity surrogate: near 0 = every token well predicted
    * (probable, boilerplate-leaning), strongly negative = the model
    * kept backing off (improbable, junk-leaning). */
  def docScores(
      docs: DataFrame,
      model: NgramLmModel,
      idCol: String = "doc_id",
      textCol: String = "text",
      penaltyBits: Int = 2,
  ): DataFrame =
    tokenScores(docs, model, idCol, textCol, penaltyBits)
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("score_bits")).cast("long").as("sum_bits"))
      .select(col("id").as(idCol), col("n_tokens"), col("sum_bits"),
        (col("sum_bits").cast("double") / col("n_tokens")).as("mean_bits"))

  /** CCNet band filter: keep docs whose mean score sits in
    * [lo, hi] — the middle-of-the-distribution keep rule (drop the
    * improbable tail AND, optionally, the too-probable head). One
    * left-semi join against the (id)-only keeper projection — the
    * X127 scoreFilter shape. */
  def bandFilter(
      docs: DataFrame,
      model: NgramLmModel,
      lo: Double,
      hi: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      penaltyBits: Int = 2,
  ): DataFrame = {
    require(lo <= hi, s"lo ($lo) must be <= hi ($hi)")
    val keep = docScores(docs, model, idCol, textCol, penaltyBits)
      .filter(col("mean_bits") >= lo && col("mean_bits") <= hi)
      .select(col(idCol))
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** CCNet head/middle/tail tertiles: each doc labeled by where its
    * mean score falls against the corpus's exact tertile cutpoints
    * (Wenzek 2020 §4.3 splits the crawl into thirds by perplexity
    * and trains on the head/middle). Cutpoints are the exact
    * order-stat values at ranks ⌈N/3⌉ and ⌈2N/3⌉
    * ([[graft.ops.Quantiles.exact]] — the distributed rank walk, no
    * single-partition sort), collected as TWO driver doubles; the
    * label is then a map-side comparison. mean ≥ upper cut → head
    * (best predicted), ≥ lower cut → middle, else tail. Ties share
    * a label (value comparison, not rank splitting — deterministic
    * under duplicate scores). */
  def perplexityTertiles(
      docs: DataFrame,
      model: NgramLmModel,
      idCol: String = "doc_id",
      textCol: String = "text",
      penaltyBits: Int = 2,
  ): DataFrame = {
    val scores = docScores(docs, model, idCol, textCol, penaltyBits)
    val cuts = graft.ops.Quantiles.exact(
        scores, "mean_bits", idCol, probs = Seq(1.0 / 3, 2.0 / 3))
      .orderBy(col("p"))
      .collect()
    if (cuts.isEmpty)
      return scores.select(col(idCol), col("mean_bits"),
        lit("head").as("bucket")).limit(0)
    val c1 = cuts(0).getAs[Double]("value")
    val c2 = cuts(1).getAs[Double]("value")
    scores.select(col(idCol), col("mean_bits"),
      when(col("mean_bits") >= c2, "head")
        .when(col("mean_bits") >= c1, "middle")
        .otherwise("tail").as("bucket"))
  }
}
