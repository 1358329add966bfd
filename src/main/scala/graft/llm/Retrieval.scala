package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query→document full-text retrieval: BM25 ranking (Robertson &
  * Spärck Jones lineage; the Okapi formula every search engine
  * publishes) over the corpus, expressed as posting-list equi-joins —
  * the inverted-index access path done relationally, never a scan of
  * all (query, doc) pairs.
  *
  * Exactness: classic BM25 is idf·sat with
  *   idf = ln((N − df + ½)/(df + ½) + 1),
  *   sat = tf·(k₁+1) / (tf + k₁·(1 − b + b·dl/avgdl)).
  * The log (libm, engine-specific last-ulp) is replaced by the
  * monotone scaled-integer ratio it wraps — the salientTerms/DSIR
  * exact-surrogate rule:
  *   idfS  = ((2·(N−df)+1) · IdfScale) div (2·df+1)
  * and sat is cleared of fractions by multiplying through by 10·L
  * (k₁ = 6/5, b = 3/4, avgdl = L/N exactly — no float division):
  *   satS  = (22·L·tf · SatScale) div (10·L·tf + 3·L + 9·dl·N)
  * Per-term score = idfS·satS, per-doc score = the exact long SUM
  * over the query's distinct terms — order-free, so the DuckDB oracle
  * hash-matches the full ranking, which no float-log BM25 could.
  * Monotonicity: for fixed (tf, dl) the score orders documents
  * exactly as float BM25 does whenever df differs; the integer
  * floors only coarsen ties (documented, bounded by 1/Scale).
  *
  * Scale shape: tf/df/dl are three map-side-combinable aggregates of
  * the token explode (the q84 signal pass can share the same scan).
  * The query set is small by nature → `broadcast(qterms)`: the join
  * touches ONLY the postings of terms some query mentions — that is
  * the inverted-index pruning, obtained relationally. Per-query
  * top-k rides [[graft.expr.TopKAgg]], the bounded-heap aggregate
  * that reduces each map task's candidates to ≤ k rows BEFORE the
  * shuffle (the salientTerms discipline; a window row_number would
  * ship every candidate). Totals (N, L) are one 1-row broadcast
  * cross join (the Quantiles totals pattern).
  *
  * Long headroom: 22·L·tf·SatScale must stay below 2⁶³ — with
  * SatScale = 1000 that holds through L·tf ≈ 4e17 (hundreds of
  * billions of tokens × heavy tf); at the extreme, lower SatScale
  * (the ratio carries the signal, not the magnitude).
  */
object Retrieval {

  /** idf resolution: ~3 significant digits of the df ratio. */
  val IdfScale = 1000L

  /** tf-saturation resolution: sat ∈ (0, 2.2) → satS ∈ (0, 2200]. */
  val SatScale = 1000L

  /** BM25 top-k: for each query row (qidCol, qtextCol), the k highest
    * scoring documents. Output: (qid, rank, doc_id-named idCol,
    * score), rank 1-based by score desc, ties broken on id asc —
    * fully deterministic. Queries whose terms match nothing yield no
    * rows (no evidence, no ranking — callers needing every query
    * left-join this result). Query terms are DISTINCT within a query
    * (the standard short-query form; repeat a term via a longer
    * query is not supported by design — qtf weighting is a one-line
    * extension the doc notes for completeness). */
  def bm25TopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      qidCol: String = "qid",
      qtextCol: String = "qtext",
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = TextIndex.tokens(docs, idCol, textCol)
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy("id").agg(count(lit(1)).as("dl"))
    val qterms = queryTerms(queries, qidCol, qtextCol)
    scoreBm25(tf, dl, qterms, k, idCol)
  }

  /** Distinct (qid, term) pairs of a query frame — the shared query
    * tokenization of the inline and stored BM25 paths. */
  private[llm] def queryTerms(
      queries: DataFrame, qidCol: String, qtextCol: String): DataFrame =
    queries
      .select(col(qidCol).as("qid"),
        explode(array_distinct(split(col(qtextCol), " "))).as("term"))
      .filter(length(col("term")) > 0)

  /** The shared BM25 scoring core — ONE arithmetic chain whether the
    * postings come from the inline corpus scan ([[bm25TopK]]) or the
    * persisted index ([[TextIndex.bm25From]]), which is what makes
    * stored ≡ inline provable bit-for-bit. `tf` = (id, term, tf),
    * `dl` = (id, dl); df and the (N, L) totals DERIVE from them (df
    * over the postings restricted to queried terms is exact — a
    * pruned read keeps every row of the terms it keeps). */
  private[llm] def scoreBm25(
      tf: DataFrame,
      dl: DataFrame,
      qterms: DataFrame,
      k: Int,
      idCol: String,
  ): DataFrame = {
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      coalesce(sum("dl"), lit(0L)).as("l_tot"))
    val scoredTerms = broadcast(qterms)
      .join(tf, Seq("term"))              // postings of queried terms only
      .join(dfT, Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(totals))
      .withColumn("graft_idf_",
        expr(s"((2 * (n_docs - df) + 1) * $IdfScale) div (2 * df + 1)"))
      .withColumn("graft_sat_",
        expr(s"(22 * l_tot * tf * $SatScale) div " +
          "(10 * l_tot * tf + 3 * l_tot + 9 * dl * n_docs)"))
      .withColumn("graft_ts_", col("graft_idf_") * col("graft_sat_"))
    val perDoc = scoredTerms
      .groupBy("qid", "id")
      .agg(sum("graft_ts_").as("score"))
    // payload field order (id first) IS the tie-break on equal scores;
    // the heap keys on the LONG score directly (TopKAgg's long path),
    // so heap order equals the oracle's exact BIGINT order at ANY
    // magnitude — no 2⁵³ double-rounding caveat anywhere in the chain
    val payload = struct(col("id"), col("score"))
    perDoc
      .groupBy("qid")
      .agg(graft.expr.TopKAgg.topK(col("score"), payload, k)
        .as("graft_top_"))
      .select(col("qid"), posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col("qid"), (col("graft_r_") + 1).cast("int").as("rank"),
        col("e.id").as(idCol), col("e.score").as("score"))
  }

  /** RRF resolution: contributions stay distinct through rank ≈ √scale
    * − kConst (rank 940 at the default constants); beyond that the
    * integer floor merges adjacent ranks — far past any sane pool
    * depth. */
  val RrfScale = 1000000L

  /** The published RRF smoothing constant (Cormack, Clarke &
    * Buettcher 2009's k = 60). */
  val RrfK = 60L

  /** Dense-vector top-k ranker over (id, vec) frames — the semantic
    * constituent of [[hybridTopK]]: score = the codegen'd sequential
    * dot product ([[Similarity.dot]] — for L2-normalized
    * [[Vectorize]] output this IS the cosine), zero-overlap pairs
    * dropped (the BM25 no-evidence-no-rows rule, so an absent doc is
    * meaningful to the fusion), rank by (score DESC, id ASC).
    * The query side broadcasts (BroadcastNestedLoopJoin streaming
    * over corpus partitions — no corpus shuffle); per-query top-k
    * rides the TopKAgg bounded heap, candidates reduced to ≤ k rows
    * per map task BEFORE the exchange. Swap in an [[Similarity.
    * annTopK]]-derived candidate pass when |queries|·N work is too
    * much — the fusion only needs (qid, id, rank). */
  def vectorTopK(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      k: Int,
      idCol: String = "doc_id",
      vecCol: String = "vec",
      qidCol: String = "qid",
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d = docVecs.select(col(idCol).as("graft_did_"),
      col(vecCol).as("graft_dv_"))
    val q = queryVecs.select(col(qidCol).as("qid"),
      col(vecCol).as("graft_qv_"))
    val scored = broadcast(q).crossJoin(d)
      .select(col("qid"), col("graft_did_"),
        Similarity.dot(col("graft_qv_"), col("graft_dv_")).as("score"))
      .filter(col("score") > 0.0)
    val payload = struct(col("graft_did_"), col("score"))
    scored
      .groupBy("qid")
      .agg(graft.expr.TopKAgg.topK(col("score"), payload, k)
        .as("graft_top_"))
      .select(col("qid"), posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col("qid"), (col("graft_r_") + 1).cast("int").as("rank"),
        col("e.graft_did_").as(idCol), col("e.score").as("score"))
  }

  /** The ANN form of [[vectorTopK]] — the documented candidate-pass
    * swap made code, for when |queries|·N streaming work is too much:
    * the corpus buckets ONCE by the frozen sign-LSH hyperplanes
    * (write it bucket-partitioned at 100 TB and this is free), each
    * query probes its own bucket plus `probes`-bit-flip neighbors,
    * and the candidate join is an EQUI-join on the bucket key —
    * each query touches candidate buckets, never the corpus.
    * Candidates then score and rank exactly like [[vectorTopK]]
    * (codegen dot, score > 0 no-evidence-no-rows BEFORE the rank so
    * ranks stay gapless, TopKAgg map-side k-reduction): every
    * returned score is bit-equal to the exhaustive ranker's for the
    * pairs that survive probing, so recall is monotone in `probes`
    * and the q147 oracle replays buckets, probes, scores, and ranks.
    */
  def vectorTopKAnn(
      docVecs: DataFrame,
      queryVecs: DataFrame,
      k: Int,
      dims: Int,
      numPlanes: Int,
      probes: Int = 1,
      idCol: String = "doc_id",
      vecCol: String = "vec",
      qidCol: String = "qid",
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val d = docVecs.select(col(idCol).as("graft_did_"),
        col(vecCol).as("graft_dv_"))
      .withColumn("graft_bkt_",
        Similarity.lshBuckets(col("graft_dv_"), dims, numPlanes))
    rankProbedCandidates(
      probedQueries(queryVecs, dims, numPlanes, probes, qidCol, vecCol),
      d, k, idCol)
  }

  /** The probe-exploded query frame (qid, graft_qv_, graft_pb_) —
    * one row per (query, probed bucket). Shared by the inline and
    * stored ANN rankers. */
  private[llm] def probedQueries(
      queryVecs: DataFrame, dims: Int, numPlanes: Int, probes: Int,
      qidCol: String, vecCol: String): DataFrame = {
    val masks = Similarity.probeMasks(numPlanes, probes)
    queryVecs.select(col(qidCol).as("qid"),
        col(vecCol).as("graft_qv_"))
      .withColumn("graft_qb_",
        Similarity.lshBuckets(col("graft_qv_"), dims, numPlanes))
      .withColumn("graft_pb_", explode(array_distinct(
        array(masks.map(m => col("graft_qb_").bitwiseXOR(lit(m))): _*))))
  }

  /** The shared candidate join + rank of the ANN vector rankers —
    * ONE chain whether `d` comes from the inline bucketing
    * ([[vectorTopKAnn]]) or a persisted bucket-clustered table
    * ([[TextIndex.vectorTopKAnnFrom]]), which is what makes stored ≡
    * inline provable. `q` = (qid, graft_qv_, graft_pb_); `d` =
    * (graft_did_, graft_dv_, graft_bkt_). */
  private[llm] def rankProbedCandidates(
      q: DataFrame, d: DataFrame, k: Int, idCol: String): DataFrame = {
    val scored = q.join(d, col("graft_pb_") === col("graft_bkt_"))
      .select(col("qid"), col("graft_did_"),
        Similarity.dot(col("graft_qv_"), col("graft_dv_")).as("score"))
      .filter(col("score") > 0.0)
    val payload = struct(col("graft_did_"), col("score"))
    scored
      .groupBy("qid")
      .agg(graft.expr.TopKAgg.topK(col("score"), payload, k)
        .as("graft_top_"))
      .select(col("qid"), posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col("qid"), (col("graft_r_") + 1).cast("int").as("rank"),
        col("e.graft_did_").as(idCol), col("e.score").as("score"))
  }

  /** EXACT-INTEGER reciprocal-rank fusion (Cormack et al. 2009 —
    * the standard composition of rankers that score on incomparable
    * scales): fused(q, d) = Σ_r scale div (kConst + rank_r(q, d))
    * over the rankers that retrieved d — computed entirely in scaled
    * longs (the float 1/(k+rank) swapped for its exact integer
    * surrogate, the X155 rule), so the FUSED ranking hash-replays
    * cross-engine, which no float RRF could guarantee on ties.
    * Inputs are top-k lists (qidCol, idCol, rankCol) from any
    * rankers ([[bm25TopK]], [[vectorTopK]], [[Similarity.annTopK]]
    * renamed, …); a doc absent from a ranker's list simply
    * contributes nothing — that asymmetry is the point: evidence
    * from EITHER modality surfaces the doc, and agreement compounds.
    * Shape: one unionByName (no join of the rankings!), one
    * (qid, id) sum groupBy — map-side combinable — and the TopKAgg
    * heap; the fused table is ≤ Σ|lists| rows, never corpus-sized. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      k: Int,
      kConst: Long = RrfK,
      scale: Long = RrfScale,
      qidCol: String = "qid",
      idCol: String = "doc_id",
      rankCol: String = "rank",
  ): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(kConst >= 0, s"kConst must be >= 0, got $kConst")
    val pts = rankings
      .map(_.select(col(qidCol).as("qid"), col(idCol).as("graft_id_"),
        expr(s"$scale div ($kConst + $rankCol)").as("graft_pts_")))
      .reduce(_ unionByName _)
    val fused = pts
      .groupBy(col("qid"), col("graft_id_"))
      .agg(sum(col("graft_pts_")).as("fused"))
    val payload = struct(col("graft_id_"), col("fused"))
    fused
      .groupBy("qid")
      .agg(graft.expr.TopKAgg.topK(col("fused"), payload, k)
        .as("graft_top_"))
      .select(col("qid"), posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col("qid"), (col("graft_r_") + 1).cast("int").as("rank"),
        col("e.graft_id_").as(idCol), col("e.fused").as("fused"))
  }

  /** Hybrid retrieval: BM25 (lexical) ∥ hashed-TF-IDF cosine
    * (distributional, engine-derived — [[Vectorize]]) → RRF. Each
    * ranker retrieves `poolK` candidates; fusion keeps `k`. The
    * classic win: a query whose exact terms miss (BM25 empty) still
    * retrieves through bucket overlap, and docs BOTH rankers like
    * outrank docs only one likes. The corpus is scanned once for tf
    * (shared by BM25's postings and the vector model's df); the df
    * table is ≤ dims rows → broadcast. Every stage hash-replays —
    * q145 pins the full composition. */
  def hybridTopK(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      dims: Int,
      poolK: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      qidCol: String = "qid",
      qtextCol: String = "qtext",
      kConst: Long = RrfK,
      scale: Long = RrfScale,
  ): DataFrame =
    hybridWith(docs, queries, k, dims, poolK, idCol, textCol, qidCol,
      qtextCol, kConst, scale,
      (dv, qv) => vectorTopK(dv, qv, poolK, idCol, "vec", qidCol))

  /** [[hybridTopK]] with the ANN vector stage ([[vectorTopKAnn]]) —
    * the 100 TB form: BM25's postings pruning on one side, bucket
    * pruning on the other, nothing exhaustive anywhere. Recall on
    * the vector side is monotone in `probes`; fusion semantics are
    * identical. */
  def hybridTopKAnn(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      dims: Int,
      poolK: Int,
      numPlanes: Int,
      probes: Int = 1,
      idCol: String = "doc_id",
      textCol: String = "text",
      qidCol: String = "qid",
      qtextCol: String = "qtext",
      kConst: Long = RrfK,
      scale: Long = RrfScale,
  ): DataFrame =
    hybridWith(docs, queries, k, dims, poolK, idCol, textCol, qidCol,
      qtextCol, kConst, scale,
      (dv, qv) => vectorTopKAnn(dv, qv, poolK, dims, numPlanes, probes,
        idCol, "vec", qidCol))

  /** Shared hybrid body: ONE corpus token scan feeds BM25's postings
    * and the vector model's df; the vector ranker is pluggable
    * (exhaustive or ANN). */
  private def hybridWith(
      docs: DataFrame,
      queries: DataFrame,
      k: Int,
      dims: Int,
      poolK: Int,
      idCol: String,
      textCol: String,
      qidCol: String,
      qtextCol: String,
      kConst: Long,
      scale: Long,
      vectorRanker: (DataFrame, DataFrame) => DataFrame,
  ): DataFrame = {
    val lex = bm25TopK(docs, queries, poolK, idCol, textCol, qidCol, qtextCol)
    val tf = Vectorize.termFrequencies(docs, idCol, textCol, dims)
    val dfT = Vectorize.docFrequencies(tf)
    val totals = Vectorize.corpusSize(docs)
    val dv = Vectorize.toDense(
      Vectorize.sparseNormalized(docs, idCol, textCol, dfT, totals, dims),
      docs, idCol, dims)
    val qv = Vectorize.embed(
      queries.select(col(qidCol), col(qtextCol)),
      qidCol, qtextCol, dfT, totals, dims)
    val sem = vectorRanker(
      dv.withColumnRenamed("id", idCol),
      qv.withColumnRenamed("id", qidCol))
    rrfFuse(Seq(lex, sem), k, kConst, scale, qidCol, idCol, "rank")
  }
}
