package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers, mirroring a production ANN stack:
  *   - [[topKWithinLabel]] — IVF-style exact search within a coarse
  *     partition (here the `label` column plays the inverted-list /
  *     cluster-assignment role): an equi-join on the cell id, so Spark
  *     plans a hash join, never a cartesian product. At 100 TB the cell
  *     id is what bounds the pair count: N²/cells instead of N².
  *   - [[lshBuckets]] — random-hyperplane (sign) LSH: a deterministic,
  *     seed-derived set of hyperplanes maps each vector to a bit-bucket
  *     key; candidates share a bucket. Approximate; recall measured in
  *     the test suite against the brute-force baseline.
  *
  * Dot products compile through [[graft.expr.DotProduct]] — a custom
  * Catalyst expression whose generated code is a tight primitive loop
  * with the same sequential left-to-right IEEE semantics as DuckDB's
  * `list_dot_product` over `DOUBLE[]`, so similarity scores stay
  * bit-identical across engines (the oracle hash-match) while running
  * at whole-stage-codegen speed instead of interpreted-HOF speed.
  */
object Similarity {

  /** Codegen'd sequential dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.DotProduct(
        org.apache.spark.sql.GraftBridge.toExpr(a),
        org.apache.spark.sql.GraftBridge.toExpr(b)))

  /** Interpreted fold form (kept as the reference implementation the
    * codegen expression is asserted against in tests). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm via the same fold (sqrt is correctly-rounded IEEE). */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with explicit association dot/(na*nb) — the
    * oracle SQL mirrors this exact expression shape. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Project id + double-cast embedding + precomputed norm (computing
    * each norm once, before the join, instead of per candidate pair). */
  def withNorm(df: DataFrame, idCol: String, embCol: String, extra: Seq[String] = Nil): DataFrame = {
    val e = col(embCol).cast("array<double>")
    df.select(
      (col(idCol).as("id") +: extra.map(col)) :+ e.as("e") :+ l2norm(e).as("nrm"): _*
    )
  }

  /** Exact top-k cosine neighbors within each coarse cell (`labelCol`),
    * for query rows selected by `queryPred`. Equi-join on the cell id →
    * hash join; top-k via [[graft.expr.TopKAgg]] — each map task
    * reduces its slice of a query's candidates to k entries BEFORE the
    * shuffle, so the exchange after the pair join carries O(k) rows
    * per (mapper, query) instead of every scored candidate (at scale
    * the candidate table is |queries|·cell_size — the shuffle the
    * window formulation pays and this one doesn't). Deterministic
    * (sim DESC, id ASC) order, pointwise equal to
    * [[topKWithinLabelViaWindow]] (spec + the q07 oracle, which
    * replays the window form). */
  def topKWithinLabel(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int,
      queryPred: Column,
  ): DataFrame = {
    val payload = struct(col("neighbor_id"), col("sim"))
    scoredCandidates(df, idCol, embCol, labelCol, queryPred)
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKAgg.topK(col("sim"), payload, k).as("graft_top_"))
      .select(col("query_id"), posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col("query_id"), col("e.neighbor_id").as("neighbor_id"),
        col("e.sim").as("sim"), (col("graft_r_") + 1).cast("int").as("rank"))
  }

  /** The row_number-window reference formulation of [[topKWithinLabel]]
    * — semantically identical; kept as the equivalence-spec oracle for
    * the heap aggregate. */
  def topKWithinLabelViaWindow(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int,
      queryPred: Column,
  ): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scoredCandidates(df, idCol, embCol, labelCol, queryPred)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Shared candidate scoring: cell equi-join + cosine, one row per
    * (query, same-cell neighbor). */
  private def scoredCandidates(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      queryPred: Column,
  ): DataFrame = {
    val v = withNorm(df, idCol, embCol, Seq(labelCol))
    val q = v.filter(queryPred)
      .withColumnsRenamed(
        Map("id" -> "query_id", "e" -> "qe", "nrm" -> "qn", labelCol -> "q_label"))
    q
      .join(v, col("q_label") === col(labelCol) && col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("sim"),
      )
  }

  /** Brute-force exact top-k of a (small) query set against the full
    * corpus: the query side is broadcast, so the "cross" is a
    * BroadcastNestedLoopJoin streaming over corpus partitions — O(Q·N)
    * work but no shuffle of the corpus. Baseline for ANN recall. */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
  ): DataFrame = {
    // materialization barrier (the binaryPool lesson): without it,
    // whole-stage codegen inlines the norm projection into the
    // nested-loop consume path and recomputes each corpus row's
    // l2norm once per broadcast query
    val c = withNorm(corpus, idCol, embCol).repartition(col("id"))
    val q = withNorm(queries, idCol, embCol)
      .withColumnsRenamed(Map("id" -> "query_id", "e" -> "qe", "nrm" -> "qn"))
    val joined = broadcast(q)
      .join(c, col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("sim"),
      )
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * derived from hash60("p:j") mapped to [-1,1]. Seeded by structure,
    * not wall clock — reproducible across runs and engines. */
  private def planeComponent(p: Int, j: Int): Double = {
    // splitmix-style integer scramble of (p,j) — plain JVM arithmetic,
    // evaluated at plan build time (constants in the expression tree)
    var z = (p.toLong * 0x9E3779B97F4A7C15L) + (j.toLong * 0xBF58476D1CE4E5B9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** The frozen hyperplane constants as plain doubles — what an
    * oracle interpolates into its own SQL (the q94 frozen-weights
    * rule): shortest-round-trip double literals parse back to the
    * identical IEEE values in any engine, so the sign of
    * `list_dot_product(e, plane)` replays the bucket bit exactly
    * (q138). */
  def planeLiterals(dim: Int, numPlanes: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map(p => (0 until dim).map(j => planeComponent(p, j)))

  /** The multi-probe XOR masks: own bucket (0), then every 1-bit
    * flip (`probes ≥ 1`), then every 2-bit flip (`probes ≥ 2`) —
    * shared by [[annTopK]] and the query-vs-corpus rankers
    * ([[graft.llm.Retrieval.vectorTopKAnn]]), and what an oracle
    * interpolates as its probe list. */
  def probeMasks(numPlanes: Int, probes: Int): Seq[Long] = {
    val oneFlips: Seq[Long] =
      if (probes >= 1) (0 until numPlanes).map(p => 1L << p) else Nil
    val twoFlips: Seq[Long] =
      if (probes >= 2)
        for { p1 <- 0 until numPlanes; p2 <- (p1 + 1) until numPlanes }
          yield (1L << p1) | (1L << p2)
      else Nil
    0L +: (oneFlips ++ twoFlips)
  }

  /** Sign-LSH bucket key: one bit per hyperplane = sign of ⟨v, plane⟩.
    * `numPlanes` bits → 2^numPlanes buckets. Map-side only. */
  def lshBuckets(emb: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val plane = array((0 until dim).map(j => lit(planeComponent(p, j))): _*)
      when(dot(emb.cast("array<double>"), plane) >= 0.0, shiftleft(lit(1L), p))
        .otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via multi-probe sign-LSH: candidates share the query's
    * bucket OR any bucket within `probes` bit flips (standard
    * multi-probe LSH — near misses on one hyperplane are the dominant
    * recall loss, so probing adjacent buckets buys recall instead of
    * more tables). `probes = 1` costs a (1+n)× query fan-out,
    * `probes = 2` adds the n·(n−1)/2 two-flip buckets for the recall
    * tail (points near the intersection of two hyperplanes).
    * Only the QUERY side fans out (explode of probe keys); the corpus
    * keeps one row per vector, and the join stays an equi-join on the
    * bucket key — never a cross product. At 100 TB: corpus bucketed
    * once (write-time partitioning), queries probe a handful of
    * partitions each. */
  def annTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      numPlanes: Int,
      k: Int,
      queryPred: Column,
      probes: Int = 1,
      extra: Seq[String] = Nil,
  ): DataFrame = {
    val v = withNorm(df, idCol, embCol, extra)
      .withColumn("bucket", lshBuckets(col("e"), dim, numPlanes))
    val flips: Seq[Column] = probeMasks(numPlanes, probes).map(lit(_): Column)
    val q = v.filter(queryPred)
      .withColumnsRenamed(
        Map("id" -> "query_id", "e" -> "qe", "nrm" -> "qn", "bucket" -> "q_bucket"))
      .withColumn("probe_bucket",
        explode(array_distinct(array(flips.map(f => col("q_bucket").bitwiseXOR(f)): _*))))
    val joined = q
      .join(v, col("probe_bucket") === col("bucket") && col("query_id") =!= col("id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("sim"),
      )
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Late-interaction (ColBERT-style, Khattab & Zaharia 2020) MaxSim
    * retrieval over GROUPED vectors: a "document" is a group of
    * vectors (token/chunk embeddings under `groupCol`), and
    * score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} cos(q, d) — each query
    * vector finds its best match in the candidate document, and the
    * per-query-vector evidence sums. The interaction a single pooled
    * vector cannot express: one strongly matching chunk contributes
    * its full cosine instead of being averaged away.
    *
    * Exactness: cos is the proven q07 IEEE chain; MAX over candidate
    * vectors is order-free; the SUM over query vectors — the one
    * order-dependent float reduction — folds SEQUENTIALLY in query
    * vec-id order from an explicit 0.0 init (`aggregate` over a
    * sorted collect), which DuckDB mirrors as
    * `list_reduce(list_prepend(0.0, list(m ORDER BY qid)))` — the
    * q141 oracle hash-pins every score.
    *
    * Shape: the (query group × candidate group) grid arrives as two
    * tiny distinct-group frames (broadcast — the bounded-probe-grid
    * discipline, never a row-level cross join); both fan-outs are
    * equi-joins on the group keys, the per-(pair, query-vector) MAX
    * partial-aggregates map-side, and the fold state is ≤ |Q| entries
    * per pair. At 100 TB the grid comes from a candidate generator
    * (X57 ANN over pooled vectors) instead of all-pairs — the
    * standard two-stage retrieval stack. */
  def maxSimTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      groupCol: String,
      queryPred: Column,
      k: Int,
  ): DataFrame = {
    val v = withNorm(df, idCol, embCol, extra = Seq(groupCol))
    val d = v.select(col(groupCol).as("doc_label"),
      col("e").as("de"), col("nrm").as("dn"))
    val qv = withNorm(df.filter(queryPred), idCol, embCol,
        extra = Seq(groupCol))
      .select(col("id").as("qid"), col(groupCol).as("query_label"),
        col("e").as("qe"), col("nrm").as("qn"))
    val grid = qv.select(col("query_label")).distinct()
      .crossJoin(broadcast(d.select(col("doc_label")).distinct()))
    maxSimOverGrid(qv, d, grid, k)
  }

  /** The exact-centroid per-group vector, assembled dim-ordered with
    * its norm — stage 1's summary of a multi-vector document (the
    * q103 quant9 order-free mean, so the summary itself
    * hash-replays). */
  private def centroidVectors(
      df: DataFrame, idCol: String, embCol: String, groupCol: String): DataFrame =
    centroidByLabel(df, groupCol, embCol)
      .groupBy(col("label"))
      .agg(transform(
        sort_array(collect_list(struct(col("dim"), col("centroid")))),
        x => x.getField("centroid")).as("cv"))
      .withColumn("cn", l2norm(col("cv")))

  /** TWO-STAGE MaxSim (the documented production form of
    * [[maxSimTopK]] — its all-pairs grid is for bounded group counts
    * only): stage 1 summarizes every group by its exact-decimal
    * centroid and keeps each query group's `candidates` best
    * centroid-cosine groups; stage 2 runs full MaxSim on the
    * surviving grid ONLY. Exactly the PQ recall-repair pattern
    * ([[pqThenExactTopK]]) lifted to the group grain: stage-2 scores
    * are bit-equal to the all-pairs form for every surviving pair, so
    * recall is monotone in `candidates` and reaches [[maxSimTopK]]
    * when `candidates` covers the groups (spec-pinned). Stage 1 cost:
    * one dim-explode aggregate (map-side combinable decimals) + a
    * groups²-sized centroid grid — both tiny next to stage 2's
    * vector join, which now touches candidates/|groups| of the pairs. */
  def maxSimTwoStage(
      df: DataFrame,
      idCol: String,
      embCol: String,
      groupCol: String,
      queryPred: Column,
      candidates: Int,
      k: Int,
  ): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val v = withNorm(df, idCol, embCol, extra = Seq(groupCol))
    val d = v.select(col(groupCol).as("doc_label"),
      col("e").as("de"), col("nrm").as("dn"))
    val qv = withNorm(df.filter(queryPred), idCol, embCol,
        extra = Seq(groupCol))
      .select(col("id").as("qid"), col(groupCol).as("query_label"),
        col("e").as("qe"), col("nrm").as("qn"))
    val cvec = centroidVectors(df, idCol, embCol, groupCol)
    val qc = qv.select(col("query_label")).distinct()
      .join(cvec.select(col("label").as("query_label"),
        col("cv").as("qcv"), col("cn").as("qcn")), Seq("query_label"))
    val pairs = qc.crossJoin(broadcast(
        cvec.select(col("label").as("doc_label"),
          col("cv").as("dcv"), col("cn").as("dcn"))))
      .select(col("query_label"), col("doc_label"),
        cosine(col("qcv"), col("dcv"), col("qcn"), col("dcn")).as("csim"))
    val w = Window.partitionBy(col("query_label"))
      .orderBy(col("csim").desc, col("doc_label"))
    val grid = pairs.withColumn("_crank", row_number().over(w))
      .filter(col("_crank") <= candidates)
      .select(col("query_label"), col("doc_label"))
    maxSimOverGrid(qv, d, grid, k)
  }

  /** ANN-backed MaxSim — the 100 TB form of [[maxSimTopK]], with the
    * groups² centroid stage of [[maxSimTwoStage]] replaced by the X57
    * multi-probe sign-LSH pass ([[annTopK]]) over the exact-decimal
    * centroid table: each doc group is summarized once, bucketed once
    * by the frozen hyperplanes, and a query group probes only its own
    * bucket plus `probes`-bit-flip neighbors — the join is an
    * equi-join on the bucket key, so NO side ever broadcasts the full
    * centroid table and nothing is groups²-sized (plan-audited). The
    * own group is always a candidate (the diagonal rides along beside
    * the `candidates` ANN survivors — [[annTopK]] excludes self by
    * construction); stage 2 is the shared [[maxSimOverGrid]], so every
    * surviving pair scores bit-equal to [[maxSimTopK]]: recall is
    * monotone in `probes`/`candidates` and reaches the all-pairs form
    * when the probe set covers the buckets and `candidates` covers the
    * groups (spec-pinned). At 10⁷–10⁹ doc groups the centroid table
    * hash-partitions by bucket like any other corpus — the broadcast
    * and grid scale-killers of the two-stage form are gone. */
  def maxSimAnn(
      df: DataFrame,
      idCol: String,
      embCol: String,
      groupCol: String,
      queryPred: Column,
      dim: Int,
      numPlanes: Int,
      candidates: Int,
      k: Int,
      probes: Int = 1,
  ): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must be >= k ($k)")
    val v = withNorm(df, idCol, embCol, extra = Seq(groupCol))
    val d = v.select(col(groupCol).as("doc_label"),
      col("e").as("de"), col("nrm").as("dn"))
    val qv = withNorm(df.filter(queryPred), idCol, embCol,
        extra = Seq(groupCol))
      .select(col("id").as("qid"), col(groupCol).as("query_label"),
        col("e").as("qe"), col("nrm").as("qn"))
    val qlabels = qv.select(col("query_label").as("label")).distinct()
    val cvec = centroidVectors(df, idCol, embCol, groupCol)
    // mark which centroids are query groups (data-driven, so annTopK's
    // row predicate stays a plain column test)
    val marked = cvec
      .join(qlabels.withColumn("graft_isq_", lit(true)), Seq("label"), "left")
      .withColumn("graft_isq_", coalesce(col("graft_isq_"), lit(false)))
    val annGrid = annTopK(marked, "label", "cv", dim, numPlanes,
        k = candidates, queryPred = col("graft_isq_"), probes = probes,
        extra = Seq("graft_isq_"))
      .select(col("query_id").as("query_label"),
        col("neighbor_id").as("doc_label"))
    val grid = annGrid.unionByName(
      qlabels.select(col("label").as("query_label"),
        col("label").as("doc_label")))
    maxSimOverGrid(qv, d, grid, k)
  }

  /** Stage 2 shared by all three forms: full MaxSim restricted to
    * `grid` (query_label, doc_label) pairs — THE candidate-generator
    * seam: any stage-1 (all-pairs, centroid-pruned, ANN, or an
    * external retrieval pass) that yields a (query_label, doc_label)
    * frame plugs in here, and every surviving pair scores through the
    * identical q141 chain. `qv` = (qid, query_label, qe, qn); `d` =
    * (doc_label, de, dn) — see [[withNorm]]. */
  def maxSimOverGrid(
      qv: DataFrame, d: DataFrame, grid: DataFrame, k: Int): DataFrame = {
    val best = grid
      .join(qv, Seq("query_label"))
      .join(d, Seq("doc_label"))
      .groupBy(col("query_label"), col("doc_label"), col("qid"))
      .agg(max(cosine(col("qe"), col("de"), col("qn"), col("dn"))).as("m"))
    val folded = best
      .groupBy(col("query_label"), col("doc_label"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("qid"), col("m")))),
        lit(0.0),
        (acc, x) => acc + x.getField("m")).as("maxsim"))
    val w = Window.partitionBy(col("query_label"))
      .orderBy(col("maxsim").desc, col("doc_label"))
    folded.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Symmetric per-vector INT8 quantization — the 4× embedding
    * compression a 100 TB vector store runs before anything else:
    * scale = max |component| (1.0 for the all-zero vector, so the
    * division is total), q_i = round-half-up(x_i / scale · 127) ∈
    * [−127, 127]. Round-half-up is spelled `floor(v + 0.5)` so the
    * rounding mode is an explicit mirrored expression, not an
    * engine-dependent `round()` (Spark HALF_UP vs DuckDB HALF_EVEN
    * would drift on exact .5 boundaries). Reconstruction error is
    * bounded by scale/254 per component (half a quantization step) —
    * the spec asserts the bound and the search-recall consequence.
    * Map-side projection; output (idCol, scale, qvec). */
  def quantizeInt8(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol),
      int8Scale(col(embCol)).as("scale"),
      int8Quantize(col(embCol), int8Scale(col(embCol))).as("qvec"))

  /** Column form of the [[quantizeInt8]] scale: max |component|, 1.0
    * for the all-zero vector (total division). Exposed so a caller
    * can quantize in the SAME projection that still holds the float
    * column (digest/error queries need both without a self-join). */
  def int8Scale(emb: Column): Column = {
    val s0 = array_max(transform(emb, x => abs(x.cast("double"))))
    when(s0 === 0.0, lit(1.0)).otherwise(s0)
  }

  /** Column form of the [[quantizeInt8]] codes for a precomputed
    * scale. */
  def int8Quantize(emb: Column, scale: Column): Column =
    transform(emb, x =>
      floor(x.cast("double") / scale * 127 + lit(0.5)).cast("int"))

  /** Inverse of [[quantizeInt8]]: q_i · scale / 127, left-to-right
    * IEEE — feeds straight back into [[topKWithinLabel]] /
    * [[cosine]] for search over the compressed table. */
  def dequantizeInt8(qvec: Column, scale: Column): Column =
    transform(qvec, x => x.cast("double") * scale / 127)

  // -----------------------------------------------------------------
  // Product quantization (PqModel codebooks — the 32× memory tier
  // above int8's 4×)
  // -----------------------------------------------------------------

  /** PQ-encode an embedding against the frozen [[PqModel]] codebooks:
    * array of [[PqModel.m]] centroid indices (argmin squared L2 per
    * contiguous subvector, ascending-component sum, lowest index on
    * ties — the exact arithmetic the q95 oracle replays). Compiled
    * map-side expression; zero shuffle. */
  def pqEncode(emb: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.PqEncode(
        org.apache.spark.sql.GraftBridge.toExpr(
          transform(emb, x => x.cast("double"))),
        PqModel.asSeq))

  /** Reconstruct the codeword vector from PQ codes (the asymmetric-
    * distance search ranks exact queries against THIS). */
  def pqDecode(codes: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.PqDecode(
        org.apache.spark.sql.GraftBridge.toExpr(codes),
        PqModel.asSeq))

  /** Pack the [[PqModel.m]] 4-bit codes into ONE BIGINT (code_m ·
    * 16^m, exact integer arithmetic) — the 8-byte storage form: 32×
    * under float32 components, the standard PQ memory budget. */
  def pqPack(codes: Column): Column =
    aggregate(
      codes,
      struct(lit(0L).as("v"), lit(1L).as("b")),
      (acc, c) => struct(
        (acc.getField("v") + c.cast("long") * acc.getField("b")).as("v"),
        (acc.getField("b") * 16L).as("b")),
      acc => acc.getField("v"))

  /** Inverse of [[pqPack]]: the BIGINT back to [[PqModel.m]] 4-bit
    * codes (array<int>, [[pqDecode]]'s input type) — code_m =
    * (packed >>> 4m) & 15, exact integer arithmetic, so
    * pqUnpack(pqPack(codes)) ≡ codes for every valid code array.
    * This is what lets the 8-byte packed form travel through joins
    * and storage and decode ONLY in the final scoring projection. */
  def pqUnpack(packed: Column): Column =
    array((0 until PqModel.m).map(i =>
      shiftrightunsigned(packed, 4 * i).bitwiseAND(lit(15L)).cast("int")): _*)

  /** FUSED ADC cosine straight from the packed code BIGINT: one
    * compiled loop per candidate (2·dims multiplies, zero
    * allocation) replacing the pqUnpack → pqDecode → dot/dot/sqrt
    * chain, bit-equal by the sequential-accumulation contract
    * ([[graft.expr.PqCosineScore]]); NULL where the unfused chain's
    * `dnrm > 0` filter would drop the row. */
  def pqCosine(qe: Column, qn: Column, packed: Column): Column =
    org.apache.spark.sql.GraftBridge.toColumn(
      graft.expr.PqCosineScore(
        org.apache.spark.sql.GraftBridge.toExpr(qe),
        org.apache.spark.sql.GraftBridge.toExpr(qn),
        org.apache.spark.sql.GraftBridge.toExpr(packed),
        PqModel.asSeq))

  /** ASYMMETRIC-DISTANCE top-k within a coarse label: queries stay
    * exact floats, the corpus side is PQ codes — sim(q, c) =
    * cosine(q, decode(codes)) (by linearity equal to the per-subvector
    * ADC sum; evaluated through one [[pqDecode]] + the codegen'd
    * [[dot]] so the whole rank is one mirrored expression chain).
    * Same join/window shape as [[topKWithinLabel]]: equi-join on the
    * label (never N²), rank window (sim DESC, id). At scale the
    * corpus side carries 8-byte packed codes instead of 256-byte
    * vectors — the point of PQ: the candidate scan is memory-bound,
    * and decode-on-the-fly trades 64 mults for 32× less traffic.
    * (A per-query 256-entry LUT would cut the mults further; left as
    * the documented next step — the shuffle/memory shape, which is
    * what scales, is already the PQ one.) */
  def pqTopKWithinLabel(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int,
      queryPred: Column,
  ): DataFrame = {
    val codes = df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
      pqEncode(col(embCol)).as("codes"))
    val rec = codes.select(col("id"), col("lbl"),
        pqDecode(col("codes")).as("de"))
      .withColumn("dnrm", sqrt(dot(col("de"), col("de"))))
      .filter(col("dnrm") > 0.0)
    val qq = df.filter(queryPred)
      .select(col(idCol).as("query_id"), col(labelCol).as("lbl"),
        transform(col(embCol), x => x.cast("double")).as("qe"))
      .withColumn("qn", sqrt(dot(col("qe"), col("qe"))))
      .filter(col("qn") > 0.0)
    val joined = qq
      .join(rec, qq("lbl") === rec("lbl") && col("query_id") =!= rec("id"))
      .select(col("query_id"), rec("id").as("neighbor_id"),
        (dot(col("qe"), col("de")) / (col("qn") * col("dnrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-label vector CENTROIDS in exact arithmetic — the IVF
    * retraining / embedding-drift input (X49 trains on centroids;
    * drift monitoring compares them release-over-release): each
    * component sums as DECIMAL (double components quantized to 9
    * decimal places — the X122 exact-moment discipline), so the
    * result is reduction-order-free and another engine replays it
    * bit-for-bit (q103) — a float mean would drift by partition
    * count. Shape: one positional explode to (label, dim, x) — the
    * shuffle carries dims×N scalar rows, not vectors — then a
    * partial-agg groupBy over |labels|·dims keys. Output:
    * (label, dim, centroid, n), centroid = exact sum / count as one
    * fixed double division. */
  /** Engine-shared 9-decimal quantization of a double:
    * floor(x·10⁹ + ½) as an exact integer, summed in DECIMAL(38,0)
    * (exact at any corpus size — ~10²⁸ rows of unit-scale values
    * before 38 digits run out). Pure IEEE steps — multiply, add,
    * floor — which both engines evaluate bit-identically, REPLACING
    * the former `cast(DECIMAL(27,9))` whose half-boundary rounding
    * differed between Spark (shortest-decimal-string HALF_UP) and
    * DuckDB (binary-value rounding): at sf0.1 three centroid values
    * across the k-means family disagreed by exactly one unit at the
    * 9th decimal — the r18 sf0.1 oracle audit's catch. The floor
    * form is the q119 integer-surrogate discipline applied here. */
  def quant9(c: Column): Column =
    floor(c * lit(1.0e9) + lit(0.5))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0))

  /** Mean of [[quant9]]-quantized values as one fixed IEEE shape —
    * (exact-integer sum → double) / 10⁹ / n — the order-free,
    * engine-replayable mean the centroid family shares. */
  def quant9Mean(c: Column): Column =
    sum(quant9(c)).cast("double") / lit(1.0e9) / count(lit(1))

  def centroidByLabel(
      df: DataFrame,
      labelCol: String,
      embCol: String,
  ): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(embCol)).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(
        quant9Mean(col("x").cast("double")).as("centroid"),
        count(lit(1)).as("n"))

  /** TWO-STAGE search: PQ asymmetric distance retrieves `candidates`
    * per query (cheap — 8-byte codes), exact float cosine re-ranks
    * the survivors and keeps `k` (the standard recall-repair move:
    * quantization error can misorder near-ties, so retrieve wide and
    * let the exact metric pick). Output scores are EXACT cosines —
    * bit-equal to [[bruteForceTopK]]'s for every pair that survives,
    * so recall@k is monotone in `candidates` and reaches brute force
    * when `candidates` covers the label (spec-pinned).
    *
    * Scale shape: stage 1 is [[pqTopKWithinLabel]]'s label equi-join
    * over packed codes; stage 2 touches ONLY the |queries|·candidates
    * pair table — two id-keyed hash joins against the full-precision
    * vectors (each row fetched for the pairs that need it, never a
    * second corpus×corpus pass) and a per-query top-k window over
    * ≤ `candidates` rows. */
  def pqTopKReranked(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int,
      candidates: Int,
      queryPred: Column,
  ): DataFrame = {
    require(candidates >= k, s"candidates ($candidates) must cover k ($k)")
    val cand = pqTopKWithinLabel(df, idCol, embCol, labelCol, candidates,
        queryPred)
      .select(col("query_id"), col("neighbor_id"))
    val ex = withNorm(df, idCol, embCol)
    val q = ex.select(col("id").as("query_id"),
      col("e").as("qe"), col("nrm").as("qn"))
    val n = ex.select(col("id").as("neighbor_id"),
      col("e").as("ne"), col("nrm").as("nn"))
    val exact = cand
      .join(q, Seq("query_id"))
      .join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ---- binary (1-bit) quantization ---------------------------------

  /** Binary quantization: one SIGN bit per component (bit = 1 iff the
    * component is >= 0 — the same zero-inclusive sign rule as
    * [[lshBuckets]]), packed into 32-bit words carried as
    * `array<long>`; word w holds components [32w, 32w+32), component
    * 32w+j on bit j. The bottom rung of the quantization ladder
    * (float32 → int8 → PQ → 1 bit): 32× under float32, and similarity
    * degrades to Hamming distance — cheap enough that xor+popcount
    * over the packed words IS the candidate scorer. 32-bit words (not
    * 64) keep every packed value, shifted slice, and block key in the
    * non-negative BIGINT range, which both engines of the oracle pair
    * handle identically (DuckDB refuses `1::BIGINT << 63` outright);
    * physical width is 2 longs per 64 dims — still 16× under float32,
    * and the Hamming arithmetic is word-width-agnostic. */
  def binarizeWords(emb: Column, dim: Int): Column = {
    require(dim >= 1, "dim must be positive")
    val words = (dim + 31) / 32
    array((0 until words).map { w =>
      val hi = math.min(32, dim - w * 32)
      (0 until hi).map { j =>
        when(element_at(emb, w * 32 + j + 1) >= 0.0, lit(1L << j))
          .otherwise(lit(0L))
      }.reduce[Column](_ + _)
    }: _*)
  }

  /** Hamming distance between two packed codes: Σ_w popcount(xor).
    * Generic (any word count) via array HOFs — the hot paths use
    * [[hammingWordsN]], whose statically unrolled form stays inside
    * whole-stage codegen with no per-pair array allocation. */
  def hammingWords(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x).cast("int")

  /** [[hammingWords]] with the word count known at plan time: the
    * per-word popcounts unroll into one codegen'd sum — identical
    * values, no lambda evaluation on the |queries|·|corpus| scan. */
  def hammingWordsN(a: Column, b: Column, words: Int): Column =
    (1 to words).map { i =>
      bit_count(element_at(a, i).bitwiseXOR(element_at(b, i))).cast("long")
    }.reduce[Column](_ + _).cast("int")

  /** Block keys for pigeonhole candidate generation over a packed
    * code: the dim sign bits cut into `blocks` equal slices, each
    * emitted as ONE combined long `(block << sliceBits) | slice` so
    * the candidate join is a single-column equi-join. Slices must
    * align within the 32-bit words ([[binarizeWords]] layout). By
    * pigeonhole, any pair within Hamming distance ≤ blocks−1 agrees
    * exactly on at least one slice — the [[graft.llm.Dedup
    * .hammingNearDupPairs]] discipline generalized past 64 bits. */
  def binaryBlockKeys(words: Column, dim: Int, blocks: Int): Column = {
    require(blocks >= 1 && dim % blocks == 0,
      s"blocks ($blocks) must divide dim ($dim)")
    val s = dim / blocks
    require(s <= 32 && 32 % s == 0,
      s"slice width $s must align within 32-bit words")
    array((0 until blocks).map { b =>
      val w = (b * s) / 32
      val off = (b * s) % 32
      shiftright(element_at(words, w + 1), off)
        .bitwiseAND(lit((1L << s) - 1)) + lit(b.toLong << s)
    }: _*)
  }

  /** Embedding near-dup pairs by SIGN-FINGERPRINT Hamming distance —
    * [[graft.llm.Dedup.hammingNearDupPairs]] for codes WIDER than one
    * long (that form tops out at 64 bits; this one blocks over the
    * [[binarizeWords]] word array at any dim). Pigeonhole: a pair
    * within Hamming ≤ blocks−1 agrees exactly on ≥ 1 of the `blocks`
    * slices, so candidates meet on the combined-key equi-join — never
    * all pairs — and `maxHamming = blocks−1` loses nothing; a pair
    * colliding on several slices collapses through the pair-grain
    * min() (Hamming is collision-invariant). THRESHOLD regime only:
    * sign codes of genuine near-duplicates differ in a few bits, which
    * is exactly when exact-slice agreement has recall (top-k cosine
    * neighbors at Hamming ~dim/2 do NOT block — that regime is
    * [[binaryTopK]]'s scan). Returns (id_a, id_b, hamming), id_a <
    * id_b. */
  def binaryNearDupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      blocks: Int = 4,
      maxHamming: Int = 3,
  ): DataFrame = {
    val coded = df.select(col(idCol).as("id"),
      binarizeWords(col(embCol).cast("array<double>"), dim).as("bw"))
    val keyed = coded.withColumn("bkey",
      explode(binaryBlockKeys(col("bw"), dim, blocks)))
    val a = keyed.select(col("id").as("id_a"), col("bw").as("wa"), col("bkey"))
    val b = keyed.select(col("id").as("id_b"), col("bw").as("wb"), col("bkey"))
    a.join(b, Seq("bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingWordsN(col("wa"), col("wb"), (dim + 31) / 32).as("h"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("h")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Stage 1 of [[binaryTopK]]: the Hamming candidate pool — an
    * EXHAUSTIVE scan over packed codes, which is the production shape
    * for binary quantization (the 32× compression is what makes the
    * full scan affordable; xor+popcount per candidate is the whole
    * scorer, and top-k cosine neighbors sit at Hamming ~dim/2 where
    * no blocking scheme has recall). The query side reduces to
    * (query_id, words) and broadcasts — the corpus streams through a
    * BroadcastNestedLoopJoin with NO shuffle and NO float column in
    * the subplan (asserted by the plan audit): at 100 TB the scan
    * reads 8-byte words, not 256-byte vectors. Per query, the `pool`
    * nearest-by-Hamming survive via the [[graft.expr.TopKAgg]]
    * bounded heap (each map task reduces its corpus slice to `pool`
    * entries before the single O(|q|·pool) exchange); ties by
    * neighbor_id. Returns (query_id, neighbor_id, hamming). */
  def binaryPool(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      queryPred: Column,
      pool: Int,
  ): DataFrame = {
    // the repartition is a MATERIALIZATION barrier, not a distribution
    // choice: whole-stage codegen would otherwise inline the packing
    // projection into the nested-loop consume path and re-pack the
    // stream row once PER BROADCAST PAIR (measured 7× on the q158
    // shape). One shuffle of the 32×-compressed codes buys
    // pack-once — and the query side reads the same exchange, so the
    // corpus is packed exactly once in total. (A stored codes table —
    // the X187 discipline — would skip even this.)
    val coded = df.select(col(idCol).as("id"), queryPred.as("is_q"),
        binarizeWords(col(embCol).cast("array<double>"), dim).as("bw"))
      .repartition(col("id"))
    val q = coded.filter(col("is_q"))
      .select(col("id").as("query_id"), col("bw").as("qw"))
    val scored = broadcast(q)
      .join(coded, col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        hammingWordsN(col("qw"), col("bw"), (dim + 31) / 32).as("hamming"))
    val payload = struct(col("neighbor_id"), col("hamming"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKAgg.topK(-col("hamming").cast("long"), payload, pool)
        .as("graft_bp_"))
      .select(col("query_id"), explode(col("graft_bp_")).as("e"))
      .select(col("query_id"), col("e.neighbor_id").as("neighbor_id"),
        col("e.hamming").as("hamming"))
  }

  /** ANN top-k through BINARY quantization with exact re-rank: stage 1
    * pools `pool` candidates per query by Hamming distance over the
    * packed sign bits ([[binaryPool]] — 32× less bandwidth than the
    * float embeddings), stage 2 fetches full-precision vectors for
    * ONLY the |queries|·pool surviving pairs (two id-keyed hash
    * joins — the [[pqTopKReranked]] discipline) and re-ranks by exact
    * cosine, so surviving scores are bit-equal to brute force. The
    * output carries both tiers: `hamming` pins stage 1, `sim`/`rank`
    * pin stage 2. */
  def binaryTopK(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      k: Int,
      queryPred: Column,
      pool: Int = 32,
  ): DataFrame = {
    require(pool >= k, s"pool ($pool) must cover k ($k)")
    val cand = binaryPool(df, idCol, embCol, dim, queryPred, pool)
    val ex = withNorm(df, idCol, embCol)
    val q = ex.select(col("id").as("query_id"),
      col("e").as("qe"), col("nrm").as("qn"))
    val n = ex.select(col("id").as("neighbor_id"),
      col("e").as("ne"), col("nrm").as("nn"))
    val exact = cand
      .join(q, Seq("query_id"))
      .join(n, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        (dot(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** MMR diversity re-rank (Carbonell/Goldstein 1998) of a candidate
    * pool: from each query's `pool` rows (query_id, neighbor_id, sim —
    * ANY search tier's output: [[topKWithinLabel]], Ivf.searchPqFrom,
    * [[binaryTopK]]), greedily select `k` maximizing
    * λ·rel − (1−λ)·max-sim-to-already-selected — near-duplicate hits
    * crowd a plain top-k; MMR buys coverage with an explicit
    * relevance/redundancy trade. Shapes at scale: candidate vectors
    * arrive by ONE id-keyed hash join; the pairwise grid is an
    * equi-join on query_id with bounded multiplicity (|pool|² per
    * query — constant, never corpus-squared); the greedy fold runs in
    * the compiled [[graft.expr.MmrSelect]] (O(k·n²) per query inside
    * whole-stage codegen). Output: (query_id, neighbor_id, mmr_score,
    * rank) in pick order — every arithmetic step a fixed-shape IEEE
    * expression the oracle replays pick-for-pick. */
  def mmrRerank(
      pool: DataFrame,
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      lambda: Double = 0.5,
  ): DataFrame = {
    val v = withNorm(df, idCol, embCol)
    val cand = pool.select(col("query_id"), col("neighbor_id").as("id"),
      col("sim").as("rel"))
    val withVec = cand.join(v, Seq("id"))
      .select(col("query_id"), col("id"), col("rel"), col("e"), col("nrm"))
    val a = withVec.select(col("query_id"), col("id").as("a"),
      col("e").as("ea"), col("nrm").as("na"))
    val b = withVec.select(col("query_id"), col("id").as("b"),
      col("e").as("eb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("query_id"))
      .filter(col("a") < col("b"))
      .select(col("query_id"), col("a"), col("b"),
        cosine(col("ea"), col("eb"), col("na"), col("nb")).as("s"))
    val cands = withVec.groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("id"), col("rel")))).as("cands"))
    val ps = pairs.groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("a"), col("b"), col("s")))).as("pairs"))
    val empty = array().cast(
      "array<struct<a: bigint, b: bigint, s: double>>")
    val picked = cands.join(ps, Seq("query_id"), "left")
      .select(col("query_id"),
        org.apache.spark.sql.GraftBridge.toColumn(graft.expr.MmrSelect(
          org.apache.spark.sql.GraftBridge.toExpr(col("cands")),
          org.apache.spark.sql.GraftBridge.toExpr(coalesce(col("pairs"), empty)),
          k, lambda)).as("sel"))
    picked
      .select(col("query_id"), posexplode(col("sel")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.score").as("mmr_score"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
