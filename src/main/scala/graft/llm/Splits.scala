package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic dataset splitting for training pipelines:
  * train/val/test assignment as a PURE FUNCTION of the row key and a
  * salt — no RNG, no state. The properties that matter at scale:
  *
  *   - stable: re-running (or re-reading on another cluster) assigns
  *     every row identically — eval sets never bleed into train
  *     between pipeline runs;
  *   - salt-keyed: a new salt is a fresh independent split without
  *     touching the data;
  *   - map-side: a projection, no shuffle, no sampling pass.
  *
  * Uses the md5-based [[TextOps.hash60]] family so assignments are
  * reproducible OUTSIDE Spark too (the DuckDB oracle replays them
  * bit-for-bit in q31 — ops teams can audit a split with any SQL
  * engine).
  */
object Splits {

  val Buckets = 10000L // assignment granularity: 0.01% steps

  /** Bucket in [0, Buckets) for a key column — the shared primitive. */
  def bucketOf(id: Column, salt: String): Column =
    pmod(TextOps.hash60(concat(lit(salt), lit(":"), id.cast("string"))), lit(Buckets))

  /** Split-name column from cumulative weight thresholds. `weights`
    * need not sum to 1 — they are normalized; order matters (splits
    * are assigned in the given order). */
  def assign(
      id: Column,
      weights: Seq[(String, Double)],
      salt: String = "split",
  ): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights required")
    val total = weights.map(_._2).sum
    val cuts = weights
      .scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail
      .map(f => math.round(f * Buckets))
    val b = bucketOf(id, salt)
    weights.map(_._1).zip(cuts).reverse.foldLeft(lit(weights.last._1)) {
      case (els, (name, cut)) => when(b < cut, lit(name)).otherwise(els)
    }
  }

  /** Deterministic EXACT-k per-group sample — the balanced-mix
    * companion to [[stratifiedSample]] (which keeps a RATE and
    * cannot promise counts): every group contributes exactly
    * min(k, |group|) rows, chosen by hashed priority, so re-runs and
    * other engines pick the SAME rows (salt-keyed, like every
    * sampler here).
    *
    * The priority is the 28-bit md5 ([[TextOps.hash28]]) — deliberately
    * 28 and not 60 bits, because the selection ranks priorities as
    * DOUBLES and 2^28 < 2^53 keeps them exact (a 60-bit hash would
    * round and could flip ranks between engines); priority ties (P ≈
    * |group|²/2^28) break on the id via the payload ordering.
    *
    * Shape: ONE [[graft.expr.TopKAgg]] pass — each map task reduces
    * its slice of a group to k candidates before the shuffle; no
    * window, no per-group sort, no second pass. Output: (groupCol,
    * idCol, rank 1..k in priority order). */
  def sampleKPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      salt: String = "sample",
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // TopKAgg keeps the HIGHEST scores; negating the hash selects the
    // smallest-priority rows
    val pr = TextOps.hash28(
      org.apache.spark.sql.functions.concat(lit(salt), lit(":"),
        col(idCol).cast("string"))).cast("double")
    df
      .select(col(groupCol).as("g"), col(idCol), (-pr).as("graft_pr_"))
      .groupBy(col("g"))
      .agg(graft.expr.TopKAgg.topK(col("graft_pr_"),
        org.apache.spark.sql.functions.struct(col(idCol)), k).as("graft_top_"))
      .select(col("g").as(groupCol),
        posexplode(col("graft_top_")).as(Seq("graft_r_", "e")))
      .select(col(groupCol), col("e").getField(idCol).as(idCol),
        (col("graft_r_") + 1).cast("int").as("rank"))
  }

  /** Deterministic GLOBAL corpus shuffle — the pre-training
    * decorrelation pass (data arrives grouped by crawl/source/time;
    * training wants it order-free). Each row gets a pseudorandom but
    * fully reproducible sort key, `hash60(seed ":" id)`, and the
    * corpus totally orders by (key, id) — same order on every run,
    * every cluster, every engine (the DuckDB oracle replays it); a
    * new seed is a fresh independent permutation.
    *
    * Shape: the added key is a projection; the ordering is ONE
    * range exchange + per-partition sort (Spark's orderBy — sampled
    * range boundaries, so output partitions are balanced regardless
    * of input clustering). Tie-break on id makes the order total:
    * 60-bit collisions cannot make it run-dependent. Writing the
    * result yields files in shuffled order whose READERS need no
    * further randomization. */
  def deterministicShuffle(
      docs: DataFrame,
      idCol: String = "doc_id",
      seed: String = "shuffle",
  ): DataFrame =
    docs
      .withColumn("shuffle_key",
        TextOps.hash60(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .orderBy(col("shuffle_key"), col(idCol))

  /** Deterministic stratified sampling: keep each row with a
    * per-stratum rate — the corpus-rebalancing op (downsample the
    * over-represented language, keep the rare ones). Same hash-bucket
    * machinery as [[assign]], so the SAME rows are kept on every run
    * and engine; map-side filter, no sampling pass. */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 0.0,
      salt: String = "sample",
  ): DataFrame = {
    val cut = rates.foldLeft(lit(math.round(defaultRate * Buckets)): Column) {
      case (els, (k, r)) =>
        when(col(strataCol) === k, lit(math.round(r * Buckets))).otherwise(els)
    }
    df.filter(bucketOf(col(idCol), salt) < cut)
  }

  /** Materialized split column on a frame. */
  def withSplit(
      df: DataFrame,
      idCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      salt: String = "split",
  ): DataFrame =
    df.withColumn("split", assign(col(idCol), weights, salt))

  /** LEAKAGE-SAFE split assignment — the dedup-aware split rule a
    * careful pipeline applies before any eval: hash-splitting on the
    * DOC id can put two near-duplicates on opposite sides of the
    * train/val cut, and the model then "generalizes" to val examples
    * it memorized from train. Here every member of a near-dup
    * CLUSTER (connected component over caller-supplied `pairs`
    * edges — passage sharing, MinHash, SimHash, any miner) inherits
    * the split of its component representative (the min id), so a
    * cluster lands wholly in ONE split; docs incident to no edge
    * keep their own id as the key, making this a strict refinement
    * of [[withSplit]] (identical assignment wherever no duplication
    * exists — and for clustered docs the cluster's split IS the
    * naive split of its min-id member).
    *
    * Output adds `split_key` (the audit column: which key was
    * hashed) and `split`. Scale shape: the CC label table covers
    * only edge-incident docs (dup clusters are a small corpus
    * fraction), one hash join back to the corpus on the id, then the
    * map-side assignment projection — no new shuffle beyond the join
    * and CC's own audited rounds. */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      weights: Seq[(String, Double)] = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      salt: String = "split",
      ccIters: Int = 3,
  ): DataFrame = {
    val cc = Dedup.connectedComponents(pairs, ccIters)
      .select(col("id").as(idCol), col("component"))
    df.join(cc, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
      .withColumn("split", assign(col("split_key"), weights, salt))
      .drop("component")
  }

  /** TOKEN-BUDGET mixture sampling — the training-data recipe op:
    * "take ~5B tokens of web, ~2B of code, ~1B of the rest". Where
    * [[stratifiedSample]] keeps a RATE per stratum, this fills an
    * ABSOLUTE token budget per group, deterministically:
    *
    * Docs hash into the [[Buckets]] granularity (same md5 family as
    * every split op — any SQL engine can audit the sample); per
    * (group, bucket) token totals cumulate IN BUCKET ORDER, and a
    * group keeps every bucket whose preceding-buckets total is still
    * under its budget — so each group's kept token count lands in
    * [budget, budget + one bucket's tokens), i.e. within ~0.01% of
    * corpus mass of the target. Bucket granularity is what makes the
    * shape scale-safe: the running sum is a window over ≤ Buckets
    * rows PER GROUP (bounded state, never a per-doc global window),
    * the per-group cut table is |groups| rows (broadcast), and the
    * keep decision is a map-side filter.
    *
    * Groups without a budget get `defaultBudget` (0 = dropped).
    * Budgets larger than a group's corpus keep the whole group. */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L,
      salt: String = "budget",
  ): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0, "budgets must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val bucketC = "graft_bucket_"
    val ntokC = "graft_ntok_"
    val cutC = "graft_cut_"
    val withMeta = df
      .withColumn(bucketC, bucketOf(col(idCol), salt))
      // null text counts like the empty string (one empty token) —
      // size(split(NULL)) would poison the sums with -1
      .withColumn(ntokC, size(split(coalesce(col(textCol), lit("")), " ")).cast("long"))
    val budgetExpr = budgets.foldLeft(lit(defaultBudget): Column) {
      case (els, (k, v)) => when(col(groupCol) === k, lit(v)).otherwise(els)
    }
    val w = Window.partitionBy(groupCol).orderBy(bucketC)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cuts = withMeta
      .groupBy(col(groupCol), col(bucketC)).agg(sum(ntokC).as("btok"))
      .withColumn("before", coalesce(sum(col("btok")).over(w), lit(0L)))
      .filter(col("before") < budgetExpr)
      .groupBy(col(groupCol)).agg(max(col(bucketC)).as(cutC))
      .withColumnRenamed(groupCol, "graft_group_")
    withMeta
      // null-SAFE equality: a NULL group is a real stratum (it gets
      // defaultBudget like any unbudgeted group); a plain equi-join
      // would silently drop every null-group row
      .join(broadcast(cuts), col(groupCol) <=> col("graft_group_"))
      .filter(col(bucketC) <= col(cutC))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** EPOCHS-PER-GROUP mixture — the standard training-mix knob
    * [[tokenBudgetSample]] cannot express: budgets only SUBSAMPLE
    * (keep at most what exists), while a mix recipe routinely says
    * "2.5 epochs of wikipedia, 0.3 of web". Each group's factor f
    * gives every doc floor(f) full copies, and the FRACTIONAL epoch
    * keeps one extra copy for exactly the docs whose hash bucket
    * falls under frac(f)·[[Buckets]] — the same md5 machinery as
    * every sampler here, so the chosen docs are identical on every
    * run, cluster, and engine (f < 1 degenerates to deterministic
    * subsampling; f = 0 drops the group).
    *
    * Output: the input columns plus `epoch` (0-based copy index) —
    * the DETERMINISTIC replica id downstream keying needs: packing
    * keyed on (id, epoch) is byte-stable, where a nondeterministic
    * replicate (explode×rand) would reshuffle between runs. Pure
    * map-side projection + explode of a bounded sequence; no
    * shuffle, no state. Fractions quantize to 1/[[Buckets]] steps
    * (0.01% — the shared sampler granularity). */
  def repeatFactorSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      factors: Map[String, Double],
      defaultFactor: Double = 1.0,
      salt: String = "repeat",
  ): DataFrame = {
    require(factors.values.forall(_ >= 0) && defaultFactor >= 0,
      "factors must be >= 0")
    // the output column and the transient are APPENDED — an input that
    // already carries either name would yield a duplicate/ambiguous
    // column with no error until far downstream (defensive style of
    // the other samplers)
    require(!df.columns.contains("epoch"),
      "input already has an 'epoch' column — rename it before repeatFactorSample")
    require(!df.columns.contains("graft_copies_"),
      "input must not carry the reserved 'graft_copies_' column")
    def fullOf(f: Double) = math.floor(f).toLong
    def cutOf(f: Double) = math.round((f - math.floor(f)) * Buckets)
    val full = factors.foldLeft(lit(fullOf(defaultFactor)): Column) {
      case (els, (k, f)) => when(col(groupCol) === k, lit(fullOf(f))).otherwise(els)
    }
    val cut = factors.foldLeft(lit(cutOf(defaultFactor)): Column) {
      case (els, (k, f)) => when(col(groupCol) === k, lit(cutOf(f))).otherwise(els)
    }
    val copies = full +
      when(bucketOf(col(idCol), salt) < cut, lit(1L)).otherwise(lit(0L))
    df
      .withColumn("graft_copies_", copies)
      // the filter guards the sequence: sequence(0, -1) counts DOWN
      .filter(col("graft_copies_") > 0)
      .select(df.columns.map(col).toIndexedSeq :+
        explode(sequence(lit(0L), col("graft_copies_") - 1)).as("epoch"): _*)
  }

  /** SEQUENCE PACKING layout for pre-training — the concat-and-chunk
    * step every LLM data pipeline runs last: documents (ordered by
    * `idCol`) are conceptually concatenated into one token stream and
    * cut into fixed `seqLen`-token training sequences; a document may
    * span a cut. This computes where every document lands WITHOUT
    * materializing the stream: per doc its token count, its global
    * token offset, and the first/last sequence ids it touches —
    * everything a writer needs to emit packed sequences (group by
    * seq id, slice by offset), and everything an auditor needs to
    * prove no token was dropped or duplicated.
    *
    * The global offset is an order-preserving PREFIX SUM, computed the
    * scale-safe way: range-repartition on the id, per-partition token
    * totals (one driver hop of #partitions longs — the
    * [[graft.llm.SuffixRank]] indexing pattern, weighted), then
    * per-partition running sums. No single-partition window, no
    * driver-side stream; determinism comes from the total order on
    * `idCol`, so re-runs and other engines lay out identical
    * sequences (q55 replays it in DuckDB with one window SUM).
    *
    * Output: (idCol, n_tokens, offset, first_seq, last_seq), one row
    * per input document, id-ordered semantics. */
  /** SYSTEMATIC weighted sampling — exact proportional-to-size
    * selection with zero randomness: lay a grid of mass points
    * {offset, offset+step, offset+2·step, …} over the cumulative
    * weight axis (rows ordered by `orderCols`, each row covering the
    * mass interval (cum−w, cum]) and keep every row whose interval
    * contains a grid point; `picks` counts the points it contains
    * (a row heavier than `step` is picked multiply — the upsampling
    * reading). The textbook guarantees, here EXACT rather than in
    * expectation: each row's pick count is within 1 of w/step, the
    * sample holds ⌊(W−offset)/step⌋+1 picks total, and the whole
    * thing is a pure function of (data, order, step, offset) — the
    * caller's `offset` is the seed, varying it rotates the sample.
    * Feed `orderCols` = the X103 deterministic-shuffle key for a
    * pseudorandom-but-replayable draw, or a curriculum order for
    * stratified-by-position sampling.
    *
    * Shape: one [[graft.ops.Rank.prefixSumWithTotal]] walk (range
    * exchange + internal-row running sum — no global sort, no
    * SinglePartition) and a map-side integral filter; the pick rule
    * is pure integer arithmetic (div on non-negatives = floor on
    * both engines), so the q101 oracle replays it bit-for-bit.
    * Non-positive weights carry no mass and are dropped up front
    * (the X120 rule — their cum ties would also break the interval
    * partition). Output: the input columns + `picks` (≥ 1). */
  def systematicWeightedSample(
      df: DataFrame,
      weightCol: String,
      orderCols: Seq[String],
      step: Long,
      offset: Long = 1L,
  ): DataFrame = {
    require(step >= 1L, s"step must be >= 1, got $step")
    require(offset >= 1L && offset <= step,
      s"offset must be in [1, step], got $offset (step $step)")
    // integral weights only: a double weight would TRUNCATE silently
    // in the long cast below and quietly re-weight the draw (the
    // X120/X135 exact-type rule)
    df.schema(weightCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"$weightCol is ${other.simpleString}: systematic sampling needs an " +
          "integral mass column — scale and round explicitly first")
    }
    val positive = df.filter(col(weightCol) > 0L)
      .withColumn(weightCol, col(weightCol).cast("long"))
    val (cum, _) = graft.ops.Rank.prefixSumWithTotal(positive, orderCols, weightCol)
    // grid points ≤ x, via INTEGRAL div (Spark's `/` on longs is true
    // division; `div` keeps the arithmetic exact past 2⁵³ and = floor
    // on the non-negative operands here): f(x) = (x−offset) div step
    // + 1 for x ≥ offset, else 0
    val picks = cum
      .withColumn("graft_a_", col("cum") - lit(offset))
      .withColumn("graft_b_", col("cum") - col(weightCol) - lit(offset))
      .withColumn("picks",
        when(col("graft_a_") >= 0L, expr(s"graft_a_ div $step"))
          .otherwise(lit(-1L)) -
        when(col("graft_b_") >= 0L, expr(s"graft_b_ div $step"))
          .otherwise(lit(-1L)))
    picks
      .filter(col("picks") >= 1L)
      .drop("cum", "graft_a_", "graft_b_")
  }

  /** Weighted PRIORITY sample without replacement (Efraimidis &
    * Spirakis 2006, the one-pass weighted-reservoir rule): every row
    * draws a deterministic uniform u from the md5 family
    * (u = (hash28(id‖salt) + 0.5) / 2²⁸ ∈ (0,1)) and is keyed by
    * ln(u)/w — the monotone-log form of the paper's u^(1/w) — and the
    * k LARGEST keys win. The paper's guarantee: inclusion follows the
    * sequential weighted draw without replacement (P(i drawn first) =
    * wᵢ/Σw, then recurse), so heavy rows are proportionally favored
    * but never certain — the weighted subsample a corpus mixer wants
    * when quality/length should BIAS, not dictate. Deterministic per
    * (id, salt): replays identically across runs and engines (the
    * fixed dyadic u's log is equally well-conditioned in both — the
    * q71 discipline); vary `salt` for fresh draws. Selection is ONE
    * global [[graft.expr.TopKAgg]] — map-side k-reduction, the
    * exchange carries O(k) per mapper, never the corpus; non-positive
    * weights are excluded (u^(1/w) is undefined there — stated, not
    * silent: they can never win anyway). */
  def weightedPrioritySample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "",
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (TextOps.hash28(concat(col(idCol).cast("string"), lit(salt)))
      .cast("double") + lit(0.5)) / lit(268435456.0) // 2^28
    val key = log(u) / col(weightCol).cast("double")
    val picked = df.filter(col(weightCol) > 0)
      .select(col(idCol).as("graft_id_"), key.as("graft_key_"))
      .agg(graft.expr.TopKAgg.topK(col("graft_key_"), col("graft_id_"), k)
        .as("graft_ids_"))
      .select(explode(col("graft_ids_")).as(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** Per-group [[weightedPrioritySample]] — the STRATIFIED weighted
    * draw (k per stratum, weights biasing within each): same
    * Efraimidis–Spirakis key, one TopKAgg per group key instead of
    * one global — the grouped aggregate shuffles O(k) per (mapper,
    * group), so a million strata cost a normal groupBy, never a
    * per-group job. Groups with fewer than k positive-weight rows
    * return what they have (the stratum IS small — stated, not
    * padded). */
  def weightedSamplePerGroup(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      groupCol: String,
      kPerGroup: Int,
      salt: String = "",
  ): DataFrame = {
    require(kPerGroup >= 1, s"kPerGroup must be >= 1, got $kPerGroup")
    val u = (TextOps.hash28(concat(col(idCol).cast("string"), lit(salt)))
      .cast("double") + lit(0.5)) / lit(268435456.0)
    val key = log(u) / col(weightCol).cast("double")
    val picked = df.filter(col(weightCol) > 0)
      .select(col(groupCol).as("graft_g_"), col(idCol).as("graft_id_"),
        key.as("graft_key_"))
      .groupBy(col("graft_g_"))
      .agg(graft.expr.TopKAgg.topK(col("graft_key_"), col("graft_id_"),
        kPerGroup).as("graft_ids_"))
      .select(explode(col("graft_ids_")).as(idCol))
    df.join(picked, Seq(idCol), "left_semi")
  }

  /** Exact integer square root of a non-negative long column that
    * fits in a double's 53-bit mantissa (required and guarded by the
    * CALLER — above 2⁵³ the seed itself is unrepresentable). IEEE
    * sqrt is correctly rounded in both the JVM and DuckDB, so
    * floor(sqrt(x)) is off by AT MOST one in either direction; the
    * two fix-up terms land both engines on the true isqrt — making
    * n^(1/2) as hash-matchable as the integer divisions everywhere
    * else in this file. */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val s1 = s0 + when((s0 + 1L) * (s0 + 1L) <= x, 1L).otherwise(0L)
    s1 - when(s1 * s1 > x, 1L).otherwise(0L)
  }

  /** TEMPERATURE-MIXED source sampling at α = ½ (the published
    * "sample groups ∝ sizeᵅ, α < 1" move — T5's mixing rate, the
    * Pile's weighting, every multilingual pre-training recipe:
    * down-weight the giant sources, surface the tails — made exact):
    * each document of group g carries the integer mass
    *
    *   v_g = (WeightScale · isqrt(n_g · WeightScale)) div n_g
    *
    * so a group's TOTAL mass is ∝ √n_g (up to one floor per group,
    * not per doc), and the X137 systematic-PPS sampler turns mass
    * into picks with zero randomness. α is fixed at ½ because ½ is
    * the exact-arithmetic sweet spot ([[isqrt]]); other exponents
    * mean libm pow and engine drift — callers needing a different α
    * supply their own mass column to [[systematicWeightedSample]].
    *
    * Shape: one tiny groupBy-count on the group key, broadcast back;
    * the sampler's prefix-sum walk is the only data-sized pass.
    * Headroom: n_g · WeightScale must stay under 2⁵³ (~9e9 docs per
    * group at the default scale — lower the scale beyond that); the
    * bound is ENFORCED at runtime via an assert_true folded into the
    * isqrt argument, so oversize groups fail loudly instead of
    * silently mis-weighting.
    *
    * Output: input columns + `mix_weight` (the per-doc mass) +
    * `picks` (≥ 1). */
  def temperatureSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      step: Long,
      offset: Long = 1L,
      weightScale: Long = 1000000L,
  ): DataFrame = {
    require(weightScale >= 1L, s"weightScale must be >= 1, got $weightScale")
    require(!df.columns.contains("mix_weight"),
      "input must not carry the reserved 'mix_weight' column")
    // Enforce the isqrt precondition n_g·weightScale < 2⁵³ loudly:
    // assert_true is folded INTO the isqrt argument (null→+0 when the
    // check passes) so column pruning cannot drop it, and the job
    // fails with a clear message instead of silently mis-weighting
    // groups beyond ~9e9 docs at the default scale.
    val maxN = ((1L << 53) - 1) / weightScale
    val checked = col("graft_n_") * lit(weightScale) +
      coalesce(
        assert_true(col("graft_n_") <= lit(maxN),
          lit(s"temperatureSample: a group exceeds $maxN rows, so " +
            s"count*weightScale($weightScale) is not exactly " +
            "representable as a double for isqrt — lower weightScale"))
          .cast("long"),
        lit(0L))
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("graft_n_"))
      .withColumn("graft_s_", isqrt(checked))
      .withColumn("mix_weight", expr(s"($weightScale * graft_s_) div graft_n_"))
      .drop("graft_n_", "graft_s_")
    val weighted = df.join(broadcast(counts), Seq(groupCol))
    systematicWeightedSample(weighted, "mix_weight", Seq(idCol), step, offset)
  }

  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
  ): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val spark = docs.sparkSession
    // two passes walk the same sorted partitions (sizes, then running
    // sums) — lazy checkpoint shares one materialization
    val counts = docs
      // null text counts like the empty string — size(split(NULL)) is
      // -1, which would shift every later offset and scramble sequences
      .select(col(idCol),
        size(split(coalesce(col(textCol), lit("")), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(idCol)
      .localCheckpoint(false)
    val rdd = counts.rdd
    val sums = rdd.mapPartitions(
      it => Iterator(it.map(_.getLong(1)).sum), preservesPartitioning = true).collect()
    val starts = sums.scanLeft(0L)(_ + _)
    val rows = rdd.mapPartitionsWithIndex { case (p, it) =>
      var acc = starts(p)
      it.map { r =>
        val n = r.getLong(1)
        val off = acc
        acc += n
        Row(r.get(0), n, off)
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
        counts.schema.head,
        StructField("n_tokens", LongType, nullable = false),
        StructField("offset", LongType, nullable = false))))
      // integral `div`, not `/`: Column./ is DOUBLE division, which
      // silently loses precision past 2^53 — a real offset at 100 TB
      .withColumn("first_seq", expr(s"offset div $seqLen"))
      .withColumn("last_seq",
        greatest(expr(s"(offset + n_tokens - 1) div $seqLen"),
          expr(s"offset div $seqLen")))
  }

  /** MATERIALIZED packed sequences — [[packSequences]] computes where
    * every document lands; this emits the training rows themselves:
    * (seq_id, text, n_tokens) with every sequence exactly `seqLen`
    * tokens except the last. Documents spanning a cut are split across
    * their sequences, nothing dropped, nothing duplicated (the spec
    * round-trips the concatenation byte-for-byte).
    *
    * Shape: one explode to (global token pos, token) — the offsets
    * come from the layout join, so positions need no window — then
    * groupBy the sequence id with an in-group sort. Per-group state is
    * bounded by `seqLen` TOKENS BY CONSTRUCTION (the whole point of
    * packing), so the collect_list can never blow up the way an
    * unbounded per-doc group could; the shuffle carries (gpos, token)
    * pairs hashed on seq_id — perfectly even by construction too. */
  def packedSequenceText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
  ): DataFrame = {
    val layout = packSequences(docs, idCol, textCol, seqLen)
      .select(col(idCol), col("offset"))
    docs
      // coalesce mirrors packSequences' token counting: a null text is
      // one empty token, so the stream and the layout stay aligned
      .select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), " ")).as(Seq("pos", "t")))
      .join(layout, idCol)
      .select((col("offset") + col("pos")).as("gpos"), col("t"))
      .withColumn("seq_id", expr(s"gpos div $seqLen"))
      .groupBy(col("seq_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("gpos"), col("t")))),
            x => x.getField("t")), " ").as(textCol),
        count(lit(1)).as("n_tokens"))
  }
}
