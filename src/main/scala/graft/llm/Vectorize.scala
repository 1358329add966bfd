package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine document vectors: hashed TF-IDF (the feature-hashing /
  * "hashing trick" vectorizer — Weinberger et al. 2009's fixed-dim
  * trick over the Salton & Buckley tf·idf weighting), closing the
  * corpus→vector→ANN loop: until now the similarity stack
  * (topKWithinLabel / annTopK / semanticKeepers / maxSim*) ran only on
  * fixture embeddings; this derives a vector FROM the corpus itself,
  * and its output feeds every existing [[Similarity]] op unchanged.
  *
  * The recipe, every step engine-mirrorable:
  *   - token → bucket: the first 7 md5 hex digits mod `dims` (the
  *     [[TextOps.hash28]] / DSIR md5-mod trick — DuckDB computes the
  *     identical bucket, so the DIMENSION ASSIGNMENT hash-replays,
  *     which no JVM-hashCode vectorizer could);
  *   - tf: occurrences of the bucket in the doc (multiplicity kept);
  *   - idf: the X155 exact-integer surrogate of ln((N−df+½)/(df+½)+1):
  *     idfS = ((2·(N−df)+1)·scale) div (2·df+1) — monotone in df
  *     wherever df differs, one integer chain, no libm log. A bucket
  *     hit by EVERY doc floors to idfS = 0 once N > scale/2 (its
  *     ratio < 1/scale) — the stopword-suppression behavior tf·idf is
  *     for, arrived at exactly;
  *   - weight w = tf·idfS (exact long), L2-normalized per doc with
  *     the norm summed as DECIMAL(19,0)×DECIMAL(19,0) products (the
  *     q119 overflow discipline — order-free, so the norm and every
  *     component replay bit-for-bit: norm² ≤ 38 digits holds through
  *     w ≈ 10¹⁷ per bucket at thousands of buckets).
  *
  * Scale shape: one (doc, bucket) count shuffle; the bucket df table
  * is ≤ `dims` rows → BROADCAST joins everywhere (df is the point of
  * fixed dims: the "vocabulary" cannot grow past `dims`); totals ride
  * the 1-row broadcast crossJoin pattern; the norm is a window sum
  * over the same doc partitioning the tf shuffle already established;
  * dense assembly is one map-collect per doc. Nothing is ever
  * vocabulary-sized on the driver or quadratic anywhere.
  */
object Vectorize {

  /** idf resolution — shared with [[Retrieval.IdfScale]] (X155). */
  val IdfScale = 1000L

  /** Hashed bucket of one token: first-7-hex-digit md5 mod `dims`,
    * nonnegative (hash28 < 2²⁸). The oracle mirror is
    * `('0x'||substr(md5(t),1,7))::BIGINT % dims`. */
  def bucketOf(term: Column, dims: Int): Column =
    (TextOps.hash28(term) % dims).cast("int")

  /** (id, bucket, tf) — the sparse term-frequency table: whitespace
    * tokens (the [[Retrieval]] convention), bucket-hashed, counted
    * with multiplicity. One map-side explode + one combinable count
    * shuffle. */
  def termFrequencies(
      docs: DataFrame, idCol: String, textCol: String, dims: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(split(coalesce(col(textCol), lit("")), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .select(col("id"), bucketOf(col("t"), dims).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))

  /** (bucket, df) — documents containing each bucket, derived from
    * the tf table (already distinct per (doc, bucket)). ≤ `dims`
    * rows: the frozen "model" a query side embeds against. */
  def docFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("bucket")).agg(count(lit(1)).as("df"))

  /** 1-row corpus size frame (the broadcast-totals pattern). */
  def corpusSize(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"))

  /** The sparse NORMALIZED form — one row per (doc, non-empty
    * bucket): (id, bucket, tf, df, idfs, comp) with comp =
    * tf·idfS / ‖w‖₂ (0.0 for a doc whose every bucket floored to
    * idfS 0). `dfTable`/`totals` parameterize the idf MODEL: pass
    * the corpus's own ([[tfidfSparse]]) or a frozen corpus model
    * under query text ([[embed]]) — buckets unseen in the model take
    * df = 0, the maximal idf, by the same formula. */
  def sparseNormalized(
      texts: DataFrame,
      idCol: String,
      textCol: String,
      dfTable: DataFrame,
      totals: DataFrame,
      dims: Int,
      scale: Long = IdfScale,
  ): DataFrame = {
    val dec = DecimalType(19, 0)
    val byDoc = Window.partitionBy(col("id"))
    termFrequencies(texts, idCol, textCol, dims)
      .join(broadcast(dfTable), Seq("bucket"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .crossJoin(broadcast(totals))
      .withColumn("idfs",
        expr(s"((2 * (n_docs - df) + 1) * $scale) div (2 * df + 1)"))
      .withColumn("w", col("tf") * col("idfs"))
      .withColumn("nrm",
        sqrt(sum(col("w").cast(dec) * col("w").cast(dec)).over(byDoc)
          .cast("double")))
      .withColumn("comp",
        when(col("nrm") === 0.0, lit(0.0))
          .otherwise(col("w").cast("double") / col("nrm")))
      .select(col("id"), col("bucket"), col("tf"), col("df"),
        col("idfs"), col("comp"))
  }

  /** [[sparseNormalized]] of a corpus against its OWN df model — the
    * fit+transform form. */
  def tfidfSparse(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      scale: Long = IdfScale,
  ): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol, dims)
    sparseNormalized(docs, idCol, textCol, docFrequencies(tf),
      corpusSize(docs), dims, scale)
  }

  /** Densify a sparse normalized frame to (id, vec: array<double>)
    * of length `dims` — the shape every [[Similarity]] op consumes.
    * `ids` (one row per expected id) makes the output TOTAL: a doc
    * with no tokens gets the zero vector instead of vanishing. */
  def toDense(
      sparse: DataFrame, ids: DataFrame, idCol: String, dims: Int): DataFrame = {
    val dense = sparse
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("comp"))))
        .as("graft_m_"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dims - 1)),
          j => coalesce(element_at(col("graft_m_"), j.cast("int")), lit(0.0)))
          .as("vec"))
    ids.select(col(idCol).as("id")).distinct()
      .join(dense, Seq("id"), "left")
      .withColumn("vec",
        coalesce(col("vec"), array_repeat(lit(0.0), dims)))
  }

  /** Corpus → L2-normalized dense doc vectors (id, vec), fit and
    * transformed in one pass. Feed straight into
    * `Similarity.topKWithinLabel` / `annTopK` / `maxSim*` /
    * `Dedup.semanticKeepers`. */
  def tfidfVectors(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dims: Int,
      scale: Long = IdfScale,
  ): DataFrame =
    toDense(tfidfSparse(docs, idCol, textCol, dims, scale),
      docs, idCol, dims)

  /** Embed arbitrary text under a FROZEN corpus model (the query side
    * of retrieval: queries must weight by the CORPUS's df, not their
    * own): `dfTable` = [[docFrequencies]] of the corpus tf table,
    * `totals` = [[corpusSize]] of the corpus. Buckets the corpus
    * never saw take df = 0 — the maximal idf under the same
    * formula. */
  def embed(
      texts: DataFrame,
      idCol: String,
      textCol: String,
      dfTable: DataFrame,
      totals: DataFrame,
      dims: Int,
      scale: Long = IdfScale,
  ): DataFrame =
    toDense(
      sparseNormalized(texts, idCol, textCol, dfTable, totals, dims, scale),
      texts, idCol, dims)
}
