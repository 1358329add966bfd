package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.SnapshotBucketedStore

/** PERSISTED binary-quantization index — the stored-codes form of
  * [[Similarity.binaryTopK]] (the X187 discipline on the 1-bit tier):
  * sign-bit packing runs ONCE at write time into a store table
  * `(id, bw)`, and every query batch serves from the materialized
  * codes — no per-batch packing, not even [[Similarity.binaryPool]]'s
  * pack-once shuffle. The binary scan is EXHAUSTIVE by design (no
  * cell pruning to record stats for — that honesty is the tier's
  * contract; see the X202 notes on why blocking has no recall at
  * Hamming ~dim/2), so the stored table's win is purely
  * pack-at-write + the 32× scan-bandwidth floor.
  *
  * Maintenance is the simplest of the index family: packing is
  * MODEL-FREE (no centroids, no df — the sign function), so appends
  * are plain keyed upserts with no frozen-artifact discipline, a
  * changed vector re-sends its key, deletes delete, and exactly-once
  * streaming lands through `upsertWithBatch` like any keyed intake.
  */
object BinaryIndex {

  /** Pack the corpus and write the `(id, bw)` codes table (full
    * bucketed rebuild — serving reads latest). */
  def writeIndex(
      store: SnapshotBucketedStore,
      table: String,
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int): Unit =
    store.rebuild(table, indexRows(df, idCol, embCol, dim), "id")

  /** Incremental maintenance: new/changed vectors pack and upsert by
    * key (no frozen model — sign packing is self-contained). */
  def appendVectors(
      store: SnapshotBucketedStore,
      table: String,
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int): Unit =
    store.upsert(table, indexRows(df, idCol, embCol, dim), "id")(
      df.sparkSession)

  /** The index row shape: (id, bw packed sign words). */
  def indexRows(df: DataFrame, idCol: String, embCol: String,
      dim: Int): DataFrame =
    df.select(col(idCol).as("id"),
      Similarity.binarizeWords(col(embCol).cast("array<double>"), dim)
        .as("bw"))

  /** [[Similarity.binaryTopK]] THROUGH the stored codes: stage 1
    * scans the materialized `(id, bw)` table (queries pack on the
    * driver-small side and broadcast; the corpus floats are never
    * touched), stage 2 re-ranks the |queries|·pool survivors by exact
    * cosine against `corpus` — bit-identical to the inline operator
    * (the spec and q163's shared-oracle hash both pin it). */
  def searchFrom(
      store: SnapshotBucketedStore,
      table: String,
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      k: Int,
      queryPred: Column,
      pool: Int = 32): DataFrame = {
    require(pool >= k, s"pool ($pool) must cover k ($k)")
    val words = (dim + 31) / 32
    val codes = store.read(table).getOrElse(
      throw new java.util.NoSuchElementException(s"no index table $table"))
    val q = corpus.filter(queryPred)
      .select(col(idCol).as("query_id"),
        Similarity.binarizeWords(col(embCol).cast("array<double>"), dim)
          .as("qw"))
    val scored = broadcast(q)
      .join(codes, col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        Similarity.hammingWordsN(col("qw"), col("bw"), words).as("hamming"))
    val payload = struct(col("neighbor_id"), col("hamming"))
    val cand = scored
      .groupBy(col("query_id"))
      .agg(graft.expr.TopKAgg.topK(-col("hamming").cast("long"), payload, pool)
        .as("graft_bp_"))
      .select(col("query_id"), explode(col("graft_bp_")).as("e"))
      .select(col("query_id"), col("e.neighbor_id").as("neighbor_id"),
        col("e.hamming").as("hamming"))
    val ex = Similarity.withNorm(corpus, idCol, embCol)
    val qv = ex.select(col("id").as("query_id"),
      col("e").as("qe"), col("nrm").as("qn"))
    val nv = ex.select(col("id").as("neighbor_id"),
      col("e").as("ne"), col("nrm").as("nn"))
    val exact = cand
      .join(qv, Seq("query_id"))
      .join(nv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        (Similarity.dot(col("qe"), col("ne")) / (col("qn") * col("nn")))
          .as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
