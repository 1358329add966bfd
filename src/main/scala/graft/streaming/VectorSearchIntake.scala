package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.Ivf

/** Streaming QUERY serving against the persisted IVF-PQ index — the
  * read-side twin of [[VectorIndexIntake]]: queries stream in, each
  * micro-batch is answered by [[graft.llm.Ivf.searchPqFrom]] (the
  * stored codes, the pruned read, the fused ADC scorer — exactly the
  * batch path, which is what makes stream ≡ batch provable), and each
  * query's current top-k lands in a results table as ONE row per
  * query — `(id, hits: array<struct<rank, neighbor_id, sim>>)` —
  * via the keyed exactly-once upsert. One row per query is the
  * serving shape: a re-sent query REPLACES its whole result set (the
  * k-shrinks-or-grows and index-drift cases converge by key, where
  * flat per-rank rows would leave stale tails), and the epoch mark
  * rides the same manifest rename as the data, so a replayed epoch
  * is refused rather than re-served.
  *
  * A query with NO candidates (empty index, no cell overlap, or every
  * candidate quantized to zero norm) still writes its row with an
  * EMPTY hits array — "served, nothing found" is a state, and a
  * re-served query against a shrunken index must overwrite its stale
  * hits rather than keep them.
  *
  * Scale shape: per micro-batch the work is the [[Ivf.searchPqFrom]]
  * plan itself (cell-pruned index read, packed-code exchanges,
  * map-side top-k) plus one keyed upsert touching only the buckets
  * the batch's query ids hash to. Nothing accumulates per batch but
  * the answered rows. */
object VectorSearchIntake {

  /** Drain all currently-available queries (AvailableNow), answering
    * each micro-batch against the index table and upserting results
    * exactly-once. `store` holds BOTH tables; the results table is
    * keyed by the query id. */
  def drainTo(
      queries: DataFrame,
      store: graft.io.SnapshotBucketedStore,
      indexTable: String,
      resultsTable: String,
      checkpoint: String,
      centroids: DataFrame,
      topK: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
  ): Unit = {
    val q = queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(store, indexTable, resultsTable, batch, batchId,
          centroids, topK, nprobe, idCol, embCol): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of serving: answer the batch's queries from the
    * stored index and keyed-upsert one `(id, hits)` row per query
    * with the epoch mark. Returns false untouched for a replayed
    * epoch. Query ids share the index's id space for the self-
    * exclusion test only — a query whose id matches an indexed vector
    * is treated as that vector asking "who else is near me". */
  def applyBatch(
      store: graft.io.SnapshotBucketedStore,
      indexTable: String,
      resultsTable: String,
      batch: DataFrame,
      batchId: Long,
      centroids: DataFrame,
      topK: Int,
      nprobe: Int,
      idCol: String,
      embCol: String,
  ): Boolean = {
    if (store.lastAppliedBatch(resultsTable).exists(batchId <= _)) return false
    val res = Ivf.searchPqFrom(store, indexTable, batch, idCol, embCol,
      centroids, topK, nprobe, queryPred = lit(true))
    val hits = res
      .groupBy(col("query_id").as("id"))
      .agg(sort_array(collect_list(
        struct(col("rank"), col("neighbor_id"), col("sim")))).as("hits"))
    // left join back so no-candidate queries write an EMPTY hits row
    val served = batch.select(col(idCol).as("id")).distinct()
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hits"), array().cast(
          "array<struct<rank:int,neighbor_id:bigint,sim:double>>")).as("hits"))
    store.upsertWithBatch(resultsTable, served, "id", batchId)
    true
  }

  /** The flat view of a results table: one row per (query, rank) —
    * what downstream SQL joins against. Exploding is the READER's
    * cost; the stored grain stays whole-query so upserts converge. */
  def results(
      store: graft.io.SnapshotBucketedStore,
      resultsTable: String,
  ): DataFrame = {
    val t = store.read(resultsTable).getOrElse {
      val s = store.spark
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("hits",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("rank",
                  org.apache.spark.sql.types.IntegerType),
                org.apache.spark.sql.types.StructField("neighbor_id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("sim",
                  org.apache.spark.sql.types.DoubleType))))))))
    }
    t.select(col("id").as("query_id"), explode(col("hits")).as("h"))
      .select(col("query_id"), col("h.neighbor_id").as("neighbor_id"),
        col("h.sim").as("sim"), col("h.rank").as("rank"))
  }
}
