package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.TextIndex

/** Streaming QUERY serving against the persisted inverted index —
  * [[VectorSearchIntake]]'s discipline on the text side: query text
  * streams in, each micro-batch is answered by the EXACT batch path
  * ([[graft.llm.TextIndex.bm25From]] — term-Bloom-pruned postings
  * read, the shared exact-integer scoring core), and each query's
  * current top-k lands as ONE `(id, hits: array<struct<rank, doc_id,
  * score>>)` row via the keyed exactly-once upsert. Whole-query grain
  * for the same reason as the vector side: a re-sent query REPLACES
  * its result set, so index growth/deletes converge by key. BM25's
  * no-evidence-no-rows rule becomes an EMPTY hits row here — "served,
  * nothing matched" must be stored, or a re-serve against a shrunken
  * index would keep stale hits. Replayed epochs are refused by the
  * batch mark riding the results table's manifest rename. */
object TextSearchIntake {

  /** Drain all currently-available queries (AvailableNow), answering
    * each micro-batch against the index and upserting results
    * exactly-once. Query ids must be BIGINT (the serving-row key). */
  def drainTo(
      queries: DataFrame,
      store: graft.io.SnapshotBucketedStore,
      indexTable: String,
      resultsTable: String,
      checkpoint: String,
      topK: Int,
      qidCol: String = "qid",
      qtextCol: String = "qtext",
  ): Unit = {
    val q = queries.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(store, indexTable, resultsTable, batch, batchId,
          topK, qidCol, qtextCol): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** One micro-batch of serving: answer the batch from the stored
    * postings and keyed-upsert one `(id, hits)` row per query with
    * the epoch mark. Returns false untouched for a replayed epoch. */
  def applyBatch(
      store: graft.io.SnapshotBucketedStore,
      indexTable: String,
      resultsTable: String,
      batch: DataFrame,
      batchId: Long,
      topK: Int,
      qidCol: String,
      qtextCol: String,
  ): Boolean = {
    if (store.lastAppliedBatch(resultsTable).exists(batchId <= _)) return false
    val res = TextIndex.bm25From(store, indexTable, batch, topK,
      qidCol = qidCol, qtextCol = qtextCol)
    val hits = res
      .groupBy(col("qid").as("id"))
      .agg(sort_array(collect_list(
        struct(col("rank"), col("doc_id"), col("score")))).as("hits"))
    val served = batch.select(col(qidCol).as("id")).distinct()
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("hits"), array().cast(
          "array<struct<rank:int,doc_id:bigint,score:bigint>>")).as("hits"))
    store.upsertWithBatch(resultsTable, served, "id", batchId)
    true
  }

  /** The flat (query, rank) view of a results table — what downstream
    * SQL joins against; exploding is the reader's cost. */
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
                org.apache.spark.sql.types.StructField("doc_id",
                  org.apache.spark.sql.types.LongType),
                org.apache.spark.sql.types.StructField("score",
                  org.apache.spark.sql.types.LongType))))))))
    }
    t.select(col("id").as("qid"), explode(col("hits")).as("h"))
      .select(col("qid"), col("h.rank").as("rank"),
        col("h.doc_id").as("doc_id"), col("h.score").as("score"))
  }
}
