package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL connected-component label maintenance — the shared
  * union-find-by-contraction core behind every streaming dedup-label
  * maintainer ([[AnnIntake.updateLabels]]'s MinHash tier, [[
  * VectorIndexIntake.updateDupLabels]]'s embedding tier): a persisted
  * `(id, component)` table absorbs one batch of verified edges at a
  * time, merging ONLY what the new edges touch.
  *
  * The step (factored out of AnnIntake, semantics unchanged):
  *   1. edge endpoints LIFT to their frozen labels (absent → own id);
  *      lifted pairs with equal labels are already-merged — dropped;
  *   2. the surviving CONTRACTED label graph (≤ |new edges| nodes —
  *      the affected components only, never the corpus) re-converges
  *      through the exact batch CC ([[graft.llm.Dedup.
  *      connectedComponentsConverged]] — min-label roots);
  *   3. old labels remap through (old label → new root); new
  *      edge-incident ids insert with their root;
  *   4. keyed exactly-once commit: changed + inserted rows and the
  *      batch mark in ONE manifest rename ([[graft.io.
  *      SnapshotBucketedStore.upsertWithBatch]]); a replayed epoch
  *      returns false untouched.
  *
  * Labels are MONOTONE (merges never un-merge), so the table after
  * any drain sequence equals batch CC over the union of all merged
  * edges — the equivalence both intake spec families pin. Cost is
  * O(affected) per batch, corpus-size-independent. */
object IncrementalCc {

  /** Merge one batch of verified edges (`id_a`, `id_b`) into
    * `labelsTable`. Returns false untouched for a replayed epoch. */
  def mergeEdges(
      store: graft.io.SnapshotBucketedStore,
      labelsTable: String,
      edges: DataFrame,
      batchId: Long,
  ): Boolean = {
    if (store.lastAppliedBatch(labelsTable).exists(batchId <= _)) return false
    val spark = edges.sparkSession
    val idType = edges.schema("id_a").dataType
    val frozen = store.read(labelsTable).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", idType),
          org.apache.spark.sql.types.StructField("component", idType)))))
    // lift endpoints to frozen labels; drop already-merged pairs
    val contracted = edges
      .join(frozen.withColumnsRenamed(
        Map("id" -> "id_a", "component" -> "graft_la_")), Seq("id_a"), "left")
      .join(frozen.withColumnsRenamed(
        Map("id" -> "id_b", "component" -> "graft_lb_")), Seq("id_b"), "left")
      .select(coalesce(col("graft_la_"), col("id_a")).as("la"),
        coalesce(col("graft_lb_"), col("id_b")).as("lb"))
      .filter(col("la") =!= col("lb"))
      .select(least(col("la"), col("lb")).as("id_a"),
        greatest(col("la"), col("lb")).as("id_b"))
      .distinct()
      .localCheckpoint()
    // local re-convergence on the affected-component graph only
    val cc = graft.llm.Dedup.connectedComponentsConverged(contracted)
    val remap = cc.withColumnsRenamed(
      Map("id" -> "graft_l_", "component" -> "graft_r_"))
    // ONLY the rows the batch actually changes are written — the
    // O(affected) shape, not O(all labels): old rows whose component
    // remapped to a different root, plus the batch's new
    // edge-incident ids (min-id labels are themselves member ids,
    // so every OLD contracted node already sits in the frozen table
    // and the anti-join isolates exactly the inserts)
    val changedOld = frozen
      .join(remap, col("component") === col("graft_l_"))
      .filter(col("graft_r_") =!= col("component"))
      .select(col("id"), col("graft_r_").as("component"))
    val inserts = cc.join(frozen.select("id"), Seq("id"), "left_anti")
    // keyed exactly-once commit: merged buckets + the batch mark in
    // ONE manifest rename; an empty delta still advances the mark
    store.upsertWithBatch(labelsTable,
      changedOld.unionByName(inserts), "id", batchId)
    true
  }
}
