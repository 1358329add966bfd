package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-corpus cleaning pipeline — what the
  * individual operators exist FOR:
  *
  *   exact dedup (content-hash keepers)
  *     → near-dup drop (MinHash-LSH candidates, Jaccard-verified,
  *       min-id survivor)
  *     → quality filter (Gopher-style windows)
  *
  * Each stage is the already-tested operator; this just wires them:
  * two hash joins (semi on exact keepers, anti on near-dup drops) and
  * a map-side filter. At 100 TB the stage order matters: exact dedup
  * first shrinks the LSH input and removes the identical-doc clusters
  * that the bucket-width cap would otherwise have to drop (see
  * docs/SCALE.md §5).
  */
object Corpus {

  def clean(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.5,
  ): DataFrame = {
    val keepers = Dedup.exactKeepers(docs, idCol, textCol)
      .select(col(idCol))
    // Exact-dedup FIRST, then run LSH on the survivors only. This is
    // output-equivalent for the final keep-set (an exact dup has the
    // keeper's text, hence the same shingles/signature/Jaccard, and
    // the keeper has the smaller id — so any drop edge through a
    // non-keeper is also a drop edge through its keeper) while the
    // LSH input shrinks by the exact-dup fraction and identical-doc
    // clusters can no longer blow past the bucket-width cap.
    val kept = docs.join(keepers, Seq(idCol), "left_semi")
    val nearDrops = Dedup.nearDupDrops(
      Dedup.nearDupPairs(kept, idCol, textCol, n = n, threshold = threshold))
      .withColumnRenamed("drop_id", idCol)
    kept
      .join(nearDrops, Seq(idCol), "left_anti")
      .filter(TextOps.qualityKeep(col(textCol)))
  }
}
