package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Incrementally maintained DERIVED keyed table — the row-wise twin of
  * [[IncrementalAgg]] (which maintains aggregates over append-log
  * sources): a destination table that is always `transform(source)`
  * for a row-wise transform (project / derive / filter), brought up to
  * date by applying only what CHANGED since the last refresh instead
  * of recomputing the view.
  *
  * The cursor is the SOURCE VERSION last applied, stored as the
  * destination's batch high-water mark — it commits in the SAME
  * manifest rename as the data it describes
  * ([[SnapshotBucketedStore.upsertWithBatch]]), so "applied but cursor
  * didn't move" cannot exist. Each refresh reads the source's CDC
  * window ([[SnapshotBucketedStore.changesSince]] — cost scales with
  * the touched fraction, not the table):
  *
  *   - added/changed source rows map through `transform`; surviving
  *     images upsert downstream by key;
  *   - removed source keys — and rows the transform now FILTERS OUT
  *     (a row that passed the gate, then changed to fail it) — delete
  *     downstream.
  *
  * Crash discipline: deletes run FIRST (keyed deletes are idempotent
  * and carry no mark), then the mark-advancing upsert. A crash
  * anywhere in between replays the whole window on the next refresh —
  * deletes no-op, the upsert re-applies the same images — and the pair
  * converges to the one-atomic-apply state; a crash after the upsert
  * leaves the cursor at the window end, so the replay is refused.
  * Readers between the two commits can observe the deleted-but-not-
  * yet-upserted seam (the same per-table-atomicity honesty as the
  * two-table streaming index marks).
  *
  * When the cursor's source snapshot is VACUUMED (CDC horizon passed),
  * the refresh falls back to a FULL rebuild: one atomic bucketed swap
  * ([[SnapshotBucketedStore.rebuild]] — stale keys vanish with the
  * generation) followed by a mark-setting empty upsert. At 100 TB the
  * contract is the usual one: refresh inside the retention window and
  * pay for the touched fraction; miss it and pay for one rebuild.
  *
  * `transform` must be ROW-WISE (each output row derived from one
  * input row, key column preserved): the refresh feeds it a partial
  * window, so any cross-row computation (aggregation, joins against
  * the same table, windows) would see the window, not the table —
  * that shape is [[IncrementalAgg]]'s, not this one's.
  */
object ChangeFeed {

  /** Bring `dst.dstTable` up to date with `transform(src.srcTable)`.
    * Returns true when anything advanced (including a no-change
    * cursor bump), false when already current or the source doesn't
    * exist yet. */
  def refresh(
      src: SnapshotBucketedStore,
      srcTable: String,
      key: String,
      dst: SnapshotBucketedStore,
      dstTable: String)(transform: DataFrame => DataFrame): Boolean = {
    val latest = src.snapshots(srcTable).lastOption match {
      case Some(v) => v
      case None => return false
    }
    val cursor = dst.lastAppliedBatch(dstTable)
    if (cursor.exists(_ >= latest)) return false

    def fullBuild(): Boolean =
      src.readAt(srcTable, latest) match {
        case None => false
        case Some(rows) =>
          val images = checkedImages(transform(rows), key)
          dst.rebuild(dstTable, images, key)
          // rebuild carries the old mark forward; a second (empty)
          // upsert sets the cursor — a crash between the two replays
          // the rebuild, which is idempotent at this source version
          dst.upsertWithBatch(dstTable, images.limit(0), key, latest)
          true
      }

    cursor match {
      case None => fullBuild()
      case Some(cv) =>
        src.changesSince(srcTable, cv.toInt, key, Some(latest)) match {
          case None => fullBuild() // cursor snapshot vacuumed
          case Some(ch) =>
            val cand = ch.filter(col("change") =!= "removed").drop("change")
            val images = checkedImages(transform(cand), key)
            val gone = ch.filter(col("change") === "removed").select(col(key))
              .union(cand.select(col(key)).except(images.select(col(key))))
              .distinct()
            dst.delete(dstTable, key, gone)(images.sparkSession)
            dst.upsertWithBatch(dstTable, images, key, latest)
            true
        }
    }
  }

  private def checkedImages(images: DataFrame, key: String): DataFrame = {
    require(images.columns.contains(key),
      s"transform must preserve the key column '$key'; " +
        s"got ${images.columns.mkString(",")}")
    images
  }
}
