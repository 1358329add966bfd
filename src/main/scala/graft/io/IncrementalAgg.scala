package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Incrementally maintained groupBy aggregate — the materialized-view
  * payoff of the dir-level CDC ([[SnapshotBucketedStore
  * .appendsSince]]): a grouped sum/count table over an append-log
  * source that a refresh brings up to date by aggregating ONLY the
  * generations appended since the last refresh, never re-scanning
  * history. At 100 TB this is the difference between a nightly
  * full-table groupBy and a per-load delta aggregate of the load
  * itself.
  *
  * Mechanics: the destination is itself an append-log table whose
  * generations each hold the delta-aggregate of one refresh window;
  * reading merges them with a plain groupBy-sum (the X74 sketch
  * discipline — the maintained table IS a mergeable sketch of the
  * source). The refresh cursor (highest source VERSION applied)
  * rides the destination manifest's batch mark, so data + cursor
  * commit in ONE rename: a crash between commit and the caller
  * observing it makes the next refresh a no-op, not a double-count —
  * exactly-once without any coordinator.
  *
  * Sum columns must be EXACT types (integral or decimal): their sums
  * are reassociation-free, so the maintained aggregate is
  * BIT-IDENTICAL to a one-shot groupBy over the full source
  * (spec-pinned) — a double sum would drift by merge order and the
  * equality contract (and any oracle) with it. Cast doubles to
  * decimal at the source, the engine-wide rule.
  *
  * A source compaction inside a refresh window rewrites the dirs the
  * delta capture needs ([[SnapshotBucketedStore.appendsSince]]
  * refuses loudly); [[refresh]] then falls back to ONE full rebuild
  * at the current version ([[SnapshotBucketedStore
  * .replaceWithBatch]] installs content + cursor atomically) and is
  * incremental again from there — always convergent, never silently
  * wrong.
  */
object IncrementalAgg {

  /** Bring `dst` up to date with `src` (append-log source table).
    * `sumCols` are summed per `keys`; a `rows` count column is
    * maintained automatically (sums and counts make averages a
    * read-side division). Returns true when new source generations
    * were applied (or a rebuild ran), false when already current.
    * No-op (false) when the source doesn't exist yet. */
  def refresh(
      store: SnapshotBucketedStore,
      src: String,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
  ): Boolean = {
    require(keys.nonEmpty, "need at least one key column")
    require(sumCols.nonEmpty, "need at least one sum column")
    val versions = store.snapshots(src)
    if (versions.isEmpty) return false
    val cur = versions.max
    store.lastAppliedBatch(dst) match {
      case Some(c) if c >= cur => false
      case Some(c) =>
        // incremental window (c, cur]; a compaction inside it makes
        // the dir-level capture unsound, and a vacuumed cursor
        // manifest makes it impossible (appendsSince → None) —
        // rebuild once in either case
        def rebuild(): Boolean = {
          store.replaceWithBatch(dst,
            deltaAgg(store.readAt(src, cur).get, keys, sumCols), cur.toLong)
          true
        }
        try {
          store.appendsSince(src, c.toInt, Some(cur)) match {
            case Some(delta) =>
              store.appendIfNew(dst, deltaAgg(delta, keys, sumCols), cur.toLong)
            case None => rebuild()
          }
        } catch {
          case _: IllegalArgumentException => rebuild()
        }
      case None =>
        // first refresh (or an unmarked dst): full build at cur,
        // content + cursor in one commit
        store.replaceWithBatch(dst,
          deltaAgg(store.readAt(src, cur).get, keys, sumCols), cur.toLong)
        true
    }
  }

  /** Streaming twin of [[refresh]]: maintain the aggregate DIRECTLY
    * from a stream (AvailableNow drain), one exactly-once
    * delta-aggregate generation per micro-batch — the
    * [[graft.streaming.SketchIntake]] discipline with grouped sums
    * as the mergeable cells. Exact-type sums make the maintained
    * read bit-identical to a one-shot aggregate over everything
    * drained, batch boundaries invisible. ONE maintainer per
    * destination: the stream's epoch ids and [[refresh]]'s version
    * cursor share the manifest batch mark — mixing both writers on
    * one table would cross-fence. */
  def drainTo(
      events: DataFrame,
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
      checkpoint: String,
  ): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendIfNew(dst, deltaAgg(batch, keys, sumCols), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** The maintained aggregate: generations merged by groupBy-sum.
    * Output: keys, the sum columns (same names), `rows`. */
  def read(
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
  ): Option[DataFrame] =
    store.read(dst).map(merge(_, keys, sumCols))

  /** Fold the destination's generation log to one (read-equivalent,
    * CAS-fenced — [[SnapshotBucketedStore.compactLogs]]); the batch
    * cursor survives compaction by that method's contract. */
  def compact(
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
  ): Unit = {
    store.compactLogs(dst, merge(_, keys, sumCols)): Unit
  }

  private def exactType(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }

  private def deltaAgg(df: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    sumCols.foreach(c => require(exactType(df, c),
      s"sum column $c is ${df.schema(c).dataType.simpleString}: incremental " +
        "sums need exact (integral/decimal) types — a double sum drifts " +
        "with merge order; cast to decimal at the source"))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("rows"), sumCols.map(c => sum(col(c)).as(c)): _*)
      .select((keys.map(col) ++ sumCols.map(col) :+ col("rows")): _*)
  }

  private def merge(df: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col("rows")).as("rows"), sumCols.map(c => sum(col(c)).as(c)): _*)
      .select((keys.map(col) ++ sumCols.map(col) :+ col("rows")): _*)
}
