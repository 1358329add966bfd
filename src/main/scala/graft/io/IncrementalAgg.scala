package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Incrementally maintained groupBy aggregate — the materialized-view
  * payoff of the dir-level CDC ([[SnapshotBucketedStore
  * .appendsSince]]): a grouped aggregate table over an append-log
  * source that a refresh brings up to date by aggregating ONLY the
  * generations appended since the last refresh, never re-scanning
  * history. At 100 TB this is the difference between a nightly
  * full-table groupBy and a per-load delta aggregate of the load
  * itself.
  *
  * Mechanics: the destination is itself an append-log table whose
  * generations each hold the delta-aggregate of one refresh window;
  * reading merges them with a plain groupBy (the X74 sketch
  * discipline — the maintained table IS a mergeable sketch of the
  * source). The refresh cursor (highest source VERSION applied)
  * rides the destination manifest's batch mark, so data + cursor
  * commit in ONE rename: a crash between commit and the caller
  * observing it makes the next refresh a no-op, not a double-count —
  * exactly-once without any coordinator.
  *
  * Maintained aggregates are exactly the LOSSLESSLY MERGEABLE ones:
  *   - `sum`   — partial sums re-sum; EXACT types only (integral or
  *               decimal): a double sum drifts with merge order and
  *               the bit-equality contract (and any oracle) with it.
  *               Cast doubles to decimal at the source, the
  *               engine-wide rule.
  *   - `min` / `max` — partial extrema re-extremize; any orderable
  *               type, doubles included (no arithmetic happens).
  *   - `count` — non-null counts re-sum.
  *   - `avg`   — DECOMPOSED to (exact sum, non-null count) in
  *               storage; the mean is ONE division at read time
  *               (both operands exact, so the result is bit-stable
  *               regardless of refresh boundaries). Exact-type
  *               operand rule as `sum`.
  * Anything not in this set (distinct counts, medians, …) is refused
  * loudly — maintain a sketch ([[graft.streaming.SketchIntake]])
  * instead. A `rows` count column is always maintained.
  *
  * A source compaction inside a refresh window rewrites the dirs the
  * delta capture needs ([[SnapshotBucketedStore.appendsSince]]
  * refuses loudly), and a vacuumed cursor manifest makes the window
  * unreadable (appendsSince → None); [[refresh]] then falls back to
  * ONE full rebuild at the current version ([[SnapshotBucketedStore
  * .replaceWithBatch]] installs content + cursor atomically) and is
  * incremental again from there — always convergent, never silently
  * wrong.
  *
  * DELETE PROPAGATION rides the same fence, closing the governance
  * loop: every delete pathway is a version-advancing commit whose
  * dir-level capture the horizon rules refuse —
  * [[SnapshotBucketedStore.delete]] (bucketed sources; appendsSince
  * refuses bucketed manifests outright) and filtered
  * [[SnapshotBucketedStore.compactLogs]] (the log-table GDPR path;
  * the compaction-horizon rule) — so the refresh AFTER a delete
  * cannot take the incremental shortcut and auto-rebuilds from the
  * post-delete base. A maintained aggregate can therefore never
  * silently retain deleted rows' contributions past its next refresh
  * (spec-pinned for both pathways). Bucketed sources rebuild on
  * EVERY refresh by the same rule — correct, but the incremental
  * payoff only exists for append-log sources.
  */
object IncrementalAgg {

  /** One maintained aggregate: `fn` ∈ sum|min|max|count|avg applied
    * to source column `src`, surfaced at read time as `out`. */
  final case class AggCol(fn: String, src: String, out: String)
  object AggCol {
    val Fns = Set("sum", "min", "max", "count", "avg")
    def sum(c: String): AggCol = AggCol("sum", c, c)
    def min(c: String): AggCol = AggCol("min", c, s"min_$c")
    def max(c: String): AggCol = AggCol("max", c, s"max_$c")
    def count(c: String): AggCol = AggCol("count", c, s"cnt_$c")
    def avg(c: String): AggCol = AggCol("avg", c, s"avg_$c")
  }

  /** Bring `dst` up to date with `src` (append-log source table).
    * `sumCols` are summed per `keys` under their own names — the
    * original sum-only surface, kept verbatim; [[refreshAggs]] is the
    * general form. Returns true when new source generations were
    * applied (or a rebuild ran), false when already current. No-op
    * (false) when the source doesn't exist yet. */
  def refresh(
      store: SnapshotBucketedStore,
      src: String,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
  ): Boolean =
    refreshAggs(store, src, dst, keys, sumCols.map(AggCol.sum))

  /** [[refresh]] over the full mergeable-aggregate set. */
  def refreshAggs(
      store: SnapshotBucketedStore,
      src: String,
      dst: String,
      keys: Seq[String],
      aggs: Seq[AggCol],
  ): Boolean = {
    validate(keys, aggs)
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
            deltaAgg(store.readAt(src, cur).get, keys, aggs), cur.toLong)
          true
        }
        try {
          store.appendsSince(src, c.toInt, Some(cur)) match {
            case Some(delta) =>
              store.appendIfNew(dst, deltaAgg(delta, keys, aggs), cur.toLong)
            case None => rebuild()
          }
        } catch {
          case _: IllegalArgumentException => rebuild()
        }
      case None =>
        // first refresh (or an unmarked dst): full build at cur,
        // content + cursor in one commit
        store.replaceWithBatch(dst,
          deltaAgg(store.readAt(src, cur).get, keys, aggs), cur.toLong)
        true
    }
  }

  /** Streaming twin of [[refresh]]: maintain the aggregate DIRECTLY
    * from a stream (AvailableNow drain), one exactly-once
    * delta-aggregate generation per micro-batch — the
    * [[graft.streaming.SketchIntake]] discipline with grouped
    * mergeable aggregates as the cells. Lossless merging makes the
    * maintained read bit-identical to a one-shot aggregate over
    * everything drained, batch boundaries invisible. ONE maintainer
    * per destination: the stream's epoch ids and [[refresh]]'s
    * version cursor share the manifest batch mark — mixing both
    * writers on one table would cross-fence. */
  def drainTo(
      events: DataFrame,
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
      checkpoint: String,
  ): Unit =
    drainAggsTo(events, store, dst, keys, sumCols.map(AggCol.sum), checkpoint)

  /** [[drainTo]] over the full mergeable-aggregate set. */
  def drainAggsTo(
      events: DataFrame,
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      aggs: Seq[AggCol],
      checkpoint: String,
  ): Unit = {
    validate(keys, aggs)
    import org.apache.spark.sql.streaming.Trigger
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendIfNew(dst, deltaAgg(batch, keys, aggs), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** The maintained aggregate: generations merged per aggregate's own
    * merge rule, avg pairs divided at the very end. Output: keys, the
    * aggregate columns under their `out` names, `rows`. */
  def read(
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
  ): Option[DataFrame] =
    readAggs(store, dst, keys, sumCols.map(AggCol.sum))

  /** [[read]] over the full mergeable-aggregate set. */
  def readAggs(
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      aggs: Seq[AggCol],
  ): Option[DataFrame] = {
    validate(keys, aggs)
    store.read(dst).map(m => finish(merge(m, keys, aggs), keys, aggs))
  }

  /** Fold the destination's generation log to one (read-equivalent,
    * CAS-fenced — [[SnapshotBucketedStore.compactLogs]]); the batch
    * cursor survives compaction by that method's contract. */
  def compact(
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      sumCols: Seq[String],
  ): Unit =
    compactAggs(store, dst, keys, sumCols.map(AggCol.sum))

  /** [[compact]] over the full mergeable-aggregate set. */
  def compactAggs(
      store: SnapshotBucketedStore,
      dst: String,
      keys: Seq[String],
      aggs: Seq[AggCol],
  ): Unit = {
    validate(keys, aggs)
    store.compactLogs(dst, merge(_, keys, aggs)): Unit
  }

  // -------------------------------------------------------------------

  private def validate(keys: Seq[String], aggs: Seq[AggCol]): Unit = {
    require(keys.nonEmpty, "need at least one key column")
    require(aggs.nonEmpty, "need at least one aggregate column")
    aggs.foreach(a => require(AggCol.Fns(a.fn),
      s"unsupported aggregate '${a.fn}' (${a.src}): only losslessly " +
        s"mergeable aggregates (${AggCol.Fns.mkString("/")}) can be " +
        "maintained incrementally — use a sketch intake for the rest"))
    val outs = aggs.map(_.out) :+ "rows"
    require(outs.distinct.size == outs.size,
      s"duplicate output names: ${outs.diff(outs.distinct).mkString(",")}")
    aggs.foreach(a => require(!a.out.startsWith("_g_"),
      s"output name ${a.out} collides with the internal _g_ prefix"))
  }

  private def exactType(df: DataFrame, c: String): Boolean =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }

  /** Physical storage columns of one aggregate (avg splits in two). */
  private def physCols(a: AggCol): Seq[String] = a.fn match {
    case "avg" => Seq(s"_g_sum_${a.out}", s"_g_cnt_${a.out}")
    case _ => Seq(a.out)
  }

  /** Delta-aggregate one window of source rows. */
  private def deltaAgg(df: DataFrame, keys: Seq[String], aggs: Seq[AggCol]): DataFrame = {
    aggs.filter(a => a.fn == "sum" || a.fn == "avg").foreach(a =>
      require(exactType(df, a.src),
        s"${a.fn} column ${a.src} is ${df.schema(a.src).dataType.simpleString}: " +
          "incremental sums need exact (integral/decimal) types — a double " +
          "sum drifts with merge order; cast to decimal at the source"))
    val exprs = aggs.flatMap {
      case AggCol("sum", c, out) => Seq(sum(col(c)).as(out))
      case AggCol("min", c, out) => Seq(min(col(c)).as(out))
      case AggCol("max", c, out) => Seq(max(col(c)).as(out))
      case AggCol("count", c, out) => Seq(count(col(c)).as(out))
      case AggCol("avg", c, out) =>
        Seq(sum(col(c)).as(s"_g_sum_$out"), count(col(c)).as(s"_g_cnt_$out"))
      case a => throw new IllegalArgumentException(a.fn) // validate() bars this
    }
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("rows"), exprs: _*)
      .select((keys.map(col) ++ aggs.flatMap(physCols).map(col) :+ col("rows")): _*)
  }

  /** Merge stored generations: each aggregate by its own rule. */
  private def merge(df: DataFrame, keys: Seq[String], aggs: Seq[AggCol]): DataFrame = {
    val exprs = aggs.flatMap {
      case AggCol("sum", _, out) => Seq(sum(col(out)).as(out))
      case AggCol("min", _, out) => Seq(min(col(out)).as(out))
      case AggCol("max", _, out) => Seq(max(col(out)).as(out))
      case AggCol("count", _, out) => Seq(sum(col(out)).as(out))
      case AggCol("avg", _, out) => Seq(
        sum(col(s"_g_sum_$out")).as(s"_g_sum_$out"),
        sum(col(s"_g_cnt_$out")).as(s"_g_cnt_$out"))
      case a => throw new IllegalArgumentException(a.fn)
    }
    df.groupBy(keys.map(col): _*)
      .agg(sum(col("rows")).as("rows"), exprs: _*)
      .select((keys.map(col) ++ aggs.flatMap(physCols).map(col) :+ col("rows")): _*)
  }

  /** Read-side projection: avg pairs become ONE division (exact
    * operands → bit-stable double; null when no non-null values). */
  private def finish(df: DataFrame, keys: Seq[String], aggs: Seq[AggCol]): DataFrame = {
    val outs: Seq[Column] = aggs.map {
      case AggCol("avg", _, out) =>
        when(col(s"_g_cnt_$out") > 0L,
          col(s"_g_sum_$out").cast("double") / col(s"_g_cnt_$out").cast("double"))
          .as(out)
      case a => col(a.out)
    }
    df.select((keys.map(col) ++ outs :+ col("rows")): _*)
  }
}
