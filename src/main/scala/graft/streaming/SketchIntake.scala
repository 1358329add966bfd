package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Approx

/** Streaming maintenance of a count-min sketch table — the continuous
  * form of the [[graft.ops.Approx.cmsCells]] preagg/reagg discipline:
  * heavy-hitter tracking over an unbounded stream (hot domains in a
  * crawl, hot keys in an event feed) without ever holding per-key
  * state.
  *
  * Each micro-batch reduces to its own cell-delta table (≤ depth ×
  * width rows no matter the batch size — map-side partial aggregation
  * does the collapsing) and APPENDS it as one committed generation;
  * the live sketch is the cell-wise sum of all generations
  * ([[readSketch]] = `cmsMerge` over the log). Because the delta
  * append uses [[graft.io.TableStore.appendIfNew]] with the batch id,
  * a crash-replayed epoch is skipped — counts are exactly-once with a
  * [[graft.io.SnapshotBucketedStore]] sink, which a read-merge-replace
  * design could not promise (a replayed merge double-counts).
  *
  * The generation log grows by one tiny file per batch; compact it
  * whenever convenient with [[compact]] (one atomic commit of the
  * summed cells, CAS-fenced against a concurrent drain on snapshot
  * stores — idempotent, so it needs no batch-id fencing). */
object SketchIntake {

  /** Drain everything currently available (AvailableNow), appending
    * one exactly-once cell-delta generation per micro-batch. */
  def drainTo(
      events: DataFrame,
      store: graft.io.TableStore,
      table: String,
      keyCol: String,
      checkpoint: String,
      depth: Int = 4,
      width: Int = 512,
  ): Unit = {
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendIfNew(table,
          Approx.cmsCells(batch, keyCol, Nil, depth, width), batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** The live sketch: cell-wise sum over every appended generation.
    * Feed the result to [[Approx.cmsEstimate]] / top-k extraction. */
  def readSketch(store: graft.io.TableStore, table: String): Option[DataFrame] =
    store.read(table).map(Approx.cmsMerge(_))

  /** Drain that ALSO maintains the candidate-key table the sketch
    * cannot provide by itself (a CMS estimates counts for keys you
    * name; heavy-hitter extraction needs names). Per batch, two
    * exactly-once generations land: the cell deltas in `table` and
    * the batch's DISTINCT deterministically-sampled keys in
    * `table_cand`. The sample hashes `sampleCol` — a ROW-unique
    * column (event id), NEVER the key: a key-hash sample would
    * deterministically exclude a fixed set of keys forever, however
    * heavy; a row-hash sample catches any key with count ≥ N/k in
    * some batch with near-certainty (the [[Approx.heavyHitters]]
    * argument). Candidate rows dedupe per batch and are bounded by
    * the sample's key count, not the stream length. */
  def drainWithCandidatesTo(
      events: DataFrame,
      store: graft.io.TableStore,
      table: String,
      keyCol: String,
      sampleCol: String,
      checkpoint: String,
      depth: Int = 4,
      width: Int = 512,
      sampleMod: Int = 10,
  ): Unit = {
    import org.apache.spark.sql.functions._
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.localCheckpoint() // two consumers, one source pass
        store.appendIfNew(table,
          Approx.cmsCells(b, keyCol, Nil, depth, width), batchId): Unit
        val cand = b.filter(pmod(graft.llm.TextOps.hash60(
            concat(lit("s:"), col(sampleCol).cast("string"))), lit(sampleMod.toLong)) === 0)
          .select(col(keyCol)).distinct()
        store.appendIfNew(s"${table}_cand", cand, batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming heavy hitters: estimate every candidate seen so far
    * against the live sketch, take the top k (ties break on the key).
    * Candidates may repeat across batch generations — deduped here. */
  def topK(
      store: graft.io.TableStore,
      table: String,
      k: Int,
      depth: Int = 4,
      width: Int = 512,
  ): Option[DataFrame] =
    for {
      cells <- readSketch(store, table)
      cand <- store.read(s"${table}_cand")
    } yield {
      import org.apache.spark.sql.functions.col
      val keyCol = cand.columns.head
      Approx.cmsEstimate(cells, cand.distinct(), depth, width)
        .orderBy(col("est_count").desc, col(keyCol))
        .limit(k)
    }

  /** Fold the generation log back to one generation (bounded read
    * fan-in); the compacted content is the cell-wise sum reads compute
    * anyway, so it is read-equivalent. On a [[graft.io.
    * SnapshotBucketedStore]] this is SAFE CONCURRENTLY with a drain:
    * the commit is a compare-and-swap on the snapshot the sum read,
    * retried on conflict — a generation appended mid-compact can never
    * be dropped while its batch mark survives. On other stores the
    * fallback is read-then-replace, which requires the table's
    * single-writer contract (don't run it while a drain is active). */
  def compact(store: graft.io.TableStore, table: String): Unit =
    store match {
      case s: graft.io.SnapshotBucketedStore =>
        s.compactLogs(table, Approx.cmsMerge(_)): Unit
      case _ =>
        readSketch(store, table).foreach(store.replace(table, _))
    }

  // -----------------------------------------------------------------
  // Streaming histogram maintenance — the quantile twin of the CMS
  // path. Same generation-log discipline, but the cells are EXACT
  // integer (bin, cnt) counts over fixed bins, so the maintained
  // state answers quantiles ([[graft.ops.Quantiles.fromCells]]) that
  // are BIT-IDENTICAL to a one-shot batch run over everything the
  // stream ever drained — a float quantile sketch (t-digest/KLL)
  // merges lossily and order-dependently; this one doesn't.
  // -----------------------------------------------------------------

  /** Drain everything currently available (AvailableNow), appending
    * one exactly-once ≤ `bins`-row cell-delta generation per
    * micro-batch ([[graft.ops.Stats.histogram]] bin semantics:
    * [lo, hi) fixed bins, out-of-range clamps to the edges, null/NaN
    * dropped). State per batch is bins-bounded regardless of batch
    * size — map-side partials do the collapsing. */
  def drainHistogramTo(
      events: DataFrame,
      store: graft.io.TableStore,
      table: String,
      valCol: String,
      checkpoint: String,
      lo: Double,
      hi: Double,
      bins: Int,
  ): Unit = {
    import org.apache.spark.sql.functions.col
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendIfNew(table,
          graft.ops.Stats.histogram(batch, valCol, lo, hi, bins)
            .filter(col("cnt") > 0L)
            .select(col("bin"), col("cnt")),
          batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** Quantiles over the maintained histogram: merge the generation
    * log cell-wise and run the [[graft.ops.Quantiles.fromCells]]
    * estimator. `lo`/`hi`/`bins`/`probs` as in `fromHistogram`; must
    * match what the drain binned with. */
  def readQuantiles(
      store: graft.io.TableStore,
      table: String,
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double],
  ): Option[DataFrame] =
    store.read(table).map(
      graft.ops.Quantiles.fromCells(_, lo, hi, bins, probs))

  /** [[compact]] for a histogram table: the cell-wise bin sum. Same
    * CAS-vs-replace split and the same read-equivalence argument. */
  def compactHistogram(store: graft.io.TableStore, table: String): Unit = {
    import org.apache.spark.sql.functions.{col, sum}
    def merge(df: DataFrame): DataFrame =
      df.groupBy(col("bin")).agg(sum(col("cnt")).as("cnt"))
    store match {
      case s: graft.io.SnapshotBucketedStore =>
        s.compactLogs(table, merge(_)): Unit
      case _ =>
        store.read(table).foreach(df => store.replace(table, merge(df)))
    }
  }

  /** [[drainHistogramTo]] per group — one (group, bin, cnt) cell
    * table maintains EVERY feed's distribution (per-source latency /
    * length percentiles, continuously): state per batch is
    * ≤ |groups|·bins rows, groups at feed grain. Read with
    * [[readGroupQuantiles]]; the same bit-identity-to-batch argument
    * holds per group. */
  def drainGroupHistogramTo(
      events: DataFrame,
      store: graft.io.TableStore,
      table: String,
      groupCol: String,
      valCol: String,
      checkpoint: String,
      lo: Double,
      hi: Double,
      bins: Int,
  ): Unit = {
    import org.apache.spark.sql.functions._
    require(bins >= 1 && lo < hi, s"bad bounds [$lo, $hi) / $bins")
    val w = (hi - lo) / bins
    val q = events.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val bin = least(greatest(
          floor((col(valCol) - lit(lo)) / lit(w)).cast("long"), lit(0L)),
          lit(bins - 1L))
        store.appendIfNew(table,
          batch
            .filter(col(valCol).isNotNull &&
              !isnan(col(valCol).cast("double")))
            .select(col(groupCol), bin.as("bin"))
            .groupBy(col(groupCol), col("bin"))
            .agg(count(lit(1)).as("cnt")),
          batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** Per-group quantiles over the maintained grouped histogram
    * ([[graft.ops.Quantiles.fromCellsPerGroup]]). */
  def readGroupQuantiles(
      store: graft.io.TableStore,
      table: String,
      groupCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      probs: Seq[Double],
  ): Option[DataFrame] =
    store.read(table).map(
      graft.ops.Quantiles.fromCellsPerGroup(_, groupCol, lo, hi, bins, probs))

  /** [[compactHistogram]] for the grouped cell table. */
  def compactGroupHistogram(
      store: graft.io.TableStore,
      table: String,
      groupCol: String): Unit = {
    import org.apache.spark.sql.functions.{col, sum}
    def merge(df: DataFrame): DataFrame =
      df.groupBy(col(groupCol), col("bin")).agg(sum(col("cnt")).as("cnt"))
    store match {
      case s: graft.io.SnapshotBucketedStore =>
        s.compactLogs(table, merge(_)): Unit
      case _ =>
        store.read(table).foreach(df => store.replace(table, merge(df)))
    }
  }
}
