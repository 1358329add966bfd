package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.llm.{Dedup, TextOps}

/** Streaming maintenance of near-duplicate CANDIDATE state — the ANN
  * twin of [[SketchIntake]]'s sketch+candidates pattern: documents
  * stream in, but what the store accumulates is only their MinHash
  * signatures and LSH band-bucket memberships (a few hundred bytes per
  * doc); the text itself never becomes state. Near-dup pairs —
  * including pairs whose members arrived in different drains, which a
  * per-batch dedup can never see — are then a merge-on-read question:
  * self-join the accumulated buckets, verify by signature agreement.
  *
  * Per micro-batch, two exactly-once generations land (same
  * [[graft.io.TableStore.appendIfNew]] discipline as the sketch
  * intake): `<table>` holds (id, m0..m{n−1}) signatures, and
  * `<table>_buckets` holds (id, band, band_key) memberships. Both are
  * map-side + one partial-agg shuffle per batch; both compact with
  * [[graft.io.SnapshotBucketedStore.compactLogs]].
  *
  * The streaming trade, stated honestly: verification is the MinHash
  * ESTIMATE of Jaccard (share of agreeing signature slots), not the
  * exact n-gram Jaccard the batch miner re-computes from text
  * ([[Dedup.nearDupPairs]]) — the stream retains no text to verify
  * against. Estimated-verified pairs feed the same downstream
  * keep-min / CC machinery; run the batch miner as the periodic
  * exact pass. */
object AnnIntake {

  /** Signature + bucket rows for one batch of documents (also the
    * batch-mode form, for backfills). */
  private[streaming] def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int,
  ): DataFrame = {
    val sh = docs
      .select(col(idCol).as("id"), TextOps.shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    Dedup.minhashSigAgg(sh, numHashes)
  }

  private def bandKeyCols(numHashes: Int, bands: Int) = {
    val rowsPerBand = numHashes / bands
    (0 until bands).map { b =>
      concat_ws("_",
        (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)
    }
  }

  /** Drain everything currently available (AvailableNow), appending
    * one signature generation and one bucket generation per
    * micro-batch, exactly-once. */
  def drainTo(
      docs: DataFrame,
      store: graft.io.TableStore,
      table: String,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
  ): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sig = signatures(batch, idCol, textCol, n, numHashes)
          .localCheckpoint() // two consumers, one signature pass
        store.appendIfNew(table, sig, batchId): Unit
        val buckets = sig
          .select(col("id"), posexplode(array(bandKeyCols(numHashes, bands): _*)))
          .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
        store.appendIfNew(s"${table}_buckets", buckets, batchId): Unit
      }
      .start()
    q.awaitTermination()
  }

  /** Candidate pairs over EVERYTHING streamed so far: self-join the
    * accumulated band buckets (width-capped, same quadratic-cliff
    * guard as the batch miner), id_a < id_b, distinct. At-least-once
    * transports can re-send a document; memberships dedupe on read
    * before the join so a replayed doc cannot pair with itself. */
  def candidatePairs(
      store: graft.io.TableStore,
      table: String,
      maxBucketWidth: Int = 100,
  ): Option[DataFrame] =
    store.read(s"${table}_buckets").map { raw =>
      val buckets = raw.select("id", "band", "band_key").distinct()
      val wCount = Window.partitionBy(col("band"), col("band_key"))
      val capped = buckets
        .withColumn("_bw", count(lit(1)).over(wCount))
        .filter(col("_bw") <= maxBucketWidth)
        .drop("_bw")
      capped.as("a")
        .join(capped.as("b"),
          col("a.band") === col("b.band") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
    }

  /** Near-dup pairs with MinHash-estimated Jaccard ≥ `threshold`:
    * candidates verified by the share of agreeing signature slots.
    * Both joins are keyed hash joins against the (merge-on-read
    * deduped) signature table. */
  def nearDupPairsEstimated(
      store: graft.io.TableStore,
      table: String,
      numHashes: Int = 32,
      threshold: Double = 0.5,
      maxBucketWidth: Int = 100,
  ): Option[DataFrame] =
    for {
      pairs <- candidatePairs(store, table, maxBucketWidth)
      sigRaw <- store.read(table)
    } yield {
      val sig = sigRaw.dropDuplicates("id")
      val agree = (0 until numHashes).map(i =>
        when(col(s"a.m$i") === col(s"b.m$i"), 1).otherwise(0))
        .reduce(_ + _)
      pairs
        .join(sig.as("a"), col("id_a") === col("a.id"))
        .join(sig.as("b"), col("id_b") === col("b.id"))
        .select(col("id_a"), col("id_b"),
          (agree.cast("double") / numHashes).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
    }
}
