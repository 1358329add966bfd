package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time EXPECTATIONS on the snapshot store — the row-grain form
  * of the reference's validate-then-quarantine discipline
  * (/root/reference/lambda.py:58-139 quarantines whole FILES on a
  * failed batch check; Delta CHECK constraints / DLT expectations
  * moved the same idea to rows): each rule is a named boolean
  * predicate over the incoming row; rows satisfying ALL rules land in
  * the target table by keyed upsert, each violating row lands in
  * `<table>__quarantine` carrying `violated` — the comma-joined names
  * of every rule it failed, in declared order — so the quarantine is
  * an actionable triage queue, not a dead-letter pile.
  *
  * NULL-FAILS-CLOSED: a predicate that evaluates to null (a null
  * operand in a comparison) counts as a violation. Governance rules
  * exist to keep undefined data out; three-valued logic silently
  * waving nulls through is how a NOT-NULL-ish check stops checking.
  *
  * Exactly-once: with a `batchId`, the clean half lands through
  * [[SnapshotBucketedStore.upsertWithBatch]] (mark rides the manifest
  * rename) and the quarantine half through
  * [[SnapshotBucketedStore.appendIfNew]] under the SAME id — two
  * tables, two marks, the [[graft.streaming.TextIndexIntake]]
  * convergence argument: a crash between the two commits replays into
  * whichever table is behind and no row lands twice. Without a
  * batchId both writes are plain (caller owns idempotence).
  *
  * One pass over the batch: [[check]] marks, the two filters split —
  * no per-rule scans, and the rule predicates are ordinary Catalyst
  * columns, codegen'd inside the scan projection.
  */
object Expectations {

  /** Mark every row with `violated` — comma-joined failed-rule names
    * in declared order, null when the row passes every rule. Null
    * predicate results fail closed. */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one expectation")
    require(rules.map(_._1).distinct.size == rules.size,
      "duplicate rule names")
    require(!df.columns.contains("violated"),
      "input already carries a 'violated' column")
    val tags = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("violated", nullif(concat_ws(",", tags: _*), lit("")))
  }

  /** Split-write: clean rows upsert into `table`, violating rows
    * append into `<table>__quarantine` (full row + `violated`).
    * Exactly-once under `batchId` (see object doc); replayed epochs
    * are skipped per table. */
  def upsertChecked(
      store: SnapshotBucketedStore,
      table: String,
      key: String,
      incoming: DataFrame,
      rules: Seq[(String, Column)],
      batchId: Option[Long] = None): Unit = {
    implicit val s = incoming.sparkSession
    val marked = check(incoming, rules)
    val clean = marked.filter(col("violated").isNull).drop("violated")
    val bad = marked.filter(col("violated").isNotNull)
    val qTable = s"${table}__quarantine"
    batchId match {
      case Some(id) =>
        if (store.lastAppliedBatch(table).forall(_ < id))
          store.upsertWithBatch(table, clean, key, id)
        store.appendIfNew(qTable, bad, id)
      case None =>
        store.upsert(table, clean, key)
        store.append(qTable, bad)
    }
  }
}
