package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** MAINTENANCE SQL (X251): the store's lifecycle operations as
  * Spark 4 stored procedures (`ProcedureCatalog`), so the ops
  * surface of a 100 TB table is SQL-addressable like its data —
  *
  *   CALL lake.system.apply_deletes(`table` => 'corpus')
  *   CALL lake.system.vacuum('corpus', 3)
  *   CALL lake.system.compact_logs('events')
  *   CALL lake.system.restore('corpus', 7)
  *   CALL lake.system.rebuild('corpus', 'doc_id')
  *   CALL lake.system.clone_table('corpus', 'corpus_dev')
  *
  * (the Iceberg `CALL cat.system.*` convention). Each procedure
  * delegates to the one store method that already owns the
  * correctness story (atomic manifest commit, crash injection,
  * concurrency contract — nothing is re-derived here) and returns a
  * one-row result relation naming what happened. Spark itself
  * resolves, type-checks and coerces the arguments against the
  * declared parameters (`BindProcedures`), and `SHOW PROCEDURES` /
  * `DESCRIBE PROCEDURE` work for free. Results must be
  * [[LocalScan]]s — the only scan shape `InvokeProcedures` accepts —
  * which fits: maintenance summaries are metadata-scale by
  * construction. Unknown procedures refuse loudly naming the known
  * set (the repo-wide discipline). */
private[io] object GraftProcedures {

  val Namespace = "system"

  /** (name, parameters, result schema, body) — the body receives the
    * coerced argument row and the per-table-shaped store factory. */
  private final case class Spec(
      name: String,
      description: String,
      params: Seq[ProcedureParameter],
      result: StructType,
      body: (InternalRow, String => SnapshotBucketedStore) => Seq[Any])

  private def in(name: String, dt: DataType, comment: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).comment(comment).build()

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  private def requireTable(st: SnapshotBucketedStore, t: String): Unit =
    require(st.snapshots(t).nonEmpty,
      s"graft table '$t' does not exist (or has no committed snapshot)")

  private val specs: Seq[Spec] = Seq(
    Spec(
      "apply_deletes",
      "physically apply outstanding merge-on-read tombstones " +
        "(O(tombstoned dirs); re-enables the manifest-served metadata tier)",
      Seq(in("table", StringType, "graft table name")),
      new StructType().add("table", StringType, nullable = false)
        .add("dirs_rewritten", IntegerType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        Seq(u(t), st.applyDeletes(t))
      }),
    Spec(
      "vacuum",
      "reclaim data dirs unreferenced by the retain_snapshots newest " +
        "manifests (the retention window is the concurrent-reader and " +
        "time-travel horizon)",
      Seq(in("table", StringType, "graft table name"),
        in("retain_snapshots", IntegerType,
          "how many newest snapshots stay readable (>= 1)")),
      new StructType().add("table", StringType, nullable = false)
        .add("retained_versions", IntegerType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        st.vacuum(t, args.getInt(1))
        Seq(u(t), st.snapshots(t).size)
      }),
    Spec(
      "compact_logs",
      "fold an append-log table's generations into one " +
        "(compare-and-swap commit, retried across racing drains)",
      Seq(in("table", StringType, "append-log graft table name")),
      new StructType().add("table", StringType, nullable = false)
        .add("compacted", org.apache.spark.sql.types.BooleanType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        Seq(u(t), st.compactLogs(t))
      }),
    Spec(
      "restore",
      "roll the table back to a retained snapshot version " +
        "(commits a NEW manifest mirroring it — history is append-only)",
      Seq(in("table", StringType, "graft table name"),
        in("version", IntegerType, "retained snapshot version to restore")),
      new StructType().add("table", StringType, nullable = false)
        .add("restored_version", IntegerType, nullable = false)
        .add("new_version", IntegerType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        val v = args.getInt(1)
        st.restore(t, v)
        Seq(u(t), v, st.snapshots(t).last)
      }),
    Spec(
      "rebuild",
      "rewrite the whole table bucketed + keyed-deduped under the " +
        "given upsert key (the documented migration point for bucket " +
        "fan-out and log->keyed conversions)",
      Seq(in("table", StringType, "graft table name"),
        in("key", StringType, "upsert key column")),
      new StructType().add("table", StringType, nullable = false)
        .add("new_version", IntegerType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        val df = st.read(t).getOrElse(
          throw new IllegalArgumentException(s"graft table '$t' is unreadable"))
        val key = args.getUTF8String(1).toString
        // rebuild rewrites rows AS-IS: duplicate keys would survive
        // into a keyed table and silently break every keyed write
        // after — refuse loudly, pointing at the dedup the caller
        // must choose (which duplicate wins is THEIR semantics)
        val dups = df.groupBy(key).count()
          .filter(org.apache.spark.sql.functions.col("count") > 1).limit(1)
          .collect()
        require(dups.isEmpty,
          s"'$t' holds duplicate '$key' values (e.g. ${dups.head.get(0)}) — " +
            "rebuild rewrites rows as-is; dedup first (keyed upsert replay " +
            "or an explicit keep-last) so the winning row is YOUR choice")
        st.rebuild(t, df, key)
        Seq(u(t), st.snapshots(t).last)
      }),
    Spec(
      "analyze",
      "backfill the metadata tier (min/max, key Blooms, HLL NDV, KLL " +
        "quantiles, row counts) for generations that predate the " +
        "table's declared stats shape — turns on pruning, manifest " +
        "aggregates and CBO for legacy tables; metadata-only commit, " +
        "no data byte moves",
      Seq(in("table", StringType, "graft table name"),
        in("full", org.apache.spark.sql.types.BooleanType,
          "false = only dirs missing figures; true = recompute all " +
            "(upgrades a legacy stats format)")),
      new StructType().add("table", StringType, nullable = false)
        .add("dirs_analyzed", IntegerType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        Seq(u(t), st.analyzeTable(t, onlyMissing = !args.getBoolean(1)))
      }),
    Spec(
      "zorder",
      "rewrite an append-log table along the Morton curve of the " +
        "given stats columns, as z-range slab generations whose " +
        "recorded min/max boxes are narrow in EVERY listed dimension " +
        "— conjunctive stats pruning then skips slabs for predicates " +
        "on any of them (OPTIMIZE ZORDER BY)",
      Seq(in("table", StringType, "append-log graft table name"),
        in("columns", StringType,
          "comma-separated stats columns to interleave"),
        in("slabs", IntegerType, "z-range generations to write (>= 2)")),
      new StructType().add("table", StringType, nullable = false)
        .add("slabs_written", IntegerType, nullable = false),
      (args, storeFor) => {
        val t = args.getUTF8String(0).toString
        val st = storeFor(t); requireTable(st, t)
        val cols = args.getUTF8String(1).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Seq(u(t), st.rewriteClustered(t, cols, slabs = args.getInt(2)))
      }),
    Spec(
      "clone_table",
      "zero-copy clone: the new table borrows the source's current " +
        "generation dirs by reference until copy-on-write diverges them",
      Seq(in("source", StringType, "existing graft table"),
        in("target", StringType, "new table name")),
      new StructType().add("source", StringType, nullable = false)
        .add("target", StringType, nullable = false),
      (args, storeFor) => {
        val src = args.getUTF8String(0).toString
        val dst = args.getUTF8String(1).toString
        val st = storeFor(src); requireTable(st, src)
        st.cloneTable(src, dst)
        Seq(u(src), u(dst))
      }),
  )

  private val byName: Map[String, Spec] = specs.map(s => s.name -> s).toMap

  def names: Seq[String] = specs.map(_.name)

  def load(name: String,
      storeFor: String => SnapshotBucketedStore): UnboundProcedure =
    byName.get(name.toLowerCase(java.util.Locale.ROOT)) match {
      case Some(spec) => new GraftProcedure(spec, storeFor)
      case None => throw new IllegalArgumentException(
        s"unknown graft procedure '$name' — known: " +
          names.map(n => s"$Namespace.$n").mkString(", "))
    }

  private final class GraftProcedure(spec: Spec,
      storeFor: String => SnapshotBucketedStore)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = spec.name
    override def description(): String = spec.description
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = spec.params.toArray
    // side-effecting maintenance — never constant-folded or re-planned
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val values = spec.body(input, storeFor)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(values))
        override def readSchema(): StructType = spec.result
        override def description(): String = s"GraftProcedure(${spec.name})"
      }
      util.List.of(scan).iterator()
    }
  }
}
